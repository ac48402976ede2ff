"""FEM / FDTD benchmark configs (round-5 VERDICT ask #1: the second
engine's TPU perf artifact).  Called from bench.py's config matrix;
every entry is fault-isolated there.

Environment notes (recorded in the artifact):
- the axon TPU tunnel supports NEITHER host callbacks NOR complex
  dtypes, so the TPU driven-solve path is the hybrid CPU-assembly +
  on-device REAL-embedded block-cyclic-reduction direct solve
  (fem/block_tridiag.ComplexBandedSystem); on a standard XLA:TPU
  backend the same BCR runs natively in complex64.
- the host-SuperLU path (the reference's factor+solve shape,
  toolkit/femsolver.h:134-135) is timed on the in-process CPU backend.

Every config names the correctness tests that gate its physics
("gated_by") — perf numbers are only meaningful next to those.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def _cpu():
    return jax.devices("cpu")[0]


def _tpu_backend():
    return jax.default_backend() == "tpu"


def _guide_mesh(h, W=250.0, H=3.0988):
    from eggshell_tpu.fem.mesher import mesh_structured
    from eggshell_tpu.fem.shape import Rectangle

    cd = Rectangle(-W / 2, -H / 2, W / 2, H / 2)
    cd.Port((-W / 2, -H / 2), (-W / 2, H / 2), 1)
    cd.Port((W / 2, -H / 2), (W / 2, H / 2), 2)
    return mesh_structured(cd, (-W / 2, -H / 2), (W, 0), (0, H), h)


def _cfg():
    from eggshell_tpu.fem.helmholtz import FemConfig

    return FemConfig(type="EZ", frequency=75e9, unit=1e-3, excited_port=1)


def _cpu_args(mesh):
    from eggshell_tpu.fem.helmholtz import _cdtype

    dtype = _cdtype()
    with jax.default_device(_cpu()):
        return (
            jnp.asarray(mesh.points),
            jnp.asarray(mesh.epsilon, dtype),
            jnp.asarray(mesh.sigma_xx),
            jnp.asarray(mesh.sigma_yy),
            jnp.asarray(mesh.sigma_xy),
            jnp.asarray(mesh.excitation, dtype),
            jnp.asarray(_cfg().k0, jnp.float32),
        )


def _time(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def fem_driven():
    """S-parameter driven solves across mesh sizes: host SuperLU
    (reference shape) vs on-device BCR.  On TPU the BCR runs the hybrid
    real-embedded path; |S21| parity across paths is asserted at 1e-3.

    gated_by: tests/test_block_tridiag.py (BCR == SuperLU to 1e-8),
    tests/test_conductor_loss.py (same scene family at 0.02 dB)."""
    from eggshell_tpu.fem.block_tridiag import ComplexBandedSystem
    from eggshell_tpu.fem.helmholtz import (
        make_driven_fn, plan_driven, solve_driven_core,
    )

    cfg = _cfg()
    out = {"note": "axon: no host callbacks, no complex dtypes; "
                   "TPU path = CPU assembly + real-embedded BCR solve"}
    for h in (0.4, 0.15, 0.12):
        mesh = _guide_mesh(h)
        entry = {"num_points": mesh.num_points,
                 "num_triangles": mesh.num_triangles}
        args = _cpu_args(mesh)

        # host SuperLU (factor+solve per call — the reference's shape)
        fn, plan = make_driven_fn(mesh, cfg, solver="sparse")
        with jax.default_device(_cpu()):
            jfn = jax.jit(fn)
            dt, (u, s) = _time(lambda: jfn(*args))
        s21_ref = float(abs(np.asarray(s)[1, 0]))
        entry["superlu_host"] = {"ms": round(dt * 1e3, 1),
                                 "solves_per_s": round(1 / dt, 2),
                                 "s21": round(s21_ref, 5)}

        if _tpu_backend():
            cbs = ComplexBandedSystem(plan.rows, plan.cols, plan.N)
            solve_jit = jax.jit(cbs.solve)
            tpu = jax.devices()[0]
            t_solve = [0.0]

            def host_solve(v, r):
                vr = jax.device_put(
                    jnp.asarray(np.real(v), jnp.float32), tpu)
                vi = jax.device_put(
                    jnp.asarray(np.imag(v), jnp.float32), tpu)
                br = jax.device_put(
                    jnp.asarray(np.real(r), jnp.float32), tpu)
                bi = jax.device_put(
                    jnp.asarray(np.imag(r), jnp.float32), tpu)
                jax.block_until_ready((vr, vi, br, bi))
                t0 = time.perf_counter()
                xr, xi = solve_jit(vr, vi, br, bi)
                jax.block_until_ready((xr, xi))
                t_solve[0] = time.perf_counter() - t0
                return (np.asarray(xr) + 1j * np.asarray(xi)).astype(
                    np.asarray(r).dtype)

            def hybrid(vals, rhs):
                return jax.pure_callback(
                    host_solve,
                    jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
                    vals, rhs,
                )

            with jax.default_device(_cpu()):
                core = jax.jit(lambda *a: solve_driven_core(
                    *a, plan, solve_override=hybrid))
                dt, (u, s) = _time(lambda: core(*args))
            s21 = float(abs(np.asarray(s)[1, 0]))
            entry["bcr_tpu_hybrid"] = {
                "ms": round(dt * 1e3, 1),
                "solves_per_s": round(1 / dt, 2),
                "tpu_solve_only_ms": round(t_solve[0] * 1e3, 1),
                "s21": round(s21, 5),
                "parity_vs_superlu": abs(s21 - s21_ref),
            }
            assert abs(s21 - s21_ref) < 1e-3, "S21 parity gate"
        else:
            # CI fallback: BCR on the CPU backend (complex64)
            fnb, _ = make_driven_fn(mesh, cfg, solver="bcr")
            with jax.default_device(_cpu()):
                jfnb = jax.jit(fnb)
                dt, (u, s) = _time(lambda: jfnb(*args))
            s21 = float(abs(np.asarray(s)[1, 0]))
            entry["bcr_cpu"] = {"ms": round(dt * 1e3, 1),
                                "solves_per_s": round(1 / dt, 2),
                                "s21": round(s21, 5),
                                "parity_vs_superlu": abs(s21 - s21_ref)}
        out[f"h{h}"] = entry
    return out


def fem_sweep():
    """Frequency sweep: the reference solves one thread per frequency
    (rama/solver.h:351-355); here all F systems solve in ONE batched
    on-device BCR (vmap over the embedded real systems) vs F sequential
    host factorizations.

    gated_by: tests/test_fem_fields.py (sweep S-curves),
    tests/test_block_tridiag.py."""
    from eggshell_tpu.fem.block_tridiag import ComplexBandedSystem
    from eggshell_tpu.fem.helmholtz import make_driven_fn, plan_driven

    cfg = _cfg()
    mesh = _guide_mesh(0.4)
    F = 16
    c0 = 299792458.0
    freqs = np.linspace(70e9, 80e9, F)
    k0s = 2 * np.pi * freqs / c0 * cfg.unit

    plan = plan_driven(mesh, cfg, solver="sparse")
    fn, _ = make_driven_fn(mesh, cfg, solver="sparse")
    args = _cpu_args(mesh)

    # sequential host path (factor per frequency)
    with jax.default_device(_cpu()):
        jfn = jax.jit(fn)

        def seq():
            res = []
            for k in k0s:
                u, s = jfn(*args[:-1], jnp.asarray(k, jnp.float32))
                res.append(s)
            return res

        dt_seq, s_seq = _time(seq, reps=1)
    out = {
        "num_points": mesh.num_points, "frequencies": F,
        "superlu_sequential": {"ms": round(dt_seq * 1e3, 1),
                               "freq_solves_per_s": round(F / dt_seq, 1)},
    }

    # batched on-device BCR: collect per-frequency (vals, rhs) on CPU,
    # then ONE vmapped TPU/CPU solve
    from eggshell_tpu.fem.helmholtz import solve_driven_core

    collected = []

    def collector(vals, rhs):
        def keep(v, r):
            collected.append((np.asarray(v), np.asarray(r)))
            return np.zeros_like(np.asarray(r))
        return jax.pure_callback(
            keep, jax.ShapeDtypeStruct(rhs.shape, rhs.dtype), vals, rhs)

    with jax.default_device(_cpu()):
        for k in k0s:
            solve_driven_core(*args[:-1], jnp.asarray(k, jnp.float32),
                              plan, solve_override=collector)
    vals_all = np.stack([v for v, _ in collected])
    rhs_all = np.stack([r for _, r in collected])

    cbs = ComplexBandedSystem(plan.rows, plan.cols, plan.N)
    dev = jax.devices()[0] if _tpu_backend() else _cpu()
    batched = jax.jit(jax.vmap(cbs.solve))
    vr = jax.device_put(jnp.asarray(vals_all.real, jnp.float32), dev)
    vi = jax.device_put(jnp.asarray(vals_all.imag, jnp.float32), dev)
    br = jax.device_put(jnp.asarray(rhs_all.real, jnp.float32), dev)
    bi = jax.device_put(jnp.asarray(rhs_all.imag, jnp.float32), dev)
    dt_b, (xr, xi) = _time(lambda: batched(vr, vi, br, bi))
    out["bcr_batched"] = {
        "device": str(dev), "ms": round(dt_b * 1e3, 1),
        "freq_solves_per_s": round(F / dt_b, 1),
        "speedup_vs_sequential_host": round(dt_seq / dt_b, 2),
    }
    # parity: batched solutions solve the same systems (residual check
    # against the CPU COO operator at the middle frequency)
    from eggshell_tpu.fem import sparse as sparselib

    mid = F // 2
    x = np.asarray(xr[mid]) + 1j * np.asarray(xi[mid])
    with jax.default_device(_cpu()):
        r = np.asarray(sparselib.coo_matvec(
            jnp.asarray(plan.rows), jnp.asarray(plan.cols),
            jnp.asarray(vals_all[mid]), jnp.asarray(x), plan.N,
        )) - rhs_all[mid]
    rel = float(np.linalg.norm(r) / max(np.linalg.norm(rhs_all[mid]), 1e-30))
    out["bcr_batched"]["relative_residual_mid_freq"] = rel
    assert rel < 1e-3, "sweep residual gate"
    return out


def fem_modes():
    """Eigenmodes: host ARPACK shift-invert (the reference's solver,
    toolkit/eigensolvers.h:66-150) vs the ON-DEVICE shift-invert
    subspace iteration (BCR banded factorization as the inner solve,
    fem/sparse.shift_invert_modes — the round-5 replacement after the
    measured LOBPCG failure on clustered modes 5/6: rel err 1.3-3.4 at
    6 modes regardless of backend/precision; see docs/architecture.md).

    gated_by: tests/test_fem_sparse.py::test_shift_invert_modes_*."""
    from eggshell_tpu.fem.helmholtz import solve_modes
    from eggshell_tpu.fem.mesher import mesh_shape
    from eggshell_tpu.fem.shape import Rectangle

    cd = Rectangle(0.0, 0.0, 2.0, 1.0)
    mesh = mesh_shape(cd, 0.012)          # ~16k nodes
    out = {"num_points": mesh.num_points}
    t0 = time.perf_counter()
    vals_a, _ = solve_modes(mesh, num_modes=6)
    dt_a = time.perf_counter() - t0
    out["arpack_host"] = {"ms": round(dt_a * 1e3, 1),
                          "eigs": [round(float(v), 4) for v in vals_a]}
    t0 = time.perf_counter()
    vals_l, _ = solve_modes(mesh, num_modes=6, method="shift_invert")
    dt_l = time.perf_counter() - t0
    t0 = time.perf_counter()            # warm: compiles + RCM plan cached
    vals_w, _ = solve_modes(mesh, num_modes=6, method="shift_invert")
    dt_w = time.perf_counter() - t0
    rel = float(np.max(np.abs(
        (np.asarray(vals_l) - np.asarray(vals_a)) / np.asarray(vals_a))))
    out["shift_invert_device"] = {
        "cold_ms": round(dt_l * 1e3, 1), "warm_ms": round(dt_w * 1e3, 1),
        "backend": jax.default_backend(), "max_rel_eig_err": rel,
    }
    assert rel < 1e-2, "mode parity gate"
    return out


def fdtd():
    """FDTD cell-steps/s vs the HBM roofline (ref toolkit/fdtd.cc).

    gated_by: tests/test_fdtd.py (CPML -52 dB reflection, energy
    conservation, analytic cavity modes)."""
    from eggshell_tpu.fem import fdtd as fd

    out = {"backend": jax.default_backend()}
    interpret = jax.default_backend() != "tpu"

    # 2D: XLA scan vs the fused Pallas kernel.  The resident Pallas
    # kernel holds all five grids in VMEM, so it is bounded to ~512^2;
    # the XLA path also runs a 2048^2 scale row.
    n, steps = (512, 200) if not interpret else (128, 10)
    dt = float(fd.courant_dt(1.0, 2))

    def time_xla(n_, steps_):
        f = fd.init_2d(n_, n_)

        @jax.jit
        def run_xla(f):
            def body(fld, _):
                return fd.step_2d(fld, dt, 1.0), None
            o, _ = jax.lax.scan(body, f, None, length=steps_)
            return o

        t, _ = _time(lambda: run_xla(f), reps=1)
        return t

    t_x = time_xla(n, steps)
    ez = jnp.zeros((n, n))
    pec_free = jnp.ones((n, n)).at[0, :].set(0).at[-1, :].set(0)
    pec_free = pec_free.at[:, 0].set(0).at[:, -1].set(0)
    inv_eps = jnp.ones((n, n))

    @jax.jit
    def run_pl(ez):
        def body(c, _):
            e, x, y = c
            return fd.step_2d_pallas(e, x, y, inv_eps, pec_free, dt, 1.0,
                                     interpret=interpret), None
        o, _ = jax.lax.scan(body, (ez, ez, ez), None, length=steps)
        return o

    t_p, _ = _time(lambda: run_pl(ez), reps=1)
    out["fdtd_2d"] = {
        "n": n, "steps": steps,
        "xla_gcells_per_s": round(n * n * steps / t_x / 1e9, 2),
        "pallas_gcells_per_s": round(n * n * steps / t_p / 1e9, 2),
    }
    if not interpret:
        n2 = 2048
        t_x2 = time_xla(n2, steps)
        out["fdtd_2d_large"] = {
            "n": n2, "steps": steps,
            "xla_gcells_per_s": round(n2 * n2 * steps / t_x2 / 1e9, 2),
        }

    # 3D CPML (the ref CD configuration)
    n3, steps3 = (128, 50) if not interpret else (32, 5)
    f3 = fd.init_3d(n3)
    dt3 = float(fd.courant_dt(1.0, 3))
    cpml, psi = fd.make_cpml_3d((n3, n3, n3), dt3, 1.0)

    @jax.jit
    def run3(f, psi):
        def body(c, _):
            fld, p = c
            fld, p = fd.step_3d(fld, dt3, 1.0, cpml=cpml, psi=p)
            return (fld, p), None
        o, _ = jax.lax.scan(body, (f, psi), None, length=steps3)
        return o

    t3, _ = _time(lambda: run3(f3, psi), reps=1)
    cells = n3 ** 3
    traffic = 48 * 4 * cells * steps3 / t3 / 1e9     # GB/s estimate
    out["fdtd_3d_cpml"] = {
        "n": n3, "steps": steps3,
        "gcells_per_s": round(cells * steps3 / t3 / 1e9, 3),
        "est_hbm_gb_per_s": round(traffic, 0),
        "hbm_roofline_gb_per_s": 819,
    }
    return out
