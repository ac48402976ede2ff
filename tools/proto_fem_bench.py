"""Prototype: FEM driven-solve perf (round-5 scoping).

The axon TPU tunnel supports neither host callbacks (no SuperLU path)
nor complex dtypes (no direct complex BCR), so the TPU solve runs the
REAL 2x2 embedding (fem/block_tridiag.ComplexBandedSystem) with
assembly on the in-process CPU backend.  Times, per mesh size:

  sparse   host SuperLU factor+solve (CPU, the reference's shape)
  bcr_cpu  on-device BCR (CPU backend, complex)
  bcr_tpu  hybrid: CPU assembly (eager) + TPU real-embedded BCR
           (solve-only time also reported)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/eggshell_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from eggshell_tpu.fem.block_tridiag import ComplexBandedSystem
from eggshell_tpu.fem.helmholtz import (
    FemConfig, _cdtype, make_driven_fn, plan_driven, solve_driven_core,
)
from eggshell_tpu.fem.mesher import mesh_structured
from eggshell_tpu.fem.shape import Rectangle

CPU = jax.devices("cpu")[0]
TPU = jax.devices()[0]


def guide_mesh(h, W=250.0, H=3.0988):
    cd = Rectangle(-W / 2, -H / 2, W / 2, H / 2)
    cd.Port((-W / 2, -H / 2), (-W / 2, H / 2), 1)
    cd.Port((W / 2, -H / 2), (W / 2, H / 2), 2)
    return mesh_structured(cd, (-W / 2, -H / 2), (W, 0), (0, H), h)


def cpu_args(mesh):
    dtype = _cdtype()
    with jax.default_device(CPU):
        return (
            jnp.asarray(mesh.points),
            jnp.asarray(mesh.epsilon, dtype),
            jnp.asarray(mesh.sigma_xx),
            jnp.asarray(mesh.sigma_yy),
            jnp.asarray(mesh.sigma_xy),
            jnp.asarray(mesh.excitation, dtype),
            jnp.asarray(75e9 * 2 * np.pi / 299792458.0 * 1e-3, jnp.float32),
        )


def run_cpu_path(mesh, cfg, solver, reps=3):
    fn, plan = make_driven_fn(mesh, cfg, solver=solver)
    args = cpu_args(mesh)
    with jax.default_device(CPU):
        jfn = jax.jit(fn)
        u, s = jfn(*args)
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        for _ in range(reps):
            u, s = jfn(*args)
        jax.block_until_ready(u)
    return (time.perf_counter() - t0) / reps, np.asarray(s)


def run_tpu_hybrid(mesh, cfg, reps=3):
    plan = plan_driven(mesh, cfg, solver="sparse")
    cbs = ComplexBandedSystem(plan.rows, plan.cols, plan.N)
    solve_jit = jax.jit(cbs.solve)
    t_solve = [0.0]

    def host_solve(v, r):
        vr = jax.device_put(jnp.asarray(np.real(v), jnp.float32), TPU)
        vi = jax.device_put(jnp.asarray(np.imag(v), jnp.float32), TPU)
        br = jax.device_put(jnp.asarray(np.real(r), jnp.float32), TPU)
        bi = jax.device_put(jnp.asarray(np.imag(r), jnp.float32), TPU)
        jax.block_until_ready((vr, vi, br, bi))
        t0 = time.perf_counter()
        xr, xi = solve_jit(vr, vi, br, bi)
        jax.block_until_ready((xr, xi))
        t_solve[0] = time.perf_counter() - t0
        return (np.asarray(xr) + 1j * np.asarray(xi)).astype(
            np.asarray(r).dtype
        )

    def hybrid(vals, rhs):
        # CPU-jitted assembly around a host callback that dispatches the
        # TPU solve (the CPU backend supports callbacks; axon does not)
        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
            vals, rhs,
        )

    args = cpu_args(mesh)
    with jax.default_device(CPU):
        core = jax.jit(
            lambda *a: solve_driven_core(*a, plan, solve_override=hybrid)
        )
        u, s = core(*args)
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        for _ in range(reps):
            u, s = core(*args)
        jax.block_until_ready(u)
    return (time.perf_counter() - t0) / reps, np.asarray(s), t_solve[0]


def main():
    print("backend:", jax.default_backend(), " cpu:", CPU, " dev:", TPU)
    cfg = FemConfig(type="EZ", frequency=75e9, unit=1e-3, excited_port=1)
    for h in (0.4, 0.15, 0.12):
        m = guide_mesh(h)
        print(f"h={h}: N={m.num_points} tris={m.num_triangles}")
        s_ref = None
        for solver in ("sparse", "bcr"):
            try:
                dt, s = run_cpu_path(m, cfg, solver)
                s21 = abs(s[1, 0])
                note = ""
                if s_ref is None:
                    s_ref = s21
                else:
                    note = f" dS21={abs(s21 - s_ref):.2e}"
                name = "sparse" if solver == "sparse" else "bcr_cpu"
                print(f"  {name:8s}: {dt*1e3:8.1f} ms ({1/dt:7.2f}/s) "
                      f"|S21|={s21:.5f}{note}")
            except Exception as e:
                print(f"  {solver:8s}: FAILED {repr(e)[:150]}")
        try:
            dt, s, ts = run_tpu_hybrid(m, cfg)
            s21 = abs(s[1, 0])
            print(f"  bcr_tpu : {dt*1e3:8.1f} ms ({1/dt:7.2f}/s) "
                  f"solve-only {ts*1e3:.1f} ms "
                  f"|S21|={s21:.5f} dS21={abs(s21 - s_ref):.2e}")
        except Exception as e:
            print(f"  bcr_tpu : FAILED {repr(e)[:200]}")


if __name__ == "__main__":
    main()
