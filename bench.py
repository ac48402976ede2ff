"""Benchmark: contact-rich rollouts/s/chip (BASELINE.json north star).

Headline metric (the driver-parsed LAST line): a 4096-scenario batch of
4-box frictional stacks (ground + box-box contacts, ~16 active contacts
each) rolled out for a 50-step horizon on the default JAX backend (the
real TPU chip under the driver), using the TPU fast path: f32,
fixed-sweep under-relaxed Jacobi (the fused Pallas kernel), always-on
CFM.

In addition, this run:
  - measures ALL FIVE BASELINE.md benchmark configs (box_drop,
    pendulum_chain(6) joints-only, box_stack(8), living_room clutter,
    and a 1024-sample MPPI update on the living-room manipulation task)
    and writes them to BENCH_CONFIGS.json;
  - runs the TPU-hardware oracle gate: 120 steps of the COMPILED kernel
    path on the actual chip against the precomputed DIRECT/f64 oracle
    trajectory (tests/data/oracle_stack4_f64.npz), asserting the 1e-3
    north-star bound — a TPU-only lowering regression fails here even
    though CI runs on CPU.

Prints ONE JSON line last:
  {"metric": ..., "value": N, "unit": "rollouts/s/chip", "vs_baseline": N}
vs_baseline is value / 10_000 (the BASELINE.json target; the reference
publishes no numbers).
"""

import json
import os
import time

import jax

try:  # some shells carry JAX_PLATFORMS=axon without the plugin registered
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()

import jax.numpy as jnp
import numpy as np


def _bench_cfg():
    """The gated bench solver configuration — pinned against the
    DIRECT/f64 oracle by tests/test_bench_parity.py (keep in sync)."""
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    return SimConfig(
        solver=SolverKind.JACOBI_KERNEL,
        solver_iters=22,
        solver_tol=0.0,
        jacobi_omega=0.3,
        jacobi_beta=0.45,
        conditional_cfm=False,
        cfm_always=0.01,
        contact_capacity=20,
    )


def _time_rollout(spec, states, cfg, H, reps=3):
    from eggshell_tpu.parallel.rollout import rollout_batched

    @jax.jit
    def run(sts):
        return rollout_batched(spec, sts, cfg, H)

    out = None
    for attempt in range(3):  # transient remote-compile 500s: retry
        try:
            out = run(states)
            break
        except Exception:  # pragma: no cover
            if attempt == 2:
                raise
            time.sleep(2.0 * (attempt + 1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(states)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def _broadcast(state, B, dtype, jitter=1e-3):
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
    )
    return states._replace(
        p=states.p + (jnp.linspace(0, jitter, B)[:, None, None]).astype(dtype)
    )


def bench_configs(dtype=jnp.float32, B=4096, H=50):
    """BASELINE.md configs 1-5, each on the fused-kernel fast path.
    Each config is fault-isolated: one failure records an error entry
    instead of losing the whole matrix."""
    from eggshell_tpu.physics import scenes

    base = _bench_cfg()
    out = {}

    def run(name, fn):
        # The driver's remote-compile helper occasionally 500s on a
        # perfectly valid program (transient infra, not a lowering
        # failure) — retry before recording an error so one flaky
        # compile doesn't poison the artifact.
        last = None
        for attempt in range(3):
            try:
                out[name] = fn()
                return
            except Exception as e:  # pragma: no cover
                last = e
                if "remote_compile" not in repr(e) and "INTERNAL" not in repr(e):
                    break
                time.sleep(2.0 * (attempt + 1))
        out[name] = {"error": repr(last)[:500]}

    def timed(spec, st, cfg, jitter=1e-3, b=None):
        b = B if b is None else b
        dt = _time_rollout(spec, _broadcast(st, b, dtype, jitter), cfg, H)
        return {"rollouts_per_s": b / dt, "steps_per_s": b * H / dt,
                "batch": b}

    # 1. Single box resting on the ground plane — 4-contact LCP per step.
    run("box_drop", lambda: timed(
        *scenes.box_drop(height=0.1495, dtype=dtype),
        base.replace(contact_capacity=8), jitter=1e-4,
    ))

    # 2. 6-link pendulum chain — ball joints only (joints ride the same
    #    packed kernel pipeline as equality lanes).
    run("pendulum_chain6", lambda: timed(
        *scenes.pendulum_chain(6, dtype=dtype),
        base.replace(contact_capacity=4), jitter=1e-4,
    ))

    # 3. 8-box stack — frictional contact + stabilization load.
    # capacity 32 = the aligned stack's exact count (4 ground + 7
    # interfaces x 4); the packed LCP kernel holds A (3K_pad^2 x 128
    # lanes) in VMEM and 3K_pad = 112 lanes (capacity 36) overflows the
    # 16 MB scoped-VMEM budget on v5e at full batch.  Zero contact drop
    # at this capacity is asserted by tests/test_bench_parity.py's
    # methodology (the stack's contact count is static).
    # B=2048: the 96-row packed A tile fits scoped VMEM at 16 grid
    # tiles but not 32 (v5e 16 MB scoped limit incl. double buffering).
    run("box_stack8", lambda: timed(
        *scenes.box_stack(8, dtype=dtype),
        base.replace(contact_capacity=32), b=2048,
    ))

    # 4. living_room clutter — broadphase + narrowphase + mixed LCP.
    run("living_room", lambda: timed(
        *scenes.living_room(dtype=dtype),
        base.replace(contact_capacity=32), b=2048,
    ))

    # 5. Sampling MPC on the living-room manipulation task: one full
    #    4096-sample MPPI update (H=20) on the kernel path — the exact
    #    BASELINE config #5 scenario count.
    def mpc_config():
        from eggshell_tpu.mpc.sampling import mppi_update_batched

        spec, st = scenes.living_room(dtype=dtype)
        cfg5 = base.replace(contact_capacity=32)
        S, Hm = 4096, 20
        target = jnp.asarray([0.0, 0.0, 0.5], dtype)

        def cost_fn(final):
            return jnp.sum((final.p[4] - target) ** 2)

        mean = jnp.zeros((Hm, 6), dtype)
        key = jax.random.PRNGKey(0)

        def run_mpc():
            return mppi_update_batched(
                spec, st, cfg5, mean, key, cost_fn,
                controlled_body=4, num_samples=S, noise_sigma=5.0,
                temperature=1.0, noise_mode="constant",
            )

        new_mean, costs = run_mpc()
        jax.block_until_ready(new_mean)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            new_mean, costs = run_mpc()
        jax.block_until_ready(new_mean)
        dt = (time.perf_counter() - t0) / reps
        return {
            "mpc_solves_per_s": 1.0 / dt,
            "rollouts_per_s": S / dt,
            "steps_per_s": S * Hm / dt,
            "samples": S,
            "horizon": Hm,
        }

    run("mpc_living_room", mpc_config)

    # 6. Gradient MPC step: value_and_grad of a terminal cost through a
    #    20-step rollout — kernel path (custom VJP + IFT LCP adjoint) vs
    #    the old differentiable path (XLA jacobi, unrolled reverse).
    def grad_config():
        from eggshell_tpu.physics.stepper import step_ode_batched
        from eggshell_tpu.utils.config import SolverKind

        spec, st = scenes.box_stack(4, dtype=dtype)
        Bg, Hg = 256, 20
        states = _broadcast(st, Bg, dtype)
        kcfg = base
        xcfg = base.replace(solver=SolverKind.JACOBI)

        def make_loss(cfg):
            def loss(ext):
                def body(s, _):
                    return step_ode_batched(spec, s, cfg, ext), None
                out, _ = jax.lax.scan(body, states, None, length=Hg)
                return jnp.sum(out.p[:, -1, 2]) + jnp.sum(ext**2)
            return jax.jit(jax.value_and_grad(loss))

        ext = jnp.zeros((Bg, spec.num_bodies, 6), dtype)
        res = {}
        for name, cfg_i in (("kernel_ift", kcfg), ("xla_unrolled", xcfg)):
            f = make_loss(cfg_i)
            v, g = f(ext)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(3):
                v, g = f(ext)
            jax.block_until_ready(g)
            res[name] = {
                "grad_steps_per_s": 3 * Bg * Hg / (time.perf_counter() - t0)
            }
        res["speedup"] = (
            res["kernel_ift"]["grad_steps_per_s"]
            / res["xla_unrolled"]["grad_steps_per_s"]
        )
        return res

    run("gradient_mpc", grad_config)
    return out


def tpu_oracle_gate(dtype=jnp.float32):
    """Run the COMPILED kernel path on the live chip for 120 steps of the
    unperturbed 4-box stack and compare against the precomputed
    DIRECT/f64 oracle trajectory — the on-hardware end of the parity
    chain (CI pins kernel==XLA in interpret mode; this pins the actual
    TPU lowering)."""
    from eggshell_tpu.parallel.rollout import rollout_batched
    from eggshell_tpu.physics import scenes

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "oracle_stack4_f64.npz",
    )
    ref = np.load(path)
    spec, st = scenes.box_stack(4, dtype=dtype)
    B = 8
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), st
    )
    cfg = _bench_cfg()
    final = rollout_batched(spec, states, cfg, 120)
    err_p = float(np.abs(np.asarray(final.p[0], float) - ref["p120"]).max())
    err_v = float(np.abs(np.asarray(final.v[0], float) - ref["v120"]).max())
    return {
        "bound": 1e-3,
        "err_p": err_p,
        "err_v": err_v,
        "pass": bool(err_p < 1e-3 and err_v < 1e-3),
    }


def main():
    from eggshell_tpu.physics import scenes

    dtype = jnp.float32
    cfg = _bench_cfg()
    spec, state = scenes.box_stack(4, dtype=dtype)

    B = 4096
    H = 50
    states = _broadcast(state, B, dtype)
    dt = _time_rollout(spec, states, cfg, H)

    rollouts_per_s = B / dt
    steps_per_s = B * H / dt
    sim_time_per_wall = steps_per_s * cfg.dt  # real-time factor

    # Side artifacts: the full BASELINE config matrix + the on-hardware
    # oracle gate.  Never let them break the headline line.
    gate = configs = None
    try:
        gate = tpu_oracle_gate(dtype)
    except Exception as e:  # pragma: no cover
        gate = {"error": repr(e), "pass": False}
    try:
        configs = bench_configs(dtype)
    except Exception as e:  # pragma: no cover
        configs = {"error": repr(e)}
    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "headline_rollouts_per_s": round(rollouts_per_s, 1),
        "tpu_oracle_gate": gate,
        "configs": configs,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_CONFIGS.json"), "w") as f:
        json.dump(artifact, f, indent=1)

    result = {
        "metric": "contact-rich rollouts/s/chip (4-box stack, H=50, batch=4096)",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rollouts_per_s / 10_000.0, 3),
        "extra": {
            "steps_per_s": round(steps_per_s, 0),
            "rt_factor": round(sim_time_per_wall, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "tpu_oracle_gate": "pass" if gate.get("pass") else "FAIL",
            "oracle_err_p": gate.get("err_p"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
