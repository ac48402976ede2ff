"""Benchmark: contact-rich rollouts/s/chip (BASELINE.json north star).

Rolls out a 4096-scenario batch of 4-box frictional stacks (ground +
box-box contacts, ~16 active contacts each) for a 50-step horizon on the
default JAX backend (the real TPU chip under the driver), using the TPU
fast path: f32, fixed-sweep under-relaxed Jacobi, always-on CFM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rollouts/s/chip", "vs_baseline": N}
vs_baseline is value / 10_000 (the BASELINE.json target; the reference
publishes no numbers).
"""

import json
import time

import jax

try:  # some shells carry JAX_PLATFORMS=axon without the plugin registered
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()

import jax.numpy as jnp


def main():
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.physics.stepper import step_ode  # noqa: F401
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    dtype = jnp.float32
    cfg = SimConfig(
        solver=SolverKind.JACOBI_KERNEL,
        solver_iters=22,
        solver_tol=0.0,
        jacobi_omega=0.3,
        jacobi_beta=0.45,
        conditional_cfm=False,
        cfm_always=0.01,
        contact_capacity=20,
    )
    spec, state = scenes.box_stack(4, dtype=dtype)

    B = 4096
    H = 50
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
    )
    states = states._replace(
        p=states.p
        + (jnp.linspace(0, 1e-3, B)[:, None, None]).astype(dtype)
    )

    from eggshell_tpu.parallel.rollout import rollout_batched

    @jax.jit
    def run(states):
        return rollout_batched(spec, states, cfg, H)

    # Warmup/compile
    out = run(states)
    jax.block_until_ready(out)

    # Timed runs
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(states)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    rollouts_per_s = B / dt
    steps_per_s = B * H / dt
    sim_time_per_wall = steps_per_s * cfg.dt  # real-time factor
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
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
