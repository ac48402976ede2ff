"""Sampling MPC: push a resting box to a target with MPPI
(the north-star control loop on one scene).

Usage: python examples/push_mpc.py [out_dir]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from eggshell_tpu.mpc import SamplingMPC
from eggshell_tpu.physics import scenes
from eggshell_tpu.utils.config import SimConfig, SolverKind
from eggshell_tpu.viz import Figure


def main(out_dir=".", control_steps: int = 60, num_samples: int = 128,
         horizon: int = 40):
    control_steps = int(control_steps)
    cfg = SimConfig(solver=SolverKind.PGS, solver_iters=40,
                    conditional_cfm=False, cfm_always=0.01,
                    contact_capacity=16)
    spec, state = scenes.box_drop(height=0.15)
    target = jnp.asarray([0.25, 0.0, 0.15])

    def cost(s):
        return jnp.sum((s.p[0] - target) ** 2)

    mpc = SamplingMPC(
        spec=spec, cfg=cfg, cost_fn=cost, horizon=int(horizon),
        num_samples=int(num_samples),
        noise_sigma=15.0, temperature=3e-4, iterations=2,
        substeps=10,    # 10 ms control period
    )
    mean = jnp.zeros((mpc.horizon, 6))
    key = jax.random.PRNGKey(0)
    xs = []
    st = state
    for i in range(control_steps):
        st, mean, best = mpc.control_step(st, mean, jax.random.fold_in(key, i))
        xs.append(float(st.p[0, 0]))
    print(f"final x = {xs[-1]:.3f} (target 0.25)")
    Figure().plot(np.asarray(xs)).xlabel("control step").ylabel(
        "box x [m]"
    ).title("MPPI push-to-target").grid().save(f"{out_dir}/push_mpc.png")
    print(f"wrote {out_dir}/push_mpc.png")
    return xs


if __name__ == "__main__":
    main(*sys.argv[1:])
