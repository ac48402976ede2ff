"""Drop a box on the ground and render the result (BASELINE config #1).

Usage: python examples/box_drop.py [out_dir]
"""

import sys

import jax
import numpy as np

from eggshell_tpu.physics import scenes
from eggshell_tpu.parallel.rollout import rollout
from eggshell_tpu.utils.config import SimConfig, SolverKind
from eggshell_tpu.viz import Figure, draw_scene


def main(out_dir="."):
    cfg = SimConfig(solver=SolverKind.PGS, solver_iters=60,
                    conditional_cfm=False, cfm_always=0.01,
                    contact_capacity=16)
    spec, state = scenes.box_drop(height=0.5)
    final, traj = rollout(spec, state, cfg, 1200, keep_trajectory=True)
    z = np.asarray(traj.p[:, 0, 2])
    print(f"rest height: {float(final.p[0, 2]):.4f} (half extent 0.15)")
    Figure().plot(np.arange(len(z)) * cfg.dt, z).xlabel("t [s]").ylabel(
        "z [m]"
    ).title("box drop").grid().save(f"{out_dir}/box_drop_z.png")
    draw_scene(spec, final, f"{out_dir}/box_drop_final.png", title="at rest")
    print(f"wrote {out_dir}/box_drop_z.png, {out_dir}/box_drop_final.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
