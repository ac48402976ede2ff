"""Swinging chain trajectory rendered as a GIF (the reference's default
HangingChain scenario, eggshell/model.cc:97-115).

Usage: python examples/chain_swing.py [out_dir]
"""

import sys

from eggshell_tpu.parallel.rollout import rollout
from eggshell_tpu.physics import scenes
from eggshell_tpu.utils.config import SimConfig, SolverKind
from eggshell_tpu.viz import save_trajectory_animation


def main(out_dir=".", steps: int = 1500):
    cfg = SimConfig(solver=SolverKind.PGS, solver_iters=60)
    spec, state = scenes.chain(10)
    final, traj = rollout(spec, state, cfg, int(steps), keep_trajectory=True)
    path = save_trajectory_animation(
        spec, traj, f"{out_dir}/chain_swing.gif", stride=30, fps=15
    )
    print(f"wrote {path}")
    return final, traj


if __name__ == "__main__":
    main(*sys.argv[1:])
