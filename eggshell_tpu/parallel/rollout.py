"""Rollouts: scan over the horizon, vmap over scenarios, shard over chips.

The reference steps one scene per Qt timer tick (eggshell_view.cc:540-554);
here the whole trajectory is one XLA program:

  time    -> jax.lax.scan        (sequential, compiled once)
  batch   -> jax.vmap            (thousands of scenarios per chip)
  devices -> shard_map over Mesh (see parallel/mesh.py)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps", "keep_trajectory"))
def rollout(
    spec: SceneSpec,
    state: State,
    cfg: SimConfig,
    num_steps: int,
    keep_trajectory: bool = False,
) -> Tuple[State, Optional[State]]:
    """Advance one scene `num_steps` ODE steps.  Returns (final_state,
    trajectory) with trajectory stacked along a leading time axis when
    `keep_trajectory`, else None."""

    def body(st, _):
        st2, _ = step_ode(spec, st, cfg)
        return st2, (st2 if keep_trajectory else None)

    final, traj = jax.lax.scan(body, state, None, length=num_steps)
    return final, traj


def batch_states(states) -> State:
    """Stack a list of State pytrees along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
def rollout_batched(
    spec: SceneSpec,
    states: State,
    cfg: SimConfig,
    num_steps: int,
) -> State:
    """Roll a scenario batch forward (one shared SceneSpec): scan over
    time of the batched step.  This is the per-chip unit the mesh shards.
    With SolverKind.JACOBI_KERNEL every step's QP batch is one fused
    Pallas kernel call."""
    from eggshell_tpu.physics.stepper import step_ode_batched

    def body(sts, _):
        return step_ode_batched(spec, sts, cfg), None

    final, _ = jax.lax.scan(body, states, None, length=num_steps)
    return final
