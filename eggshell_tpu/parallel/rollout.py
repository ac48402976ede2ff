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


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_steps", "speed_limit")
)
def rollout_batched_monitored(
    spec: SceneSpec,
    states: State,
    cfg: SimConfig,
    num_steps: int,
    speed_limit: float = 1e3,
):
    """Fleet-robust batched rollout with an in-rollout divergence monitor
    (SURVEY §5.3: the build's failure-detection tier; the reference's
    closest analog is a Panic on a bad solve).

    Each scenario carries a `diverged` flag, raised the first step its
    state goes non-finite or any |velocity| exceeds `speed_limit`.
    Diverged scenarios FREEZE at their last good state (masked
    degradation — one blown-up scenario cannot poison a fleet statistic
    or NaN a cost reduction).

    Returns (final_states, diagnostics) with diagnostics =
    {"diverged" (B,) bool, "diverged_count" (), "first_bad_step" (B,)
    int32 (num_steps where never diverged)}.
    """
    from eggshell_tpu.physics.stepper import step_ode_batched

    B = states.p.shape[0]

    def body(carry, i):
        sts, diverged, first_bad = carry
        nxt = step_ode_batched(spec, sts, cfg)

        def bad_of(x, reduce_dims):
            return jnp.any(~jnp.isfinite(x), axis=reduce_dims)

        bad = (
            bad_of(nxt.p, (1, 2)) | bad_of(nxt.q, (1, 2))
            | bad_of(nxt.v, (1, 2)) | bad_of(nxt.w, (1, 2))
            | (jnp.max(jnp.abs(nxt.v), axis=(1, 2)) > speed_limit)
            | (jnp.max(jnp.abs(nxt.w), axis=(1, 2)) > speed_limit)
        )
        new_div = diverged | bad
        first_bad = jnp.where(
            bad & ~diverged, i, first_bad
        )
        # freeze diverged scenarios at their last good state
        keep = (~new_div)

        def sel(new, old):
            shape = (B,) + (1,) * (new.ndim - 1)
            return jnp.where(keep.reshape(shape), new, old)

        merged = jax.tree_util.tree_map(sel, nxt, sts)
        return (merged, new_div, first_bad), None

    div0 = jnp.zeros((B,), bool)
    fb0 = jnp.full((B,), num_steps, jnp.int32)
    (final, diverged, first_bad), _ = jax.lax.scan(
        body, (states, div0, fb0), jnp.arange(num_steps, dtype=jnp.int32)
    )
    diags = {
        "diverged": diverged,
        "diverged_count": jnp.sum(diverged.astype(jnp.int32)),
        "first_bad_step": first_bad,
    }
    return final, diags
