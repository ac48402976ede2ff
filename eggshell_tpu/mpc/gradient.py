"""Gradient-based MPC through the differentiable rollout.

The whole contact step is reverse-differentiable (fixed-sweep solver, no
data-dependent control flow), so the control sequence can be optimized
directly with jax.grad — a capability the reference's forward-mode jets
(rama/my_jet.h) only hint at, limited there to FEM parameters.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from eggshell_tpu.mpc.sampling import rollout_controlled
from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.utils.config import SimConfig


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "controlled_body", "cost_fn", "steps"),
)
def gradient_mpc_update(
    spec: SceneSpec,
    state: State,
    cfg: SimConfig,
    controls: jax.Array,          # (H, 6)
    cost_fn: Callable[[State], jax.Array],
    controlled_body: int = 0,
    learning_rate: float = 0.1,
    steps: int = 10,
):
    """Adam-free gradient descent on the control sequence.  Returns
    (controls, final_cost)."""

    def loss(c):
        final, run = rollout_controlled(spec, state, cfg, c, controlled_body)
        return cost_fn(final) + run

    grad_fn = jax.value_and_grad(loss)

    def body(carry, _):
        c, _ = carry
        val, g = grad_fn(c)
        return (c - learning_rate * g, val), None

    (controls, cost), _ = jax.lax.scan(
        body, (controls, jnp.inf), None, length=steps
    )
    return controls, cost
