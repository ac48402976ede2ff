"""Levenberg-Marquardt least squares — toolkit/levenberg_marquardt.{h,cc}
equivalent, JAX-native.

Minimises ||r(x)||^2 for a residual function r: R^n -> R^m.  The
Jacobian comes from jax.jacfwd (the reference computes it with ceres-style
jets — forward-mode dual numbers — which jacfwd is exactly).  The damped
normal equations (JtJ + lambda diag(JtJ)) dx = -Jt r are solved densely;
lambda adapts by the usual accept/reject rule.

Runs fully under jit with static iteration bounds; batch problems with
vmap.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LMOptions:
    """Mirrors the reference's OptimizerOptions
    (toolkit/levenberg_marquardt.h:19-31)."""

    max_iterations: int = 50
    max_error: float = 0.0           # stop when ||r||^2 <= max_error
    initial_lambda: float = 1e-3
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    min_lambda: float = 1e-12
    max_lambda: float = 1e12


class LMResult(NamedTuple):
    x: jax.Array
    error: jax.Array          # final ||r||^2
    iterations: jax.Array
    converged: jax.Array


@functools.partial(jax.jit, static_argnames=("residual_fn", "options"))
def levenberg_marquardt(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    options: LMOptions = LMOptions(),
) -> LMResult:
    opts = options

    def err2(x):
        r = residual_fn(x)
        return jnp.sum(r * r)

    def body(carry):
        x, lam, e, it, stalled = carry
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        JtJ = J.T @ J
        g = J.T @ r
        damped = JtJ + lam * jnp.diag(jnp.diagonal(JtJ))
        # guard fully-zero diagonals
        damped = damped + 1e-30 * jnp.eye(x.shape[0], dtype=x.dtype)
        dx = -jnp.linalg.solve(damped, g)
        e_new = err2(x + dx)
        accept = e_new < e
        x = jnp.where(accept, x + dx, x)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * opts.lambda_down, opts.min_lambda),
            jnp.minimum(lam * opts.lambda_up, opts.max_lambda),
        )
        e = jnp.where(accept, e_new, e)
        stalled = (~accept) & (lam >= opts.max_lambda)
        return x, lam, e, it + 1, stalled

    def cond(carry):
        _, _, e, it, stalled = carry
        return (it < opts.max_iterations) & (e > opts.max_error) & (~stalled)

    x0 = jnp.asarray(x0)
    e0 = err2(x0)
    x, lam, e, it, _ = jax.lax.while_loop(
        cond, body,
        (x0, jnp.asarray(opts.initial_lambda, x0.dtype), e0, 0,
         jnp.asarray(False)),
    )
    return LMResult(x=x, error=e, iterations=it, converged=e <= opts.max_error)
