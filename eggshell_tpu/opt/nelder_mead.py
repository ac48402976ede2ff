"""Nelder-Mead simplex minimisation — the toolkit NelderMeadOptimizer
equivalent (toolkit/optimizer.h:249-279), JAX-native with a fixed
iteration budget (jit/vmap-able).

Standard coefficients: reflection 1, expansion 2, contraction 0.5,
shrink 0.5.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NMResult(NamedTuple):
    x: jax.Array
    fun: jax.Array
    iterations: jax.Array


@functools.partial(
    jax.jit, static_argnames=("fn", "max_iterations")
)
def nelder_mead(
    fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    initial_step: float = 0.1,
    max_iterations: int = 200,
    xtol: float = 1e-10,
) -> NMResult:
    n = x0.shape[0]
    dtype = x0.dtype

    simplex = jnp.concatenate(
        [x0[None, :], x0[None, :] + initial_step * jnp.eye(n, dtype=dtype)],
        axis=0,
    )  # (n+1, n)
    fvals = jax.vmap(fn)(simplex)

    def body(carry):
        simplex, fvals, it = carry
        order = jnp.argsort(fvals)
        simplex = simplex[order]
        fvals = fvals[order]
        best, worst = fvals[0], fvals[-1]
        centroid = jnp.mean(simplex[:-1], axis=0)

        xr = centroid + (centroid - simplex[-1])
        fr = fn(xr)

        xe = centroid + 2.0 * (centroid - simplex[-1])
        fe = fn(xe)
        xc = centroid + 0.5 * (simplex[-1] - centroid)
        fc = fn(xc)

        # choose the replacement for the worst vertex
        use_expand = (fr < best) & (fe < fr)
        use_reflect = (fr < fvals[-2]) & ~use_expand
        use_contract = (~use_expand) & (~use_reflect) & (fc < worst)
        new_vertex = jnp.where(
            use_expand, xe, jnp.where(use_reflect, xr, xc)
        )
        new_f = jnp.where(
            use_expand, fe, jnp.where(use_reflect, fr, fc)
        )
        replaced = use_expand | use_reflect | use_contract

        simplex_rep = simplex.at[-1].set(new_vertex)
        fvals_rep = fvals.at[-1].set(new_f)

        # shrink toward the best vertex when nothing helped
        shrunk = simplex[0][None, :] + 0.5 * (simplex - simplex[0][None, :])
        f_shrunk = jax.vmap(fn)(shrunk)
        simplex = jnp.where(replaced, simplex_rep, shrunk)
        fvals = jnp.where(replaced, fvals_rep, f_shrunk)
        return simplex, fvals, it + 1

    def cond(carry):
        simplex, fvals, it = carry
        spread = jnp.max(
            jnp.linalg.norm(simplex - simplex[0][None, :], axis=-1)
        )
        return (it < max_iterations) & (spread > xtol)

    simplex, fvals, it = jax.lax.while_loop(
        cond, body, (simplex, fvals, 0)
    )
    i = jnp.argmin(fvals)
    return NMResult(x=simplex[i], fun=fvals[i], iterations=it)
