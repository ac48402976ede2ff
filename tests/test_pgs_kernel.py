"""Pallas fused Jacobi LCP kernel vs the XLA reference path (interpret
mode on CPU; the compiled path runs on TPU in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from eggshell_tpu.ops import lcp
from eggshell_tpu.ops.pgs_kernel import solve_lcp_jacobi_pallas


def _random_problems(rng, B, m):
    mats = rng.uniform(-1, 1, (B, m, m))
    A = np.einsum("bij,bkj->bik", mats, mats) + m * np.eye(m)
    b = rng.uniform(-1, 1, (B, m))
    is_eq = rng.uniform(size=(B, m)) < 0.3
    lo = np.where(is_eq, 0.0, -1.0)
    hi = np.where(is_eq, 0.0, np.where(rng.uniform(size=(B, m)) < 0.5, 1.0, np.inf))
    return (jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(is_eq), jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32))


def test_kernel_matches_xla_jacobi():
    rng = np.random.default_rng(0)
    B, m = 8, 12   # padded internally to 128 lanes / sublane multiple
    A, b, is_eq, lo, hi = _random_problems(rng, B, m)
    iters, omega = 40, 0.5

    x_kernel = solve_lcp_jacobi_pallas(
        A, b, is_eq, lo, hi, iters=iters, omega=omega, interpret=True
    )
    x_ref = jax.vmap(
        lambda a, bb, e, l, h: lcp.solve_lcp(
            a, bb, e, l, h, iters=iters, method="jacobi", jacobi_omega=omega
        )
    )(A, b, is_eq, lo, hi)
    np.testing.assert_allclose(
        np.asarray(x_kernel), np.asarray(x_ref), atol=2e-5
    )


def test_kernel_padding_shapes():
    rng = np.random.default_rng(1)
    for B, m in [(1, 3), (130, 9), (5, 8)]:
        A, b, is_eq, lo, hi = _random_problems(rng, B, m)
        x = solve_lcp_jacobi_pallas(
            A, b, is_eq, lo, hi, iters=10, omega=0.5, interpret=True
        )
        assert x.shape == (B, m)
        assert np.isfinite(np.asarray(x)).all()
