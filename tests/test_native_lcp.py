"""Native C++ box-LCP (toolkit/lcp analog) vs the NumPy oracle —
the reference's 100-random-SPD certification load (toolkit/lcp.cc tests,
eggshell/lcp.cc:412-528)."""

import numpy as np
import pytest

from eggshell_tpu import native
from eggshell_tpu.oracle import lcp_oracle


def gen_spd(rng, n):
    m = rng.uniform(-1, 1, (n, n))
    A = m.T @ m + 0.1 * n * np.eye(n)
    return A


def test_native_builds():
    x, w, ok = native.solve_box_lcp(
        np.eye(3), np.asarray([1.0, -2.0, 0.5]),
        np.zeros(3), np.full(3, np.inf),
    )
    assert ok
    np.testing.assert_allclose(x, [1.0, 0.0, 0.5], atol=1e-12)
    np.testing.assert_allclose(w, [0.0, 2.0, 0.0], atol=1e-12)


def test_native_certification_100():
    """100 random 50x50 SPD box LCPs, 100% must satisfy KKT
    (ref toolkit/lcp test load)."""
    rng = np.random.default_rng(0)
    n = 50
    is_eq = np.zeros(n, bool)
    passed = 0
    for _ in range(100):
        A = gen_spd(rng, n)
        b = rng.uniform(-1, 1, n)
        lo = np.full(n, -rng.uniform(0.1, 1.0))
        hi = np.full(n, rng.uniform(0.1, 1.0))
        x, w, ok = native.solve_box_lcp(A, b, lo, hi)
        if ok and lcp_oracle.check_lcp_solution(A, b, x, w, is_eq, lo, hi, 1e-7):
            passed += 1
    assert passed == 100, passed


def test_native_matches_oracle():
    rng = np.random.default_rng(1)
    n = 30
    for _ in range(20):
        A = gen_spd(rng, n)
        b = rng.uniform(-1, 1, n)
        lo = np.zeros(n)
        hi = np.full(n, np.inf)
        x, w, ok = native.solve_box_lcp(A, b, lo, hi)
        xo, wo, oko = lcp_oracle.murty_principal_pivot(A, b, lo, hi)
        assert ok and oko
        np.testing.assert_allclose(x, xo, atol=1e-7)


def test_native_batch():
    rng = np.random.default_rng(2)
    B, n = 32, 20
    A = np.stack([gen_spd(rng, n) for _ in range(B)])
    b = rng.uniform(-1, 1, (B, n))
    lo = np.full((B, n), -1.0)
    hi = np.full((B, n), 1.0)
    x, w, ok = native.solve_box_lcp_batch(A, b, lo, hi)
    assert ok.all()
    for k in range(B):
        assert lcp_oracle.check_lcp_solution(
            A[k], b[k], x[k], w[k], np.zeros(n, bool), lo[k], hi[k], 1e-7
        )


def test_cottle_dantzig_kkt_and_matches_murty():
    """COTTLE_DANTZIG mode (ref toolkit/lcp.h:135-144): KKT-valid and —
    for SPD systems, whose box-LCP solution is the unique QP minimiser —
    identical to MURTY."""
    rng = np.random.default_rng(3)
    n = 25
    for _ in range(25):
        A = gen_spd(rng, n)
        b = rng.uniform(-3, 3, n)
        lo = np.where(rng.random(n) < 0.3, -np.inf, -rng.random(n))
        hi = np.where(rng.random(n) < 0.3, np.inf, rng.random(n))
        xm, wm, okm = native.solve_box_lcp(A, b, lo, hi, algorithm="murty")
        xc, wc, okc = native.solve_box_lcp(
            A, b, lo, hi, algorithm="cottle_dantzig"
        )
        assert okm and okc
        np.testing.assert_allclose(xc, xm, atol=1e-7)


def test_schur_fast_path_matches_full_solve():
    """Unbounded-variable elimination (ref toolkit/lcp.h:157-159,
    SolveLCP_BoxSchur lcp.cc:1078) returns the same solution as the full
    pivot solve."""
    rng = np.random.default_rng(4)
    n = 30
    for _ in range(20):
        A = gen_spd(rng, n)
        b = rng.uniform(-3, 3, n)
        lo = np.where(rng.random(n) < 0.4, -np.inf, -rng.random(n))
        hi = np.where(np.isinf(lo), np.inf,
                      rng.random(n))  # unbounded rows are two-sided
        xs, ws, oks = native.solve_box_lcp_schur(A, b, lo, hi)
        xf, wf, okf = native.solve_box_lcp(A, b, lo, hi)
        assert oks and okf
        np.testing.assert_allclose(xs, xf, atol=1e-6)
        # unbounded rows behave as equalities: w = 0 there
        unb = np.isinf(lo)
        np.testing.assert_allclose(ws[unb], 0.0, atol=1e-12)


def test_native_fallback_and_stats():
    """Budget-exhausted native solves return the best-so-far iterate and
    a structured failure record (ref eggshell/lcp.cc:107-137, 233-268)."""
    import numpy as np

    from eggshell_tpu import native

    rng = np.random.default_rng(11)
    n = 40
    G = rng.normal(size=(n, n // 2))
    A = G @ G.T + 0.01 * np.eye(n)
    b = rng.normal(size=n) * 5
    lo = np.full(n, -0.5)
    hi = np.full(n, 0.5)

    x_full, w_full, info_full = native.solve_box_lcp(
        A, b, lo, hi, return_info=True
    )
    assert info_full["converged"]
    assert info_full["goodness"] == 0.0
    assert info_full["iterations"] > 8

    x, w, info = native.solve_box_lcp(
        A, b, lo, hi, max_iterations=4, return_info=True
    )
    assert not info["converged"]
    assert info["fallback_used"]
    assert info["iterations"] == 4
    g = info["goodness"]
    assert np.isfinite(g) and g > 0
    # no worse than the all-clamped-at-lo start
    w0 = A @ np.full(n, -0.5) - b
    assert g <= float(np.maximum(-w0, 0).sum()) + 1e-9
    assert np.isfinite(x).all() and np.isfinite(w).all()
