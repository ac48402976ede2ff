"""Prototype: matrix-free LCP matvec formulations on the live chip.

Compares per-iteration cost of:
  a) current segment_sum scatter-add (ops/lcp_matrix_free)
  b) sorted segment_sum (pre-permuted lanes, indices_are_sorted)
  c) body-major gather-only (per-body constraint adjacency, no scatter)
at pile512 shapes (B=2, K=8192, n=512, 60 iters).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()

import jax.numpy as jnp
import numpy as np

from eggshell_tpu.ops import lcp_matrix_free as mf


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    B, K, n, iters = 2, 8192, 512, 60
    nact = 2600   # ~ active contacts in a settled pile
    dtype = jnp.float32

    blocks = jnp.asarray(rng.normal(size=(B, K, 3, 12)), dtype)
    b0 = np.where(np.arange(K) < nact, rng.integers(0, n, K), -1)
    b1 = np.where(np.arange(K) < nact, rng.integers(0, n, K), -1)
    act = np.arange(K) < nact
    blocks = blocks * jnp.asarray(act)[None, :, None, None]
    b0j = jnp.asarray(np.broadcast_to(b0, (B, K)), jnp.int32)
    b1j = jnp.asarray(np.broadcast_to(b1, (B, K)), jnp.int32)
    Minv = jnp.asarray(rng.normal(size=(B, n, 6, 6)), dtype)
    rhs = jnp.asarray(rng.normal(size=(B, 3 * K)), dtype)
    is_eq = jnp.zeros((B, 3 * K), bool)
    lo = jnp.full((B, 3 * K), -1.0, dtype)
    hi = jnp.full((B, 3 * K), 1.0, dtype)

    # (a) current
    @jax.jit
    def solve_a(blocks, b0, b1, Minv, rhs, is_eq, lo, hi):
        return jax.vmap(
            lambda bl, a0, a1, mi, r, e, l, h: mf.solve_lcp_matrix_free(
                bl, a0, a1, mi, r, e, l, h, iters=iters, omega=0.3,
                beta=0.45, cfm=0.01,
            )
        )(blocks, b0, b1, Minv, rhs, is_eq, lo, hi)

    t = timeit(solve_a, blocks, b0j, b1j, Minv, rhs, is_eq, lo, hi)
    print(f"a) segment_sum   : {t*1e3:8.2f} ms")

    # (c) body-major gather-only
    D = 48  # max constraints per body

    def build_adj(b0_np, b1_np):
        # host build for the proto; production does this in jnp
        adj = np.full((n, D), K, np.int32)       # K = dummy lane
        slot = np.zeros((n, D), np.float32)
        cnt = np.zeros(n, np.int32)
        for k in range(K):
            for s, b in ((0, b0_np[k]), (1, b1_np[k])):
                if b >= 0:
                    adj[b, cnt[b]] = k
                    slot[b, cnt[b]] = s
                    cnt[b] += 1
        print("max degree:", cnt.max())
        return adj, slot

    adj, slot = build_adj(b0, b1)
    adjj = jnp.asarray(np.broadcast_to(adj, (B, n, D)))
    slotj = jnp.asarray(np.broadcast_to(slot, (B, n, D)))

    @jax.jit
    def solve_c(blocks, b0, b1, adj, slot, Minv, rhs, is_eq, lo, hi):
        def one(bl, a0, a1, ad, sl, mi, r, e, l, h):
            # pad blocks with a zero dummy lane K
            blp = jnp.concatenate(
                [bl, jnp.zeros((1, 3, 12), bl.dtype)], axis=0
            )
            diag = mf.jmjt_diagonal(bl, a0, a1, mi, 0.01)
            diag = jnp.where(diag > 0, diag, 1.0)

            def matvec(x):
                xl = x.reshape(K, 3)
                xlp = jnp.concatenate([xl, jnp.zeros((1, 3), xl.dtype)])
                # gather side 1: per body, sum J_k^T x_k over touching lanes
                xg = xlp[ad]                          # (n, D, 3)
                blg = blp[ad]                         # (n, D, 3, 12)
                sel = jnp.where(
                    sl[..., None] < 0.5,
                    jnp.ones_like(sl)[..., None], jnp.zeros_like(sl)[..., None]
                )
                # choose the 6 columns of the right slot
                bsel = jnp.where(
                    (sl[..., None, None] < 0.5),
                    blg[..., 0:6], blg[..., 6:12],
                )                                      # (n, D, 3, 6)
                y = jnp.einsum("ndrc,ndr->nc", bsel, xg)     # (n, 6)
                y = jnp.einsum("nij,nj->ni", mi, y)
                # gather side 2: x = J v
                v0 = jnp.where((a0 >= 0)[:, None], y[jnp.clip(a0, 0, n - 1)], 0.0)
                v1 = jnp.where((a1 >= 0)[:, None], y[jnp.clip(a1, 0, n - 1)], 0.0)
                x0 = jnp.einsum("krc,kc->kr", bl[:, :, 0:6], v0)
                x1 = jnp.einsum("krc,kc->kr", bl[:, :, 6:12], v1)
                return (x0 + x1).reshape(-1) + 0.01 * x

            def project(x):
                return jnp.where(e, x, jnp.clip(x, l, h))

            def sweep(carry):
                x, xp = carry
                ax = matvec(x)
                rr = r - ax + diag * x
                xn = project(0.7 * x + 0.3 * (rr / diag) + 0.45 * (x - xp))
                return xn, x

            x = project(r)
            x, _ = jax.lax.fori_loop(0, iters, lambda _, c: sweep(c), (x, x))
            return x

        return jax.vmap(one)(blocks, b0, b1, adj, slot, Minv, rhs, is_eq,
                             lo, hi)

    t = timeit(solve_c, blocks, b0j, b1j, adjj, slotj, Minv, rhs, is_eq,
               lo, hi)
    print(f"c) body-major    : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
