"""Pallas TPU kernel for the post-solve integration step.

Fourth kernel of the hot path (narrowphase -> J-assembly -> LCP ->
integrate): replaces the XLA `_post_solve` chain — J^T lambda
accumulation (which previously forced expanding compact J blocks to
body columns), the per-body mass solve, and the midpoint position +
quaternion exp-map update (ref eggshell/ensembles.cc:498-538, 577-591)
— with one batch-on-lanes kernel in the jassembly packed layout
(8x128 = 1024 scenarios per tile).

J^T lambda uses the COMPACT blocks directly: each contact row touches
at most two bodies, so the accumulation is K x 2 masked slot adds per
body instead of a (B, m, n, 6) einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE


def _integrate_kernel(
    jc_ref, lam_ref, b0_ref, b1_ref,
    p_ref, q_ref, v_ref, w_ref, invm_ref, invig_ref, f_ref,
    pn_ref, qn_ref, vn_ref, wn_ref,
    *, K, n, dt,
):
    # refs (rows, 8, 128): jc (K*36), lam (3K), b0/b1 (K), p (3n),
    # q (4n), v (3n), w (3n), invm (n), invig (9n), f (6n).
    # M^-1 enters via its block structure: scalar inverse mass for the
    # linear rows, 3x3 world inverse inertia for the angular rows
    # (the full 6x6 block is never materialised).
    zero = 0.0 * lam_ref[0]

    # J^T lambda per body: (n, 6) lane accumulators
    jtl = [[zero for _ in range(6)] for _ in range(n)]
    for k in range(K):
        lam = [lam_ref[3 * k + r] for r in range(3)]
        for s, bref in ((0, b0_ref), (1, b1_ref)):
            bsel = bref[k]
            # slot contribution: contrib[c] = sum_r lam_r * Jc[row r, col c]
            contrib = []
            for c in range(6):
                acc = zero
                for r in range(3):
                    acc = acc + lam[r] * jc_ref[(3 * k + r) * 12 + 6 * s + c]
                contrib.append(acc)
            for b in range(n):
                m = jnp.where(bsel == float(b), 1.0, 0.0)
                for c in range(6):
                    jtl[b][c] = jtl[b][c] + m * contrib[c]

    for b in range(n):
        # rhs = F + J^T lambda  (6,)
        rhs = [f_ref[6 * b + c] + jtl[b][c] for c in range(6)]
        # vdot = [invm * rhs_lin; invIg @ rhs_ang]
        invm = invm_ref[b]
        vdot = [invm * rhs[c] for c in range(3)]
        for i in range(3):
            acc = zero
            for j in range(3):
                acc = acc + invig_ref[9 * b + 3 * i + j] * rhs[3 + j]
            vdot.append(acc)

        v = [v_ref[3 * b + c] for c in range(3)]
        w = [w_ref[3 * b + c] for c in range(3)]
        u = v + w
        u_new = [u[i] + dt * vdot[i] for i in range(6)]
        u_mid = [0.5 * (u[i] + u_new[i]) for i in range(6)]

        for c in range(3):
            pn_ref[3 * b + c] = p_ref[3 * b + c] + dt * u_mid[c]
            vn_ref[3 * b + c] = u_new[c]
            wn_ref[3 * b + c] = u_new[3 + c]

        # quaternion update: q_new = normalize(exp(w_mid dt) * q)
        # (ops/quaternion.quat_from_scaled_axis + quat_mul, ref WtoQ
        # eggshell/utils.cc:82-89)
        phi = [dt * u_mid[3 + c] for c in range(3)]
        t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
        small = t2 < 1e-12
        safe_t = jnp.sqrt(jnp.where(small, 1.0, t2))
        kfac = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * safe_t) / safe_t)
        dw = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(0.5 * safe_t))
        dx, dy, dz = kfac * phi[0], kfac * phi[1], kfac * phi[2]

        qw = q_ref[4 * b + 0]
        qx = q_ref[4 * b + 1]
        qy = q_ref[4 * b + 2]
        qz = q_ref[4 * b + 3]
        nw = dw * qw - dx * qx - dy * qy - dz * qz
        nx = dw * qx + dx * qw + dy * qz - dz * qy
        ny = dw * qy - dx * qz + dy * qw + dz * qx
        nz = dw * qz + dx * qy - dy * qx + dz * qw
        norm = jnp.sqrt(nw * nw + nx * nx + ny * ny + nz * nz)
        inv = 1.0 / jnp.where(norm > 0, norm, 1.0)
        qn_ref[4 * b + 0] = nw * inv
        qn_ref[4 * b + 1] = nx * inv
        qn_ref[4 * b + 2] = ny * inv
        qn_ref[4 * b + 3] = nz * inv


def _pack(x, ncomp):
    B = x.shape[0]
    Bp = ((B + TILE - 1) // TILE) * TILE
    flat = x.reshape(B, ncomp)
    if Bp != B:
        flat = jnp.pad(flat, ((0, Bp - B), (0, 0)), mode="edge")
    nt = Bp // TILE
    return flat.reshape(nt, SUB, LANE, ncomp).transpose(0, 3, 1, 2), B, Bp, nt


@functools.partial(jax.jit, static_argnames=("dt", "interpret", "K"))
def integrate_step(
    Jc, lam, b0, b1, p, q, v, w, Minv, F, dt: float,
    interpret: bool = False, jc_packed=None, lam_packed=None,
    invig_packed=None, f_packed=None, inv_mass=None,
    b0_packed=None, b1_packed=None, K=None,
):
    """Fused post-solve integration over a scenario batch.

    Jc (B, 3K, 12); lam (B, 3K); b0/b1 (B, K) int; p/v/w (B, n, 3);
    q (B, n, 4); Minv (B, n, 6, 6); F (B, n, 6).
    `jc_packed`: optional (nt, K*36, 8, 128) tile-layout Jc straight
    from the jassembly kernel (skips a repack of the largest input);
    `invig_packed`/`f_packed` likewise take the world inverse inertia
    (nt, 9n, 8, 128) and forces (nt, 6n, 8, 128) straight from
    ops/prep_kernel (then Minv / F may be None); `b0_packed`/`b1_packed`
    the lane bodies straight from ops/compact_kernel (then b0/b1 may be
    None and `K` must be given).
    Returns (p_new, q_new, v_new, w_new) with the leading batch dim."""
    B = p.shape[0]
    if K is None:
        _, K = b0.shape
    n = p.shape[1]
    dtype = p.dtype

    if jc_packed is not None:
        jct = jc_packed
        nt = jct.shape[0]
        assert nt * TILE >= B and jct.shape[1] == K * 36
    else:
        jct, _, _, nt = _pack(Jc, K * 36)
    if lam_packed is not None:
        lamt = lam_packed[:, :3 * K]   # drop LCP padding rows
    else:
        lamt, _, _, _ = _pack(lam, 3 * K)
    if b0_packed is not None:
        b0t, b1t = b0_packed, b1_packed
    else:
        b0t, _, _, _ = _pack(b0.astype(dtype), K)
        b1t, _, _, _ = _pack(b1.astype(dtype), K)
    pt, _, _, _ = _pack(p, 3 * n)
    qt, _, _, _ = _pack(q, 4 * n)
    vt, _, _, _ = _pack(v, 3 * n)
    wt, _, Bp, _ = _pack(w, 3 * n)
    if Minv is not None:
        invmt, _, _, _ = _pack(Minv[:, :, 0, 0], n)
        igt = invig_packed if invig_packed is not None else _pack(
            Minv[:, :, 3:, 3:].reshape(B, 9 * n), 9 * n
        )[0]
    else:
        # prep-kernel path: world inertia/forces already packed; the
        # static per-body inverse masses broadcast to a constant plane
        assert invig_packed is not None and f_packed is not None
        assert inv_mass is not None
        igt = invig_packed
        invmt = jnp.broadcast_to(
            inv_mass.reshape(1, n, 1, 1).astype(dtype), (nt, n, SUB, LANE)
        )
    ft = f_packed if f_packed is not None else _pack(F, 6 * n)[0]

    kernel = functools.partial(_integrate_kernel, K=K, n=n, dt=dt)

    def spec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    pn, qn, vn, wn = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(K * 36), spec(3 * K), spec(K), spec(K),
                  spec(3 * n), spec(4 * n), spec(3 * n), spec(3 * n),
                  spec(n), spec(9 * n), spec(6 * n)],
        out_specs=(spec(3 * n), spec(4 * n), spec(3 * n), spec(3 * n)),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 3 * n, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 4 * n, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 3 * n, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 3 * n, SUB, LANE), dtype),
        ),
        interpret=interpret,
    )(jct, lamt, b0t, b1t, pt, qt, vt, wt, invmt, igt, ft)

    def unpack(x, c):
        return x.transpose(0, 2, 3, 1).reshape(Bp, c)[:B]

    return (
        unpack(pn, 3 * n).reshape(B, n, 3),
        unpack(qn, 4 * n).reshape(B, n, 4),
        unpack(vn, 3 * n).reshape(B, n, 3),
        unpack(wn, 3 * n).reshape(B, n, 3),
    )
