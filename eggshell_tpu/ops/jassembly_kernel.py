"""Pallas TPU kernel for contact Jacobian-block assembly + rhs.

Third kernel of the hot path (after the narrowphase and the LCP solve):
replaces the XLA `build_constraints` chain — contact-frame rotations
(AlignVectors), cross matrices, per-slot block construction, and the
ODE rhs — whose ~50 small batched ops cost ~3.5 ms/step at 4096
scenarios.  Same batch-on-lanes layout as the narrowphase kernel
(8x128 = 1024 scenarios per tile, per-contact loops statically
unrolled).

Scope: BOX-friction contact rows without joints (the benchmark scenes);
other configurations use the XLA path.  Outputs are COMPACT row blocks
(each contact row touches at most two bodies, so 12 columns instead of
6n); the expansion to body columns is one one-hot einsum in XLA.

Per contact k (rows 3k..3k+2), with Rcf = AlignVectors(normal, z)
(ref eggshell/contact.cc:50-72):
  slot0 (body b0): [-Rcf | +Rcf CrossMat(pos - p_b0)]
  slot1 (body b1): [+Rcf | -Rcf CrossMat(pos - p_b1)]
  rhs rows: -erp/dt^2 (0,0,-depth) - J . (u/dt + Minv F)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE


def _quat_align_to_z(nx, ny, nz):
    """Rotation matrix (9 lane-arrays, row-major) mapping n-hat -> z.

    Branchless FromTwoVectors(n, z) with the antiparallel fallback of
    ops/quaternion.align_vectors_mat (axis orthogonal to n via the least
    |component| coordinate axis)."""
    w = 1.0 + nz
    # cross(n, z) = (ny, -nx, 0)
    qx, qy, qz = ny, -nx, 0.0 * nx

    # antiparallel fallback: 180 deg about normalize(cross(n, e_least))
    ax, ay, az = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    # least |component| one-hot
    lx = (ax <= ay) & (ax <= az)
    ly = (~lx) & (ay <= az)
    lz = (~lx) & (~ly)
    ex = jnp.where(lx, 1.0, 0.0)
    ey = jnp.where(ly, 1.0, 0.0)
    ez = jnp.where(lz, 1.0, 0.0)
    ox = ny * ez - nz * ey
    oy = nz * ex - nx * ez
    oz = nx * ey - ny * ex
    onorm = jnp.sqrt(ox * ox + oy * oy + oz * oz)
    safe = jnp.maximum(onorm, 1e-30)
    anti = w < 1e-8
    w_ = jnp.where(anti, 0.0, w)
    qx = jnp.where(anti, ox / safe, qx)
    qy = jnp.where(anti, oy / safe, qy)
    qz = jnp.where(anti, oz / safe, qz)

    qn = jnp.sqrt(w_ * w_ + qx * qx + qy * qy + qz * qz)
    qn = jnp.maximum(qn, 1e-30)
    w_, qx, qy, qz = w_ / qn, qx / qn, qy / qn, qz / qn

    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = w_ * qx, w_ * qy, w_ * qz
    return [
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ]


def _jassembly_kernel(
    b0_ref, b1_ref, pos_ref, pos1_ref, nrm_ref, dep_ref, act_ref, eq_ref,
    p_ref, uhat_ref,
    jc_ref, rhs_ref,
    *, K, n, erp_dt2,
):
    # refs: b0/b1/dep/act/eq (K, 8, 128); pos/pos1/nrm (3K, 8, 128);
    # p (3n, 8, 128); uhat (6n, 8, 128)
    # outputs: jc (K*3*12, 8, 128) rows-major; rhs (3K, 8, 128)
    #
    # eq > 0.5 marks a ball-joint (equality) lane: the slot anchor for
    # slot 1 is pos1 (pos for slot 0), the slot signs flip relative to
    # the contact convention (joint: slot0 lin = +I, ref joints.cc:21-28;
    # contact: slot0 lin = -R, ref contact.cc:56-72), and the position
    # error is the anchor gap a0 - a1 instead of (0, 0, -depth).
    for k in range(K):
        b0 = b0_ref[k]
        b1 = b1_ref[k]
        act = act_ref[k]
        dep = dep_ref[k]
        eq = eq_ref[k]
        px, py, pz = pos_ref[3 * k], pos_ref[3 * k + 1], pos_ref[3 * k + 2]
        p1x, p1y, p1z = (
            pos1_ref[3 * k], pos1_ref[3 * k + 1], pos1_ref[3 * k + 2]
        )
        nx, ny, nz = nrm_ref[3 * k], nrm_ref[3 * k + 1], nrm_ref[3 * k + 2]

        R = _quat_align_to_z(nx, ny, nz)  # 9 lane arrays, row-major

        act_f = jnp.where(act > 0.5, 1.0, 0.0)
        eq_f = jnp.where(eq > 0.5, 1.0, 0.0)
        sgn_flip = 1.0 - 2.0 * eq_f       # +1 contacts, -1 joints

        def body_gather(bsel, comp_ref, ncomp, stride):
            out = []
            for c in range(stride):
                acc = 0.0 * b0
                for i in range(ncomp):
                    acc = acc + jnp.where(
                        bsel == float(i), comp_ref[stride * i + c], 0.0
                    )
                out.append(acc)
            return out

        # slot data: (anchor, p_b, uhat_b, sign, valid)
        slots = []
        for bsel, sgn, anchor in (
            (b0, -1.0, (px, py, pz)), (b1, 1.0, (p1x, p1y, p1z))
        ):
            valid = jnp.where((bsel >= -0.5) & (act > 0.5), 1.0, 0.0)
            pb = body_gather(jnp.maximum(bsel, 0.0), p_ref, n, 3)
            ub = body_gather(jnp.maximum(bsel, 0.0), uhat_ref, n, 6)
            slots.append((anchor, pb, ub, sgn, valid))

        # rhs accumulator rows: -erp/dt^2 * err
        # contacts: err = (0, 0, -depth) in the contact frame;
        # joints:   err = a0 - a1 in world (frame = identity there)
        rhs_rows = [
            -erp_dt2 * (eq_f * (px - p1x)) * act_f,
            -erp_dt2 * (eq_f * (py - p1y)) * act_f,
            -erp_dt2 * (eq_f * (pz - p1z) + (1.0 - eq_f) * (-dep)) * act_f,
        ]

        for s, (anchor, pb, ub, sgn, valid) in enumerate(slots):
            ax, ay, az = anchor
            cx, cy, cz = ax - pb[0], ay - pb[1], az - pb[2]
            # CrossMat(c) row-major
            C = [0.0 * cx, -cz, cy, cz, 0.0 * cx, -cx, -cy, cx, 0.0 * cx]
            s_eff = sgn * sgn_flip
            # ref: slot0 lin = -R, ang = +R C0; slot1 lin = +R, ang = -R C1
            # joints flip both signs (slot0 lin = +I, ang = -C0; ...)
            for r in range(3):
                lin = [s_eff * R[3 * r + c] * valid for c in range(3)]
                ang = []
                for c in range(3):
                    a = (
                        R[3 * r + 0] * C[0 + c]
                        + R[3 * r + 1] * C[3 + c]
                        + R[3 * r + 2] * C[6 + c]
                    )
                    ang.append(-s_eff * a * valid)
                base = (3 * k + r) * 12 + 6 * s
                for c in range(3):
                    jc_ref[base + c] = lin[c]
                    jc_ref[base + 3 + c] = ang[c]
                # rhs contribution: - J_row . uhat_b
                dot = 0.0 * b0
                for c in range(3):
                    dot = dot + lin[c] * ub[c] + ang[c] * ub[3 + c]
                rhs_rows[r] = rhs_rows[r] - dot

        for r in range(3):
            rhs_ref[3 * k + r] = rhs_rows[r]


def _pack(x, ncomp):
    B = x.shape[0]
    Bp = ((B + TILE - 1) // TILE) * TILE
    flat = x.reshape(B, ncomp)
    if Bp != B:
        flat = jnp.pad(flat, ((0, Bp - B), (0, 0)), mode="edge")
    nt = Bp // TILE
    return flat.reshape(nt, SUB, LANE, ncomp).transpose(0, 3, 1, 2), B, Bp, nt


@functools.partial(
    jax.jit, static_argnames=("K", "n", "nt", "erp_dt2", "interpret")
)
def contact_jacobian_blocks_from_packed(
    b0t, b1t, post, pos1t, nrmt, dept, actt, eqt, pt, ut,
    K: int, n: int, nt: int, erp_dt2: float, interpret: bool = False,
):
    """Packed-input entry: all inputs already in the scene-on-lanes
    tile layout (straight from ops/compact_kernel + ops/prep_kernel) —
    no XLA pack relayouts at all.  Returns the packed dict consumed by
    ops/amat_kernel / ops/pgs_kernel / ops/integrate_kernel."""
    dtype = post.dtype
    kernel = functools.partial(
        _jassembly_kernel, K=K, n=n, erp_dt2=erp_dt2
    )

    def spec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    jc, rhs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(K), spec(K), spec(3 * K), spec(3 * K), spec(3 * K),
                  spec(K), spec(K), spec(K), spec(3 * n), spec(6 * n)],
        out_specs=(spec(K * 36), spec(3 * K)),
        out_shape=(
            jax.ShapeDtypeStruct((nt, K * 36, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 3 * K, SUB, LANE), dtype),
        ),
        interpret=interpret,
    )(b0t, b1t, post, pos1t, nrmt, dept, actt, eqt, pt, ut)
    return {
        "jc": jc, "rhs": rhs, "b0": b0t, "b1": b1t, "act": actt,
        "eq": eqt,
    }


@functools.partial(
    jax.jit, static_argnames=("erp_dt2", "interpret", "also_packed")
)
def contact_jacobian_blocks(
    b0, b1, position, normal, depth, active, p, uhat,
    erp_dt2: float, interpret: bool = False, also_packed: bool = False,
    position1=None, is_eq=None, uhat_packed=None,
):
    """Compact constraint J blocks + rhs for a scenario batch.

    b0/b1 (B, K) int; position/normal (B, K, 3); depth/active (B, K);
    p (B, n, 3); uhat = u/dt + Minv F (B, n, 6).
    `is_eq` (B, K) marks ball-joint lanes (equality rows; ref
    joints.cc:13-35): their slot-1 anchor is `position1` (the body-1
    anchor point a1; world anchor for b1 = -1) and their error is the
    anchor gap — contacts leave position1 = position and is_eq = 0.
    Returns (Jc (B, 3K, 12), rhs (B, 3K)): columns 0:6 = slot0 (body b0)
    [lin|ang], 6:12 = slot1.  With `also_packed`, additionally returns
    the raw (nt, K*36, 8, 128) tile-layout Jc so downstream kernels
    (ops/integrate_kernel) can consume it without an unpack/repack
    round-trip."""
    B, K = b0.shape
    n = p.shape[1]
    dtype = position.dtype
    if position1 is None:
        position1 = position
    if is_eq is None:
        is_eq = jnp.zeros((B, K), dtype)

    b0t, _, _, nt = _pack(b0.astype(dtype), K)
    b1t, _, _, _ = _pack(b1.astype(dtype), K)
    post, _, _, _ = _pack(position, 3 * K)
    pos1t, _, _, _ = _pack(position1, 3 * K)
    nrmt, _, _, _ = _pack(normal, 3 * K)
    dept, _, _, _ = _pack(depth, K)
    actt, _, _, _ = _pack(active.astype(dtype), K)
    eqt, _, _, _ = _pack(is_eq.astype(dtype), K)
    pt, _, Bp, _ = _pack(p, 3 * n)
    if uhat_packed is not None:
        ut = uhat_packed          # straight from ops/prep_kernel
    else:
        ut, _, _, _ = _pack(uhat, 6 * n)

    kernel = functools.partial(
        _jassembly_kernel, K=K, n=n, erp_dt2=erp_dt2
    )

    def spec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    jc, rhs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(K), spec(K), spec(3 * K), spec(3 * K), spec(3 * K),
                  spec(K), spec(K), spec(K), spec(3 * n), spec(6 * n)],
        out_specs=(spec(K * 36), spec(3 * K)),
        out_shape=(
            jax.ShapeDtypeStruct((nt, K * 36, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 3 * K, SUB, LANE), dtype),
        ),
        interpret=interpret,
    )(b0t, b1t, post, pos1t, nrmt, dept, actt, eqt, pt, ut)

    def unpack(x, c):
        return x.transpose(0, 2, 3, 1).reshape(Bp, c)[:B]

    Jc = unpack(jc, K * 36).reshape(B, 3 * K, 12)
    if also_packed:
        packed = {
            "jc": jc, "rhs": rhs, "b0": b0t, "b1": b1t, "act": actt,
            "eq": eqt,
        }
        return Jc, unpack(rhs, 3 * K), packed
    return Jc, unpack(rhs, 3 * K)
