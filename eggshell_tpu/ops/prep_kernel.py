"""Pallas TPU kernel for the pre-solve body prep of the fused step.

Replaces the vmapped XLA glue in the hot path (quat_to_mat +
inv_mass_blocks + external_forces + uhat einsums — ~0.5 ms/step at 4096
scenarios: every op there has a minor dim of 3/4/6, so the VPU runs at
3/128 lane occupancy).  One batch-on-lanes kernel computes, per body:

  R       = quat_to_mat(q)
  invIg   = R I_b^-1 R^T          (world inverse inertia; ref
                                   eggshell/ensembles.cc:202-212)
  Ig      = R I_b R^T
  F       = [m g + ext_lin; -w x (Ig w) + ext_ang]   (ref :214-222)
  uhat    = u/dt + M^-1 F         (the rhs velocity term, ref :563-571)

emitting uhat (6n), invIg (9n) and F (6n) directly in the jassembly
packed tile layout ((8, 128) = 1024 scenarios per tile) for the
downstream J-assembly / A-formation / integrate kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eggshell_tpu.ops.jassembly_kernel import _pack

SUB, LANE = 8, 128


def _mat3_mul(A, B):
    """Row-major 9-element lane-array 3x3 products."""
    return [
        sum(A[3 * i + k] * B[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def _mat3_mul_t(A, B):
    """A @ B^T for row-major 9-element lane arrays."""
    return [
        sum(A[3 * i + k] * B[3 * j + k] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def _prep_kernel(
    q_ref, v_ref, w_ref, ext_ref,
    invm_ref, mass_ref, ib_ref, invib_ref,
    uhat_ref, invig_ref, f_ref,
    *, n, dt, gravity, has_ext,
):
    # refs (rows, 8, 128): q (4n), v (3n), w (3n), ext (6n);
    # constants: invm (n), mass (n), ib (9n), invib (9n)
    gx, gy, gz = gravity
    inv_dt = 1.0 / dt
    for b in range(n):
        qw = q_ref[4 * b + 0]
        qx = q_ref[4 * b + 1]
        qy = q_ref[4 * b + 2]
        qz = q_ref[4 * b + 3]
        xx, yy, zz = qx * qx, qy * qy, qz * qz
        xy, xz, yz = qx * qy, qx * qz, qy * qz
        wx, wy, wz = qw * qx, qw * qy, qw * qz
        R = [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ]
        invIb = [invib_ref[9 * b + e] for e in range(9)]
        Ib = [ib_ref[9 * b + e] for e in range(9)]
        invIg = _mat3_mul_t(_mat3_mul(R, invIb), R)
        Ig = _mat3_mul_t(_mat3_mul(R, Ib), R)
        for e in range(9):
            invig_ref[9 * b + e] = invIg[e]

        w0 = w_ref[3 * b + 0]
        w1 = w_ref[3 * b + 1]
        w2 = w_ref[3 * b + 2]
        Igw = [
            Ig[3 * i + 0] * w0 + Ig[3 * i + 1] * w1 + Ig[3 * i + 2] * w2
            for i in range(3)
        ]
        # gyroscopic torque -w x (Ig w)
        tau = [
            -(w1 * Igw[2] - w2 * Igw[1]),
            -(w2 * Igw[0] - w0 * Igw[2]),
            -(w0 * Igw[1] - w1 * Igw[0]),
        ]
        m = mass_ref[b]
        flin = [m * gx, m * gy, m * gz]
        fang = tau
        if has_ext:
            flin = [flin[c] + ext_ref[6 * b + c] for c in range(3)]
            fang = [fang[c] + ext_ref[6 * b + 3 + c] for c in range(3)]
        for c in range(3):
            f_ref[6 * b + c] = flin[c]
            f_ref[6 * b + 3 + c] = fang[c]

        invm = invm_ref[b]
        for c in range(3):
            uhat_ref[6 * b + c] = v_ref[3 * b + c] * inv_dt + invm * flin[c]
        for i in range(3):
            acc = w_ref[3 * b + i] * inv_dt
            for j in range(3):
                acc = acc + invIg[3 * i + j] * fang[j]
            uhat_ref[6 * b + 3 + i] = acc


@functools.partial(
    jax.jit, static_argnames=("dt", "gravity", "interpret")
)
def prep_packed(
    q, v, w, inv_mass, inertia_body, inv_inertia_body,
    dt: float, gravity, interpret: bool = False, ext_forces=None,
):
    """Packed (uhat, invIg, F) from raw (B, n, 4/3/3) state arrays.

    inv_mass (n,), inertia_body / inv_inertia_body (n, 3, 3) are the
    static per-body constants; `ext_forces` (B, n, 6) optionally adds
    MPC control wrenches (ref: the reference has no actuation).
    Returns (uhat_packed (nt, 6n, 8, 128), invig_packed (nt, 9n, 8, 128),
    f_packed (nt, 6n, 8, 128))."""
    B, n = q.shape[0], q.shape[1]
    dtype = q.dtype

    qt, _, _, nt = _pack(q, 4 * n)
    vt, _, _, _ = _pack(v, 3 * n)
    wt, _, _, _ = _pack(w, 3 * n)
    has_ext = ext_forces is not None
    if has_ext:
        extt, _, _, _ = _pack(ext_forces, 6 * n)
    else:
        extt = jnp.zeros((nt, 1, SUB, LANE), dtype)

    mass = jnp.where(
        inv_mass > 0, 1.0 / jnp.where(inv_mass > 0, inv_mass, 1.0), 0.0
    ).astype(dtype)
    const = lambda x, c: jnp.broadcast_to(
        x.reshape(1, c, 1, 1).astype(dtype), (nt, c, SUB, LANE)
    )
    invmt = const(inv_mass, n)
    masst = const(mass, n)
    ibt = const(inertia_body.reshape(-1), 9 * n)
    invibt = const(inv_inertia_body.reshape(-1), 9 * n)

    kernel = functools.partial(
        _prep_kernel, n=n, dt=float(dt),
        gravity=tuple(float(g) for g in gravity), has_ext=has_ext,
    )

    def spec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    uhat, invig, f = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[spec(4 * n), spec(3 * n), spec(3 * n),
                  spec(6 * n if has_ext else 1),
                  spec(n), spec(n), spec(9 * n), spec(9 * n)],
        out_specs=(spec(6 * n), spec(9 * n), spec(6 * n)),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 6 * n, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 9 * n, SUB, LANE), dtype),
            jax.ShapeDtypeStruct((nt, 6 * n, SUB, LANE), dtype),
        ),
        interpret=interpret,
    )(qt, vt, wt, extt, invmt, masst, ibt, invibt)
    return uhat, invig, f
