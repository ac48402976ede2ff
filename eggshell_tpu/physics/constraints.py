"""Constraint assembly: global Jacobian, position error, and LCP bounds.

Replaces the reference's per-constraint ``ComputeJ`` + conservativeResize
row appending (eggshell/ensembles.cc:38-87) with one fixed-shape scatter:

rows [0, 3J)              ball-and-socket joints (ref joints.cc:13-35)
rows [3J, 3J + 3K)        contacts in the contact frame (ref contact.cc:38-117)

Inactive contact lanes contribute zero J rows, zero error, and equality
type; the system matrix later gets a unit diagonal on those rows so their
multipliers are exactly zero (see stepper.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eggshell_tpu.ops import quaternion as quat
from eggshell_tpu.physics.contacts import ContactSet, contact_frames
from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.utils.config import FrictionModel, SimConfig


class ConstraintSystem(NamedTuple):
    J: jax.Array           # (m, n, 6)
    err: jax.Array         # (m,) position constraint error
    is_eq: jax.Array       # (m,) True = equality row
    lo: jax.Array          # (m,) lambda lower bound (inequality rows)
    hi: jax.Array          # (m,)
    row_active: jax.Array  # (m,) False = masked lane
    # Coulomb coupling: row index of the normal row whose impulse caps
    # this (tangential) row, or -1 (FrictionModel.COULOMB_PYRAMID only).
    couple: jax.Array      # (m,) int32

    @property
    def num_rows(self) -> int:
        return self.J.shape[-3]


def _blocks_to_rows(bodies, blocks, n):
    """Expand (c, 3, 6) constraint blocks into dense rows (3c, n, 6) via a
    one-hot body matmul (scatters are slow on TPU; this is an einsum that
    lands on the MXU).  -1 bodies contribute nothing."""
    c = bodies.shape[0]
    onehot = (bodies[:, None] == jnp.arange(n)[None, :]).astype(blocks.dtype)
    out = jnp.einsum("cn,crk->crnk", onehot, blocks)
    return out.reshape(3 * c, n, 6)


def build_constraints(
    spec: SceneSpec, state: State, cs: ContactSet, cfg: SimConfig
) -> ConstraintSystem:
    n = spec.num_bodies
    Jn = spec.num_joints
    K = cs.capacity
    dtype = state.p.dtype
    R = state.R()
    eye3 = jnp.eye(3, dtype=dtype)

    # ------------------------------------------------------------------ joints
    if Jn > 0:
        r0c0 = jnp.einsum("jik,jk->ji", R[spec.joint_b0], spec.joint_c0)
        jb1 = jnp.where(spec.joint_b1 >= 0, spec.joint_b1, 0)
        r1c1 = jnp.einsum("jik,jk->ji", R[jb1], spec.joint_c1)

        # J_b0 = [I, -cross(R0 c0)]; J_b1 = [-I, cross(R1 c1)]
        # (ref joints.cc:21-28)
        blk0 = jnp.concatenate(
            [jnp.broadcast_to(eye3, (Jn, 3, 3)), -quat.cross_mat(r0c0)], axis=-1
        )
        blk1 = jnp.concatenate(
            [jnp.broadcast_to(-eye3, (Jn, 3, 3)), quat.cross_mat(r1c1)], axis=-1
        )
        J_joints = _blocks_to_rows(spec.joint_b0, blk0, n) + _blocks_to_rows(
            spec.joint_b1, blk1, n
        )

        # error = p0 + R0 c0 - (p1 + R1 c1)   [b1 = -1: - world anchor c1]
        # (ref joints.cc:3-11)
        anchored = spec.joint_b1 < 0
        tgt = jnp.where(
            anchored[:, None], spec.joint_c1, state.p[jb1] + r1c1
        )
        jerr = (state.p[spec.joint_b0] + r0c0 - tgt).reshape(-1)
    else:
        J_joints = jnp.zeros((0, n, 6), dtype)
        jerr = jnp.zeros((0,), dtype)

    # ---------------------------------------------------------------- contacts
    Rcf = contact_frames(cs)  # (K, 3, 3)
    b0ok = cs.b0 >= 0
    b1ok = cs.b1 >= 0
    sb0 = jnp.where(b0ok, cs.b0, 0)
    sb1 = jnp.where(b1ok, cs.b1, 0)

    # j0 = [-R, R cross(pos - p0)]; j1 = [R, -R cross(pos - p1)]
    # (ref contact.cc:56-72)
    c0 = quat.cross_mat(cs.position - state.p[sb0])
    c1 = quat.cross_mat(cs.position - state.p[sb1])
    blk0 = jnp.concatenate([-Rcf, Rcf @ c0], axis=-1)
    blk1 = jnp.concatenate([Rcf, -(Rcf @ c1)], axis=-1)

    # Friction model (ref contact.cc:80-116).  NO_FRICTION keeps only the
    # normal row; the tangential lanes are masked instead of removed.
    fm = cfg.friction_model
    inf = jnp.asarray(jnp.inf, dtype)
    if fm == FrictionModel.NO_FRICTION:
        row_on = jnp.stack([jnp.zeros_like(cs.active)] * 2 + [cs.active], -1)
        eq = jnp.zeros((K, 3), bool)
        lo_c = jnp.stack([jnp.zeros(K, dtype)] * 2 + [jnp.zeros(K, dtype)], -1)
        hi_c = jnp.stack([jnp.zeros(K, dtype)] * 2 + [jnp.full((K,), inf)], -1)
    elif fm == FrictionModel.INFINITE:
        row_on = jnp.broadcast_to(cs.active[:, None], (K, 3))
        eq = jnp.broadcast_to(jnp.asarray([True, True, False]), (K, 3))
        lo_c = jnp.zeros((K, 3), dtype)
        hi_c = jnp.broadcast_to(jnp.asarray([0.0, 0.0, jnp.inf], dtype), (K, 3))
    elif fm == FrictionModel.COULOMB_PYRAMID:
        # tangential bounds are dynamic (+-mu lambda_n, applied inside the
        # projected sweeps via `couple`); static placeholders are 0.
        row_on = jnp.broadcast_to(cs.active[:, None], (K, 3))
        eq = jnp.zeros((K, 3), bool)
        lo_c = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0], dtype), (K, 3))
        hi_c = jnp.broadcast_to(jnp.asarray([0.0, 0.0, jnp.inf], dtype), (K, 3))
    else:  # BOX (default)
        mu = cfg.friction_bound
        row_on = jnp.broadcast_to(cs.active[:, None], (K, 3))
        eq = jnp.zeros((K, 3), bool)
        lo_c = jnp.broadcast_to(jnp.asarray([-mu, -mu, 0.0], dtype), (K, 3))
        hi_c = jnp.broadcast_to(jnp.asarray([mu, mu, jnp.inf], dtype), (K, 3))

    mask3 = row_on[..., None]  # (K, 3, 1)
    blk0 = jnp.where(mask3 & b0ok[:, None, None], blk0, 0.0)
    blk1 = jnp.where(mask3 & b1ok[:, None, None], blk1, 0.0)
    J_contacts = _blocks_to_rows(
        jnp.where(cs.active, cs.b0, -1), blk0, n
    ) + _blocks_to_rows(jnp.where(cs.active, cs.b1, -1), blk1, n)
    J = jnp.concatenate([J_joints, J_contacts], axis=0)

    # error = (0, 0, -depth) (ref contact.cc:14-22)
    cerr = jnp.stack(
        [jnp.zeros((K,), dtype), jnp.zeros((K,), dtype),
         jnp.where(cs.active, -cs.depth, 0.0)],
        axis=-1,
    )
    cerr = jnp.where(row_on, cerr, 0.0).reshape(-1)

    err = jnp.concatenate([jerr, cerr])
    is_eq = jnp.concatenate(
        [jnp.ones((3 * Jn,), bool), jnp.where(row_on, eq, True).reshape(-1)]
    )
    lo = jnp.concatenate([jnp.zeros((3 * Jn,), dtype), lo_c.reshape(-1)])
    hi = jnp.concatenate([jnp.zeros((3 * Jn,), dtype), hi_c.reshape(-1)])
    row_active = jnp.concatenate(
        [jnp.ones((3 * Jn,), bool), row_on.reshape(-1)]
    )
    if fm == FrictionModel.COULOMB_PYRAMID:
        normal_rows = 3 * Jn + 3 * jnp.arange(K) + 2
        ccontact = jnp.stack(
            [normal_rows, normal_rows, jnp.full((K,), -1, jnp.int32)], -1
        )
        ccontact = jnp.where(row_on, ccontact, -1).reshape(-1)
        couple = jnp.concatenate(
            [jnp.full((3 * Jn,), -1, jnp.int32), ccontact.astype(jnp.int32)]
        )
    else:
        couple = jnp.full((3 * Jn + 3 * K,), -1, jnp.int32)
    return ConstraintSystem(J=J, err=err, is_eq=is_eq, lo=lo, hi=hi,
                            row_active=row_active, couple=couple)
