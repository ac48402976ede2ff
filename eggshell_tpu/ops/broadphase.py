"""Broadphase collision pruning — toolkit/collision.{h,cc} equivalent.

The reference provides D-dimensional AABBs + a sweep-and-prune that
returns overlapping pairs (toolkit/collision.h:22-45); eggshell itself
tests all pairs (eggshell/ensembles.cc:460-474).  TPU-native version:

- `box_aabbs`: world AABBs of oriented boxes (|R| trick, one fused op).
- `pair_overlap_mask`: AABB overlap test for a static candidate pair
  list — fixed shapes, no dynamic pair vectors.
- `select_pairs`: stable compaction of the overlapping pairs into a
  fixed capacity, so the narrowphase only runs on plausible pairs
  (the sort-based analog of sweep-and-prune's active list).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from eggshell_tpu.ops import quaternion as quat


def box_aabbs(p: jax.Array, q: jax.Array, half_extents: jax.Array,
              margin: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """(lo, hi) world AABBs: extent along each world axis is |R| @ h."""
    R = quat.quat_to_mat(q)
    ext = jnp.einsum("nij,nj->ni", jnp.abs(R), half_extents) + margin
    return p - ext, p + ext


def aabb_overlap(lo1, hi1, lo2, hi2) -> jax.Array:
    """Elementwise AABB overlap predicate (broadcasts)."""
    return jnp.all((lo1 <= hi2) & (lo2 <= hi1), axis=-1)


def pair_overlap_mask(
    p: jax.Array, q: jax.Array, half_extents: jax.Array,
    pair_i: jax.Array, pair_j: jax.Array, margin: float = 0.0,
) -> jax.Array:
    """(P,) bool: candidate pairs whose AABBs overlap.

    Computed as a full (n, n) broadcast overlap matrix followed by ONE
    boolean gather per pair — at pile scale (n=512, P=131k) the
    broadcast form is ~10x cheaper on TPU than gathering 4 x (P, 3)
    AABB corners per pair (gathers are the bottleneck, not the
    arithmetic)."""
    lo, hi = box_aabbs(p, q, half_extents, margin)
    M = aabb_overlap(
        lo[:, None, :], hi[:, None, :], lo[None, :, :], hi[None, :, :]
    )
    return M[pair_i, pair_j]


def select_pairs(
    mask: jax.Array, pair_i: jax.Array, pair_j: jax.Array, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact overlapping pairs into `capacity` lanes (stable order).
    Returns (sel_i, sel_j, active) with inactive lanes pointing at pair 0.

    Uses top_k on a rank score (descending = original pair order) —
    O(P log capacity)-ish versus a full O(P log P) argsort of the mask;
    at P=131k / capacity=4k this is the difference between the
    broadphase being visible in the step profile and not."""
    P = mask.shape[0]
    score = jnp.where(mask, P - jnp.arange(P, dtype=jnp.int32), 0)
    v, order = jax.lax.top_k(score, capacity)
    active = v > 0
    return (
        jnp.where(active, pair_i[order], 0),
        jnp.where(active, pair_j[order], 0),
        active,
    )


def sweep_and_prune_pairs(lo: jax.Array, hi: jax.Array, capacity: int):
    """All-axis AABB pruning over ALL n^2/2 pairs, compacted to a fixed
    capacity — the dense-mask analog of the reference's sweep-and-prune
    (toolkit/collision.cc).  For n up to a few hundred the full mask is
    cheaper on TPU than maintaining sorted endpoint lists."""
    n = lo.shape[0]
    i = jnp.arange(n)
    pair_mask = (
        aabb_overlap(lo[:, None, :], hi[:, None, :], lo[None, :, :], hi[None, :, :])
        & (i[:, None] < i[None, :])
    )
    pi, pj = jnp.nonzero(pair_mask, size=capacity, fill_value=0)
    active = jnp.arange(capacity) < jnp.sum(pair_mask)
    return pi, pj, active
