"""Pallas TPU kernel for contact compaction + dedupe, scene-on-lanes.

Round-4 profiling on the chip showed the XLA glue BETWEEN the
narrowphase and the packed solve pipeline — candidate compaction
(one-hot selection matmuls + cumsum) and constraint dedupe, plus the
pack/unpack relayouts around them — costing ~1 ms of the ~1.7 ms
batched step at B=4096: more than the five Pallas kernels combined.
This kernel replaces all of it for the fused path:

  narrowphase (pair-on-lanes) ─┐
  ground 8-corner test          ├─> THIS KERNEL ──> jassembly (packed)
  (computed in-kernel)         ─┘     compact + dedupe,
                                      outputs already in the packed
                                      scene-on-lanes layout

Semantics are identical to physics/contacts.make_contacts (candidate
order: ground corners body-major, then pairs in order; stable
compaction; same-pair proximity dedupe, ground lanes exempt — ref
eggshell/ensembles.cc:241-329, 445-480) — the test suite cross-checks
lane-for-lane against the XLA path.

Layouts:
  scene-tile inputs  (nt, C, 8, 128): scene s -> tile s//1024,
      sublane (s//128)%8, lane s%128  (ops/jassembly_kernel._pack)
  pair inputs        (nt*ngroups*G_C-rows ...): pair pk of scene-tile t
      lives at row block t*Pkp + pk (scene-tile-major, pairs padded to
      Pkp = ngroups*G) — build with `pack_pairs` below.

Grid is (nt, ngroups+2): step (t, 0) seeds the output blocks with the
ground candidates; step (t, 1..ngroups) folds pair group j-1's
narrowphase lanes in (GROUP pairs per step bounds VMEM); the final step
dedupes and finalizes.  Output blocks are revisited across j (resident
in VMEM) and double as the accumulators; the running candidate count
lives in a scratch.  The slot scatter and the dedupe are K-VECTORIZED:
accumulators are (K*8, 128) arrays (slot k on sublane rows k*8..k*8+7)
so each candidate costs ~12 wide ops instead of a K-unrolled loop —
the unrolled form put 10^5+ ops in one Mosaic function at K=32+ and
blew up the compile.

Scope: contact-only scenes (spec.num_joints == 0 — the joint-contact
dedupe rule needs joint anchors) with B % 1024 == 0; other shapes keep
the XLA compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eggshell_tpu.ops.collision import MAX_CONTACTS_PER_PAIR

SUB, LANE = 8, 128
TILE = SUB * LANE
GROUP = 8            # pairs folded per grid step (VMEM knob)

_CORNER_SIGNS = [
    (x, y, z) for x in (-1.0, 1.0) for y in (-1.0, 1.0) for z in (-1.0, 1.0)
]


def _quat_to_mat_rows(qw, qx, qy, qz):
    """Row-major 3x3 rotation from a (lane-array) quaternion."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return [
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ]


class _Acc:
    """Per-step value copies of the output accumulators, K-VECTORIZED:
    each field is one (K*8, 128) array with row k*8+sub = slot k of the
    scenes in sublane stripe `sub` — so the per-candidate slot scatter
    is a handful of wide ops instead of a K-unrolled loop (the unrolled
    form blew Mosaic's compile up at K x candidates ~ 10^4+)."""

    FIELDS = ("b0", "b1", "px", "py", "pz", "nx", "ny", "nz", "dep",
              "act")

    def __init__(self, K, refs):
        b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref = refs
        self.refs = refs
        self.K = K

        def load(ref, stride, off):
            # rows k -> ref[k*stride + off]; stacked to (K*8, 128)
            return jnp.concatenate(
                [ref[stride * k + off] for k in range(K)], axis=0
            )

        self.b0 = load(b0_ref, 1, 0)
        self.b1 = load(b1_ref, 1, 0)
        self.dep = load(dep_ref, 1, 0)
        self.act = load(act_ref, 1, 0)
        self.px = load(pos_ref, 3, 0)
        self.py = load(pos_ref, 3, 1)
        self.pz = load(pos_ref, 3, 2)
        self.nx = load(nrm_ref, 3, 0)
        self.ny = load(nrm_ref, 3, 1)
        self.nz = load(nrm_ref, 3, 2)

    def store(self, K):
        b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref = self.refs
        for k in range(K):
            r = slice(SUB * k, SUB * (k + 1))
            b0_ref[k] = self.b0[r]
            b1_ref[k] = self.b1[r]
            dep_ref[k] = self.dep[r]
            act_ref[k] = self.act[r]
            pos_ref[3 * k] = self.px[r]
            pos_ref[3 * k + 1] = self.py[r]
            pos_ref[3 * k + 2] = self.pz[r]
            nrm_ref[3 * k] = self.nx[r]
            nrm_ref[3 * k + 1] = self.ny[r]
            nrm_ref[3 * k + 2] = self.nz[r]


def _tile_k(v, K):
    """(8, 128) -> (K*8, 128) repeat along sublanes (one Mosaic op)."""
    return pltpu.repeat(v, K, axis=0)


def _make_emit(K, depth_cap, dtype):
    # slot index per accumulator row: row k*8+sub -> k.  All constants
    # are explicitly `dtype`: weak python-float literals promote to f64
    # under the test suite's x64 config and poison the accumulators
    # (refs are f32).
    k_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (K * SUB, LANE), 0) // SUB
    ).astype(dtype)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    def tile(v):
        return _tile_k(v, K)

    def emit(a, offs, b0, b1, px, py, pz, nx, ny, nz, dep, act):
        """Scatter one candidate (lane-wise) into its output slot —
        one wide masked accumulate per field."""
        if depth_cap is not None:
            dep = jnp.minimum(dep, jnp.asarray(depth_cap, dtype))
        on = act > 0.5
        m = jnp.where(
            (tile(offs) == k_iota) & tile(on), one, zero
        )
        a.b0 += m * tile(b0)
        a.b1 += m * tile(b1)
        a.px += m * tile(px)
        a.py += m * tile(py)
        a.pz += m * tile(pz)
        a.nx += m * tile(nx)
        a.ny += m * tile(ny)
        a.nz += m * tile(nz)
        a.dep += m * tile(dep)
        a.act += m
        return offs + jnp.where(on, one, zero)

    return emit


def _ground_seed(refs, offs_ref, p_ref, q_ref, hs_ref, gen_ref, K, n,
                 emit, dtype):
    """j == 0: zero the accumulators, seed with the ground candidates —
    8 corners per body, body-major (ref ensembles.cc:445-459;
    ops/collision.collide_box_and_ground corner order)."""
    b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref = refs
    zero = jnp.zeros((SUB, LANE), dtype)
    for k in range(K):
        b0_ref[k] = zero
        b1_ref[k] = zero
        dep_ref[k] = zero
        act_ref[k] = zero
    for k in range(3 * K):
        pos_ref[k] = zero
        nrm_ref[k] = zero
    a = _Acc(K, refs)
    offs = zero
    for i in range(n):
        px, py, pz = p_ref[3 * i], p_ref[3 * i + 1], p_ref[3 * i + 2]
        hx, hy, hz = hs_ref[3 * i], hs_ref[3 * i + 1], hs_ref[3 * i + 2]
        R = _quat_to_mat_rows(
            q_ref[4 * i], q_ref[4 * i + 1], q_ref[4 * i + 2],
            q_ref[4 * i + 3],
        )
        gen = gen_ref[i]
        for sx, sy, sz in _CORNER_SIGNS:
            ox, oy, oz = sx * hx, sy * hy, sz * hz
            cx = px + R[0] * ox + R[1] * oy + R[2] * oz
            cy = py + R[3] * ox + R[4] * oy + R[5] * oz
            cz = pz + R[6] * ox + R[7] * oy + R[8] * oz
            act = jnp.where(
                (cz < 0) & (gen > 0.5),
                jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
            )
            zl = 0.0 * act
            offs = emit(a, offs, zl - 1.0, zl + float(i),
                        cx, cy, cz, zl, zl, zl + 1.0, -cz, act)
    a.store(K)
    offs_ref[:] = offs


def _finalize(refs, K, eps2, dtype):
    """Last step: same-pair proximity dedupe (earlier lane wins; ground
    lanes b0 = -1 exempt — ref ensembles.cc:264-314), then -1 body ids
    on empty lanes (XLA-path convention).

    Per later-slot k, one wide comparison of slot k's row against ALL
    earlier rows at once ((K*8, 128) ops, `earlier` masked via the row
    iota), then a per-stripe any-reduction."""
    a = _Acc(K, refs)
    lo = jnp.minimum(a.b0, a.b1)           # (K*8, 128)
    hi = jnp.maximum(a.b0, a.b1)
    k_row = jax.lax.broadcasted_iota(jnp.int32, (K * SUB, LANE), 0) // SUB

    def row(v, k):
        return v[SUB * k:SUB * (k + 1)]

    def tile(v):
        return _tile_k(v, K)

    act0 = a.act
    # non-cascaded, matching the XLA dedupe: all drops judged against
    # the PRE-dedupe active flags (contacts._dedupe uses cs.active for
    # both sides of every pair)
    drops = [jnp.zeros((SUB, LANE), dtype)]     # slot 0 never drops
    for k in range(1, K):
        same = (tile(row(lo, k)) == lo) & (tile(row(hi, k)) == hi)
        both_ok = (tile(row(lo, k)) >= 0) & (lo >= 0)
        both_act = (tile(row(act0, k)) > 0.5) & (act0 > 0.5)
        dx = tile(row(a.px, k)) - a.px
        dy = tile(row(a.py, k)) - a.py
        dz = tile(row(a.pz, k)) - a.pz
        d2 = dx * dx + dy * dy + dz * dz
        hit = jnp.where(
            same & both_ok & both_act & (d2 < eps2) & (k_row < k),
            1.0, 0.0,
        )
        # any over earlier slots, per (sublane, lane) scene
        drops.append(
            jnp.max(hit.reshape(K, SUB, LANE), axis=0).astype(dtype)
        )
    a.act = act0 * (1.0 - jnp.concatenate(drops, axis=0))
    # -1 body ids only on NEVER-FILLED lanes: dedupe-dropped lanes keep
    # their real ids with active cleared, matching the XLA convention
    # (contacts._dedupe clears only `active`) lane-for-lane.
    filled = act0 > 0.5
    a.b0 = jnp.where(filled, a.b0, -1.0)
    a.b1 = jnp.where(filled, a.b1, -1.0)
    a.store(K)


def _compact_kernel(
    p_ref, q_ref, hs_ref, gen_ref,
    pp_pos_ref, pp_nrm_ref, pp_dep_ref, pp_act_ref, pb0_ref, pb1_ref,
    b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref,
    offs_ref,
    *, K, n, Pk, ngroups, eps2, depth_cap,
):
    j = pl.program_id(1)
    dtype = pos_ref.dtype
    refs = (b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref)
    MP = MAX_CONTACTS_PER_PAIR
    emit = _make_emit(K, depth_cap, dtype)

    @pl.when(j == 0)
    def _():
        _ground_seed(refs, offs_ref, p_ref, q_ref, hs_ref, gen_ref,
                     K, n, emit, dtype)

    @pl.when((j > 0) & (j <= ngroups))
    def _():
        a = _Acc(K, refs)
        offs = offs_ref[:]
        for g in range(GROUP):
            pk = g  # pair index within this block
            base3 = pk * 3 * MP
            b0 = pb0_ref[pk]
            b1 = pb1_ref[pk]
            nx = pp_nrm_ref[3 * pk]
            ny = pp_nrm_ref[3 * pk + 1]
            nz = pp_nrm_ref[3 * pk + 2]
            for c in range(MP):
                offs = emit(
                    a, offs, b0, b1,
                    pp_pos_ref[base3 + 3 * c],
                    pp_pos_ref[base3 + 3 * c + 1],
                    pp_pos_ref[base3 + 3 * c + 2],
                    nx, ny, nz,
                    pp_dep_ref[pk * MP + c], pp_act_ref[pk * MP + c],
                )
        offs_ref[:] = offs
        a.store(K)

    @pl.when(j == ngroups + 1)
    def _():
        _finalize(refs, K, eps2, dtype)


def _compact_kernel_ground(
    p_ref, q_ref, hs_ref, gen_ref,
    b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref,
    offs_ref,
    *, K, n, eps2, depth_cap,
):
    """Ground-only variant (spec.num_pairs == 0, e.g. the box_drop
    BASELINE config): grid (nt, 2) — seed, then finalize."""
    j = pl.program_id(1)
    dtype = pos_ref.dtype
    refs = (b0_ref, b1_ref, pos_ref, nrm_ref, dep_ref, act_ref)
    emit = _make_emit(K, depth_cap, dtype)

    @pl.when(j == 0)
    def _():
        _ground_seed(refs, offs_ref, p_ref, q_ref, hs_ref, gen_ref,
                     K, n, emit, dtype)

    @pl.when(j == 1)
    def _():
        _finalize(refs, K, eps2, dtype)


def pack_pairs(x, nt, Pkp):
    """(B, Pk, ...) -> scene-tile-major pair layout (nt*Pkp, C, 8, 128)
    with row block t*Pkp + pk; Pk padded to Pkp with dead pairs."""
    B, Pk = x.shape[:2]
    C = 1
    for d in x.shape[2:]:
        C *= d
    flat = x.reshape(B, Pk, C)
    if Pkp != Pk:
        flat = jnp.pad(flat, ((0, 0), (0, Pkp - Pk), (0, 0)))
    # (nt, TILE, Pkp, C) -> (nt, Pkp, C, TILE-as-(8,128))
    r = flat.reshape(nt, TILE, Pkp, C).transpose(0, 2, 3, 1)
    return r.reshape(nt * Pkp, C, SUB, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("K", "n", "Pk", "nt", "eps2", "depth_cap",
                     "interpret"),
)
def compact_contacts_packed(
    p_packed,      # (nt, 3n, 8, 128)
    q_packed,      # (nt, 4n, 8, 128)
    hs_packed,     # (nt, 3n, 8, 128)  (broadcast half extents)
    gen_packed,    # (nt, n, 8, 128)   (broadcast ground_enabled)
    pp_pos,        # (nt*Pkp, 3*MP, 8, 128)  pair narrowphase out
    pp_nrm,        # (nt*Pkp, 3, 8, 128)
    pp_dep,        # (nt*Pkp, MP, 8, 128)
    pp_act,        # (nt*Pkp, MP, 8, 128)  float (gate + padding folded)
    pb0,           # (nt*Pkp, 1, 8, 128)   float body ids
    pb1,           # (nt*Pkp, 1, 8, 128)
    K: int,
    n: int,
    Pk: int,
    nt: int,
    eps2: float,
    depth_cap=None,
    interpret: bool = False,
):
    """Compact + dedupe contact candidates into K masked lanes per
    scene, entirely on-chip, outputs in the packed scene-on-lanes
    layout consumed by ops/jassembly_kernel.  Returns (b0, b1, pos,
    nrm, dep, act) each (nt, C, 8, 128)."""
    dtype = p_packed.dtype
    MP = MAX_CONTACTS_PER_PAIR

    def scene_spec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t, j: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_shape_ = tuple(
        jax.ShapeDtypeStruct((nt, c, SUB, LANE), dtype)
        for c in (K, K, 3 * K, 3 * K, K, K)
    )
    if Pk == 0:
        kernel0 = functools.partial(
            _compact_kernel_ground, K=K, n=n, eps2=eps2,
            depth_cap=depth_cap,
        )
        return pl.pallas_call(
            kernel0,
            grid=(nt, 2),
            in_specs=[scene_spec(3 * n), scene_spec(4 * n),
                      scene_spec(3 * n), scene_spec(n)],
            out_specs=tuple(
                scene_spec(c) for c in (K, K, 3 * K, 3 * K, K, K)
            ),
            out_shape=out_shape_,
            scratch_shapes=[pltpu.VMEM((SUB, LANE), dtype)],
            interpret=interpret,
        )(p_packed, q_packed, hs_packed, gen_packed)

    ngroups = -(-Pk // GROUP)
    Pkp = ngroups * GROUP
    assert pp_pos.shape[0] == nt * Pkp, (pp_pos.shape, nt, Pkp)

    kernel = functools.partial(
        _compact_kernel, K=K, n=n, Pk=Pk, ngroups=ngroups, eps2=eps2,
        depth_cap=depth_cap,
    )

    def scene(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t, j: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def pair_reshape(x, c):
        # fold the GROUP dim into the row dim for in-kernel indexing:
        # block (GROUP, c, 8, 128) read as (GROUP*c, 8, 128)
        return x.reshape(nt * ngroups, GROUP * c, SUB, LANE)

    pp_pos = pair_reshape(pp_pos, 3 * MP)
    pp_nrm = pair_reshape(pp_nrm, 3)
    pp_dep = pair_reshape(pp_dep, MP)
    pp_act = pair_reshape(pp_act, MP)
    pb0 = pair_reshape(pb0, 1)
    pb1 = pair_reshape(pb1, 1)

    def pairg(c):
        # clamp into [0, ngroups-1]: steps 0 (ground) and ngroups+1
        # (finalize) don't consume pair data
        return pl.BlockSpec(
            (None, GROUP * c, SUB, LANE),
            lambda t, j: (
                t * ngroups
                + jnp.clip(j - 1, 0, ngroups - 1), 0, 0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    out_shape = tuple(
        jax.ShapeDtypeStruct((nt, c, SUB, LANE), dtype)
        for c in (K, K, 3 * K, 3 * K, K, K)
    )
    return pl.pallas_call(
        kernel,
        grid=(nt, ngroups + 2),
        in_specs=[
            scene(3 * n), scene(4 * n), scene(3 * n), scene(n),
            pairg(3 * MP), pairg(3), pairg(MP), pairg(MP), pairg(1),
            pairg(1),
        ],
        out_specs=(
            scene(K), scene(K), scene(3 * K), scene(3 * K), scene(K),
            scene(K),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((SUB, LANE), dtype)],
        interpret=interpret,
    )(p_packed, q_packed, hs_packed, gen_packed,
      pp_pos, pp_nrm, pp_dep, pp_act, pb0, pb1)
