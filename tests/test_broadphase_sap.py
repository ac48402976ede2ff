"""Sorted sweep-and-prune broadphase (ops/broadphase.sap_select_pairs)
— the sorted-active-list analog of toolkit/collision.h:22-45 — must be
lane-for-lane identical to the broadcast-mask path whenever its window
covers the scene, and must degrade by dropping the FARTHEST-in-x pairs
when it does not."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eggshell_tpu.ops import broadphase
from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig, SolverKind


def _random_scene(n, seed, spread=2.0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-spread, spread, (n, 3))
    p[:, 2] += spread
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    h = rng.uniform(0.1, 0.4, (n, 3))
    return (jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(h, jnp.float32))


@pytest.mark.parametrize("n,seed", [(16, 0), (48, 1), (96, 2), (96, 3)])
def test_sap_matches_mask_lane_for_lane(n, seed):
    """With window = n-1 (no truncation possible) SaP must reproduce
    the mask path's selected pairs in the SAME lane order."""
    p, q, h = _random_scene(n, seed)
    pi_c, pj_c = map(jnp.asarray, np.triu_indices(n, k=1))
    cap = n * (n - 1) // 2          # no capacity truncation either
    mask = broadphase.pair_overlap_mask(p, q, h, pi_c, pj_c)
    mi, mj, mact = broadphase.select_pairs(mask, pi_c, pj_c, cap)
    si, sj, sact = broadphase.sap_select_pairs(p, q, h, cap, n - 1)
    np.testing.assert_array_equal(np.asarray(mact), np.asarray(sact))
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(si))
    np.testing.assert_array_equal(np.asarray(mj), np.asarray(sj))
    assert int(jnp.sum(mact)) > 0       # the scene actually overlaps


def test_sap_small_window_still_finds_contiguous_overlaps():
    """A line of touching boxes: every overlapping pair is adjacent in
    x-rank, so even window=1 finds the full pair set."""
    n = 12
    p = jnp.stack([jnp.arange(n) * 0.5, jnp.zeros(n), jnp.ones(n)], 1)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    h = jnp.full((n, 3), 0.3)       # 0.6 wide > 0.5 spacing: neighbors touch
    cap = 32
    si, sj, sact = broadphase.sap_select_pairs(p, q, h, cap, 1)
    got = {(int(a), int(b)) for a, b, m in
           zip(np.asarray(si), np.asarray(sj), np.asarray(sact)) if m}
    assert got == {(i, i + 1) for i in range(n - 1)}


def test_sap_window_truncation_drops_far_pairs_only():
    """One huge slab overlapping many boxes: a too-small window loses
    only pairs whose x-rank distance exceeds the window."""
    n = 10
    # boxes spaced 1 apart; a slab (body 0) spanning all of them
    p = np.zeros((n, 3)); p[:, 0] = np.arange(n); p[:, 2] = 1.0
    h = np.full((n, 3), 0.3); h[0] = (20.0, 0.3, 0.3)
    q = np.tile([1.0, 0, 0, 0], (n, 1))
    p, q, h = map(lambda x: jnp.asarray(x, jnp.float32), (p, q, h))
    cap = 64
    full_i, full_j, full_act = broadphase.sap_select_pairs(p, q, h, cap, n - 1)
    full = {(int(a), int(b)) for a, b, m in
            zip(np.asarray(full_i), np.asarray(full_j),
                np.asarray(full_act)) if m}
    assert full == {(0, j) for j in range(1, n)}
    si, sj, sact = broadphase.sap_select_pairs(p, q, h, cap, 3)
    got = {(int(a), int(b)) for a, b, m in
           zip(np.asarray(si), np.asarray(sj), np.asarray(sact)) if m}
    # slab is rank 0 in x (widest -> smallest lo_x): keeps the 3
    # nearest-in-rank partners, drops the rest, invents nothing
    assert got <= full
    assert len(got) == 3


def test_step_trajectory_parity_sap_vs_mask():
    """End-to-end: stepping a pile with the SaP broadphase matches the
    mask broadphase trajectory exactly (same selected lanes -> same
    contacts -> same step)."""
    spec, st = scenes.box_pile(27, seed=5)
    base = dict(
        solver=SolverKind.MATRIX_FREE, solver_iters=60,
        jacobi_omega=0.3, jacobi_beta=0.45,
        conditional_cfm=False, cfm_always=1e-9,
        contact_capacity=128, pair_capacity=96, broadphase_margin=0.05,
    )
    cfg_mask = SimConfig(**base, broadphase_kind="mask")
    cfg_sap = SimConfig(**base, broadphase_kind="sap", sap_window=26)
    s_m, s_s = st, st
    for _ in range(15):
        s_m, _ = step_ode(spec, s_m, cfg_mask)
        s_s, _ = step_ode(spec, s_s, cfg_sap)
    np.testing.assert_array_equal(np.asarray(s_m.p), np.asarray(s_s.p))
    np.testing.assert_array_equal(np.asarray(s_m.v), np.asarray(s_s.v))


def test_select_scene_pairs_falls_back_on_noncanonical_pairs():
    """A spec with a custom (non-all-pairs) pair list must route to the
    mask path even when cfg asks for SaP."""
    spec, st = scenes.box_stack(4)
    spec = spec._replace(pair_i=spec.pair_i[:2], pair_j=spec.pair_j[:2])
    cfg = SimConfig(broadphase_kind="sap", pair_capacity=2,
                    contact_capacity=16)
    pi, pj, act = broadphase.select_scene_pairs(spec, st, cfg)
    assert pi.shape == (2,)
