"""Randomized property tests for the SAT narrowphase vs a slow oracle.

Mirrors the reference's test strategy (eggshell/collision.cc:437-809):
- fast SAT result must equal a brute-force 15-axis separation test;
- metamorphic: moving boxes apart by 0.99x depth keeps them colliding,
  1.01x separates them;
- per-classification-code contact invariants (codes 1-16).

The oracle is a clean-room NumPy 15-axis projection test (the analog of
`BoxesSeparated`, ref collision.cc:454-473).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.ops import collision
from eggshell_tpu.ops import quaternion as quat

N_CASES = 3000  # ref uses 100k; run the full load with EGGSHELL_SLOW_TESTS=1
import os

if os.environ.get("EGGSHELL_SLOW_TESTS"):
    N_CASES = 100_000


def oracle_separated(c1, R1, h1, c2, R2, h2):
    """Brute-force 15-axis separation test (NumPy, float64)."""

    def sep_axis(axis):
        n = np.linalg.norm(axis)
        if n < 1e-300:
            return False
        span1 = np.sum(h1 * np.abs(axis @ R1))
        span2 = np.sum(h2 * np.abs(axis @ R2))
        return abs(axis @ (c1 - c2)) > span1 + span2

    axes = [R1[:, i] for i in range(3)] + [R2[:, i] for i in range(3)]
    axes += [np.cross(R1[:, i], R2[:, j]) for i in range(3) for j in range(3)]
    return any(sep_axis(a) for a in axes)


def face_pseudo_distance(c, R, h, p):
    """<0 inside, 0 on face, >0 outside (ref collision.cc:489-493)."""
    q = R.T @ (p - c)
    return np.max(np.abs(q) / h) - 1


def random_boxes(rng, n):
    c1 = rng.uniform(-1, 1, (n, 3))
    c2 = rng.uniform(-1, 1, (n, 3))
    h1 = np.abs(rng.uniform(-1, 1, (n, 3))) + 1e-3
    h2 = np.abs(rng.uniform(-1, 1, (n, 3))) + 1e-3
    q1 = rng.normal(size=(n, 4))
    q2 = rng.normal(size=(n, 4))
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    R1 = np.array(quat.quat_to_mat(jnp.asarray(q1)))
    R2 = np.array(quat.quat_to_mat(jnp.asarray(q2)))
    # Sometimes share axes to probe degeneracies (ref collision.cc:703-725)
    for i in range(0, n, 5):
        R2[i][:, 0] = R1[i][:, 0]
        # re-orthonormalise
        R2[i][:, 1] -= (R2[i][:, 1] @ R2[i][:, 0]) * R2[i][:, 0]
        R2[i][:, 1] /= np.linalg.norm(R2[i][:, 1])
        R2[i][:, 2] = np.cross(R2[i][:, 0], R2[i][:, 1])
    for i in range(0, n, 15):
        R2[i] = R1[i].copy()  # fully aligned
    return c1, R1, h1, c2, R2, h2


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    c1, R1, h1, c2, R2, h2 = random_boxes(rng, N_CASES)
    f = jax.jit(jax.vmap(collision.collide_boxes))
    out = f(
        jnp.asarray(c1), jnp.asarray(R1), jnp.asarray(h1),
        jnp.asarray(c2), jnp.asarray(R2), jnp.asarray(h2),
    )
    return (c1, R1, h1, c2, R2, h2), jax.tree_util.tree_map(np.asarray, out)


def test_separation_matches_oracle(batch):
    (c1, R1, h1, c2, R2, h2), out = batch
    mismatches = []
    for i in range(N_CASES):
        want = oracle_separated(c1[i], R1[i], h1[i], c2[i], R2[i], h2[i])
        got = out.code[i] == 0
        if got != want:
            mismatches.append(i)
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:5]}"


def test_collision_info_consistency(batch):
    _, out = batch
    colliding = out.code != 0
    # having active contacts <=> collision (ref collision.cc:736)
    has_contacts = out.active.any(axis=1)
    np.testing.assert_array_equal(colliding, has_contacts)
    # separating axis unit length, depth >= -eps (ref :740-742)
    norms = np.linalg.norm(out.separating_axis[colliding], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)
    assert (out.info_depth[colliding] >= -1e-9).all()
    # contact normals unit length, depths of active contacts >= -eps (ref :763-766)
    act = out.active
    assert (np.linalg.norm(out.normal[act], axis=-1) > 1 - 1e-9).all()


def test_metamorphic_separation(batch):
    """Move box1 along -axis by 0.99/1.01 depth => still colliding / separated
    (ref collision.cc:743-758)."""
    (c1, R1, h1, c2, R2, h2), out = batch
    colliding = np.flatnonzero((out.code != 0) & (out.info_depth > 1e-7))
    idx = colliding[:400]
    f = jax.jit(jax.vmap(collision.collide_boxes))
    for scale, expect_collide in ((0.99, True), (1.02, False)):
        c1s = c1[idx] - scale * out.info_depth[idx, None] * out.separating_axis[idx]
        res = f(
            jnp.asarray(c1s), jnp.asarray(R1[idx]), jnp.asarray(h1[idx]),
            jnp.asarray(c2[idx]), jnp.asarray(R2[idx]), jnp.asarray(h2[idx]),
        )
        got_collide = np.asarray(res.code) != 0
        frac = np.mean(got_collide == expect_collide)
        assert frac == 1.0, f"scale {scale}: {frac}"


def test_code_dependent_contacts(batch):
    """Ref collision.cc:768-804."""
    (c1, R1, h1, c2, R2, h2), out = batch
    checked = 0
    for i in range(N_CASES):
        code = out.code[i]
        if code == 0:
            continue
        act = out.active[i]
        pos = out.position[i][act]
        dep = out.depth[i][act]
        nrm = out.normal[i][act]
        if 1 <= code <= 3:
            # contacts lie on a face of box2; projecting along normal by depth
            # lands on box1's surface
            for k in range(len(pos)):
                assert abs(face_pseudo_distance(c2[i], R2[i], h2[i], pos[k])) < 1e-7
                qpt = pos[k] + nrm[k] * dep[k]
                assert abs(face_pseudo_distance(c1[i], R1[i], h1[i], qpt)) < 1e-7
        elif 4 <= code <= 6:
            for k in range(len(pos)):
                assert abs(face_pseudo_distance(c1[i], R1[i], h1[i], pos[k])) < 1e-7
                qpt = pos[k] - nrm[k] * dep[k]
                assert abs(face_pseudo_distance(c2[i], R2[i], h2[i], qpt)) < 1e-7
        elif 7 <= code <= 15:
            assert act.sum() == 1
            np.testing.assert_allclose(nrm[0], out.separating_axis[i], atol=1e-12)
        elif code == 16:
            assert act.sum() == 1
            np.testing.assert_allclose(pos[0], c2[i], atol=1e-12)
        else:
            raise AssertionError(f"bad code {code}")
        checked += 1
    assert checked > N_CASES // 4


def test_aligned_boxes_make_contact_rectangle():
    """Two axis-aligned stacked boxes => 4 contacts (ref collision.cc:802-804)."""
    h = jnp.asarray([0.15, 0.15, 0.15], jnp.float64)
    eye = jnp.eye(3, dtype=jnp.float64)
    out = collision.collide_boxes(
        jnp.asarray([0.0, 0.0, 0.15], jnp.float64), eye, h,
        jnp.asarray([0.0, 0.0, 0.44], jnp.float64), eye, h,
    )
    assert int(out.active.sum()) == 4
    assert 1 <= int(out.code) <= 6
    np.testing.assert_allclose(float(out.info_depth), 0.01, atol=1e-12)
    # depth of each contact = overlap
    np.testing.assert_allclose(
        np.asarray(out.depth)[np.asarray(out.active)], 0.01, atol=1e-12
    )


def test_ground_contacts():
    """8-corner test (ref collision.cc:408-432)."""
    h = jnp.asarray([0.15, 0.15, 0.15], jnp.float64)
    eye = jnp.eye(3, dtype=jnp.float64)
    # resting exactly: corners at z=0 -> no contact (strict <)
    pos, nrm, dep, act = collision.collide_box_and_ground(
        jnp.asarray([0.0, 0.0, 0.15], jnp.float64), eye, h
    )
    assert not bool(act.any())
    # penetrating by 0.05
    pos, nrm, dep, act = collision.collide_box_and_ground(
        jnp.asarray([0.0, 0.0, 0.10], jnp.float64), eye, h
    )
    assert int(act.sum()) == 4
    np.testing.assert_allclose(np.asarray(dep)[np.asarray(act)], 0.05, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nrm), np.tile([0, 0, 1.0], (8, 1)))
    # rotated 45 deg about x: lowest edge digs in
    q45 = quat.quat_from_scaled_axis(jnp.asarray([np.pi / 4, 0, 0], jnp.float64))
    R45 = quat.quat_to_mat(q45)
    pos, nrm, dep, act = collision.collide_box_and_ground(
        jnp.asarray([0.0, 0.0, 0.1], jnp.float64), R45, h
    )
    assert int(act.sum()) == 2
