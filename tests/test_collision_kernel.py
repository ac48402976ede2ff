"""Pallas narrowphase kernel vs the XLA path — lane-for-lane equality
on random box pairs (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from eggshell_tpu.ops import collision
from eggshell_tpu.ops.collision_kernel import collide_boxes_lanes
from eggshell_tpu.ops import quaternion as quat


def _random_pairs(rng, n, dtype):
    c1 = rng.uniform(-1, 1, (n, 3))
    c2 = rng.uniform(-1, 1, (n, 3))
    h1 = np.abs(rng.uniform(-1, 1, (n, 3))) + 1e-2
    h2 = np.abs(rng.uniform(-1, 1, (n, 3))) + 1e-2
    q1 = rng.normal(size=(n, 4))
    q2 = rng.normal(size=(n, 4))
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    R1 = np.array(quat.quat_to_mat(jnp.asarray(q1)))
    R2 = np.array(quat.quat_to_mat(jnp.asarray(q2)))
    # aligned / shared-axis degenerate cases
    for i in range(0, n, 7):
        R2[i] = R1[i]
    for i in range(0, n, 11):
        c2[i] = c1[i] + np.array([0, 0, (h1[i, 2] + h2[i, 2]) * 0.95])
    to = lambda x: jnp.asarray(x, dtype)
    return to(c1), to(R1), to(h1), to(c2), to(R2), to(h2)


def test_kernel_matches_xla_path():
    rng = np.random.default_rng(0)
    n = 257  # forces padding to 2 tiles... (TILE=1024) -> 1 tile + pad
    args = _random_pairs(rng, n, jnp.float32)

    want = jax.jit(jax.vmap(collision.collide_boxes))(*args)
    got = collide_boxes_lanes(*args, interpret=True)

    wc = np.asarray(want.code)
    gc = np.asarray(got.code)
    # Fully-aligned pairs can tie two face axes to the bit; either axis is
    # a correct answer but summation order may break the tie differently.
    # Such lanes must still agree on depth and contact count.
    tie = wc != gc
    if tie.any():
        # tie lanes: same collision verdict and depth; the chosen face /
        # resulting contact set may legitimately differ.
        np.testing.assert_allclose(
            np.asarray(got.info_depth)[tie], np.asarray(want.info_depth)[tie],
            atol=1e-5,
        )
        assert ((wc[tie] > 0) == (gc[tie] > 0)).all()
        assert (np.asarray(got.active)[tie].sum(-1) > 0).all()
        assert tie.mean() < 0.05

    same = ~tie
    # Zero-depth contacts sit exactly on the |depth| > 1e-9 keep
    # threshold; fp summation order flips them between the two paths.
    # Compare strictly only on slots clearly away from the boundary.
    wd = np.abs(np.asarray(want.depth))
    gd = np.abs(np.asarray(got.depth))
    boundary = (np.minimum(wd, gd) < 1e-6)
    clear = same[:, None] & ~boundary
    np.testing.assert_array_equal(
        np.asarray(got.active)[clear], np.asarray(want.active)[clear]
    )
    np.testing.assert_allclose(
        np.asarray(got.info_depth)[same], np.asarray(want.info_depth)[same],
        atol=1e-5, rtol=1e-4,
    )
    act = np.asarray(want.active) & np.asarray(got.active) & same[:, None]
    np.testing.assert_allclose(
        np.asarray(got.position)[act], np.asarray(want.position)[act],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got.depth)[act], np.asarray(want.depth)[act], atol=1e-4
    )
    colliding = (wc != 0) & same
    np.testing.assert_allclose(
        np.asarray(got.separating_axis)[colliding],
        np.asarray(want.separating_axis)[colliding],
        atol=1e-5,
    )
