"""Property tests for the SO(3)/quaternion layer.

Mirrors the reference's utils tests (eggshell/utils.cc:329-573):
CrossMat, random-rotation orthonormality, AlignVectors, plus exp-map
round-trip checks covering WtoQ (utils.cc:82-89).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.ops import quaternion as q

TOL = 1e-9
N = 50


def test_cross_mat(key):
    v = jax.random.normal(key, (N, 3), dtype=jnp.float64)
    w = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), dtype=jnp.float64)
    got = jnp.einsum("nij,nj->ni", q.cross_mat(v), w)
    np.testing.assert_allclose(got, jnp.cross(v, w), atol=TOL)


def test_random_rotation_orthonormal(key):
    R = q.random_rotation(key, (N,), dtype=jnp.float64)
    assert bool(q.is_orthonormal(R, TOL).all())
    # determinant +1 (proper rotation)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-8)


def test_quat_mat_round_trip(key):
    qq = q.random_quat(key, (N,), dtype=jnp.float64)
    R = q.quat_to_mat(qq)
    q2 = q.mat_to_quat(R)
    R2 = q.quat_to_mat(q2)
    np.testing.assert_allclose(R, R2, atol=1e-8)


def test_quat_rotate_matches_matrix(key):
    qq = q.random_quat(key, (N,), dtype=jnp.float64)
    v = jax.random.normal(jax.random.fold_in(key, 2), (N, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        q.quat_rotate(qq, v),
        jnp.einsum("nij,nj->ni", q.quat_to_mat(qq), v),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        q.quat_rotate_inv(qq, q.quat_rotate(qq, v)), v, atol=1e-9
    )


def test_exp_map_matches_angle_axis(key):
    """quat_from_scaled_axis vs explicit angle-axis (WtoQ semantics,
    ref eggshell/utils.cc:82-89)."""
    w = jax.random.normal(key, (N, 3), dtype=jnp.float64) * 10.0
    dt = 1e-3
    got = q.quat_from_scaled_axis(w * dt)
    angle = np.linalg.norm(np.asarray(w), axis=-1) * dt
    axis = np.asarray(w) / np.linalg.norm(np.asarray(w), axis=-1, keepdims=True)
    want = np.concatenate(
        [np.cos(angle / 2)[:, None], np.sin(angle / 2)[:, None] * axis], axis=-1
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_exp_map_zero_velocity():
    got = q.quat_from_scaled_axis(jnp.zeros((3,), dtype=jnp.float64))
    np.testing.assert_allclose(got, [1.0, 0, 0, 0], atol=0)
    # differentiable at zero
    g = jax.jacobian(q.quat_from_scaled_axis)(jnp.zeros(3, dtype=jnp.float64))
    assert np.isfinite(np.asarray(g)).all()


def test_integrate_quat_small_step(key):
    """One integrator update == rotation by |w| dt about w-hat
    (ref eggshell/ensembles.cc:588)."""
    qq = q.random_quat(key, (N,), dtype=jnp.float64)
    w = jax.random.normal(jax.random.fold_in(key, 3), (N, 3), dtype=jnp.float64)
    dt = 1e-3
    q_new = q.integrate_quat(qq, w, dt)
    R_new = q.quat_to_mat(q_new)
    R_expected = q.quat_to_mat(q.quat_from_scaled_axis(w * dt)) @ q.quat_to_mat(qq)
    np.testing.assert_allclose(R_new, R_expected, atol=1e-12)


def test_align_vectors(key):
    """R @ a-hat == b-hat (ref eggshell/utils.cc:233-254, 499-515)."""
    a = jax.random.normal(key, (N, 3), dtype=jnp.float64)
    b = jax.random.normal(jax.random.fold_in(key, 4), (N, 3), dtype=jnp.float64)
    R = q.align_vectors_mat(a, b)
    assert bool(q.is_orthonormal(R, 1e-9).all())
    ah = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bh = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        jnp.einsum("nij,nj->ni", R, ah), bh, atol=1e-9
    )


def test_align_vectors_degenerate():
    a = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1e-30, 1.0]])
    # parallel, antiparallel, near-parallel
    b = jnp.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R = q.align_vectors_mat(a.astype(jnp.float64), b.astype(jnp.float64))
    assert bool(q.is_orthonormal(R, 1e-9).all())
    got = jnp.einsum("nij,nj->ni", R, a)
    np.testing.assert_allclose(got[0], [0, 0, 1], atol=1e-9)
    np.testing.assert_allclose(got[1], [-1, 0, 0], atol=1e-9)


def test_gram_schmidt(key):
    m = jax.random.normal(key, (N, 3, 3), dtype=jnp.float64)
    R = q.gram_schmidt(m)
    eye = jnp.eye(3, dtype=jnp.float64)
    np.testing.assert_allclose(
        jnp.swapaxes(R, -1, -2) @ R, jnp.broadcast_to(eye, R.shape), atol=1e-9
    )


def test_box_inertia():
    """m/12 (sy^2+sz^2) etc — ref eggshell/body.cc:19-36. Default box:
    unit mass, sides 0.3 (ref eggshell/body.h:91)."""
    I = q.box_inertia(jnp.asarray(1.0), jnp.asarray([0.3, 0.3, 0.3]))
    np.testing.assert_allclose(np.diag(I), [0.015, 0.015, 0.015], atol=1e-12)
    I2 = q.box_inertia(jnp.asarray(2.0), jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(
        np.diag(I2), [2 / 12 * 13, 2 / 12 * 10, 2 / 12 * 5], atol=1e-12
    )


def test_mat_to_quat_near_identity_and_pi():
    angles = [0.0, 1e-8, np.pi - 1e-7, np.pi]
    for ang in angles:
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        qq = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        R = q.quat_to_mat(jnp.asarray(qq, dtype=jnp.float64))
        q2 = q.mat_to_quat(R)
        R2 = q.quat_to_mat(q2)
        np.testing.assert_allclose(R, R2, atol=1e-7)


@pytest.mark.parametrize("fn", [q.quat_mul, lambda a, b: q.quat_rotate(a, b[..., :3])])
def test_vmap_jit_consistency(key, fn):
    a = q.random_quat(key, (N,), dtype=jnp.float64)
    b = q.random_quat(jax.random.fold_in(key, 9), (N,), dtype=jnp.float64)
    direct = fn(a, b)
    vm = jax.jit(jax.vmap(fn))(a, b)
    np.testing.assert_allclose(direct, vm, atol=1e-15)
