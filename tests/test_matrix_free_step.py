"""SolverKind.MATRIX_FREE end-to-end stepping: parity with the dense path
at small scale, O(K)-memory stepping of the large box-pile scene, and the
broadphase + Pallas-narrowphase composition (ref analogs:
eggshell/sparse_iterations_utils.cc:624-695 matrix-free JMJt machinery;
toolkit/collision.h:40 broadphase)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.contacts import make_contacts, make_contacts_batched
from eggshell_tpu.physics.stepper import step_ode, step_ode_batched
from eggshell_tpu.utils.config import SimConfig, SolverKind


def _cfg(**kw):
    base = dict(
        conditional_cfm=False, cfm_always=1e-9, solver_iters=150,
        jacobi_omega=0.3, jacobi_beta=0.45, contact_capacity=48,
    )
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.parametrize("scene_name", ["box_stack", "living_room", "chain"])
def test_matrix_free_matches_dense_jacobi(scene_name):
    """Same sweep rule, same math: the matrix-free step must track the
    dense JACOBI step to solver precision on small scenes (where both
    paths run)."""
    if scene_name == "box_stack":
        spec, st = scenes.box_stack(4, jitter=0.01, seed=3)
    elif scene_name == "living_room":
        spec, st = scenes.living_room()
    else:
        spec, st = scenes.chain(5, collide=True)

    mf = _cfg(solver=SolverKind.MATRIX_FREE)
    de = _cfg(solver=SolverKind.JACOBI)
    s_mf, s_de = st, st
    for _ in range(25):
        s_mf, _ = step_ode(spec, s_mf, mf)
        s_de, _ = step_ode(spec, s_de, de)
    np.testing.assert_allclose(
        np.asarray(s_mf.p), np.asarray(s_de.p), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_mf.v), np.asarray(s_de.v), atol=5e-5
    )


def test_box_pile_steps_and_stays_finite():
    """The large-scene tier: 216-body pile with broadphase pair pruning,
    contact capacity in the thousands — the dense (3K)^2 system matrix
    at this size would be ~2 GB; the matrix-free path steps it in O(K)."""
    spec, st = scenes.box_pile(216)
    cfg = _cfg(
        solver=SolverKind.MATRIX_FREE,
        contact_capacity=2048,
        pair_capacity=1024,        # of 23220 all-pairs candidates
        broadphase_margin=0.05,
        solver_iters=60,
    )
    for _ in range(3):
        st, cs = step_ode(spec, st, cfg)
    assert bool(jnp.all(jnp.isfinite(st.p)))
    assert bool(jnp.all(jnp.isfinite(st.v)))
    # Boxes must not fall through the ground.
    assert float(st.p[:, 2].min()) > -0.05
    # The bottom layer (6x6 boxes, 4 corners each) is in ground contact
    # from the start; box-box contacts accrue as the lattice collapses.
    assert int(cs.active.sum()) >= 144


def test_broadphase_composes_with_pallas_narrowphase():
    """pair_capacity > 0 must no longer disable the batched Pallas
    narrowphase: the kernel runs on the broadphase-selected pair subset
    and reproduces the XLA path's contact set."""
    spec, st = scenes.living_room()
    B = 3
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st
    )
    key = jax.random.PRNGKey(1)
    states = states._replace(
        p=states.p + 1e-3 * jax.random.normal(key, states.p.shape)
    )
    cfg = _cfg(contact_capacity=64, pair_capacity=8, broadphase_margin=0.1)

    kern = make_contacts_batched(spec, states, cfg, use_kernel=True)
    xla = make_contacts_batched(spec, states, cfg, use_kernel=False)
    assert int(kern.active.sum()) == int(xla.active.sum())
    ka, xa = np.asarray(kern.active), np.asarray(xla.active)
    np.testing.assert_array_equal(ka, xa)
    for field in ("position", "normal", "depth"):
        k = np.asarray(getattr(kern, field))[ka]
        x = np.asarray(getattr(xla, field))[xa]
        np.testing.assert_allclose(k, x, atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(kern.b0)[ka], np.asarray(xla.b0)[xa]
    )
    np.testing.assert_array_equal(
        np.asarray(kern.b1)[ka], np.asarray(xla.b1)[xa]
    )


def test_batched_kernel_step_with_broadphase():
    """The full batched fused-kernel step runs with pair_capacity set
    (previously the kernel path silently fell back).  Sizes kept small:
    interpret-mode Pallas cost scales with 9 K^2 x sweeps."""
    spec, st = scenes.living_room()
    B = 2
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st
    )
    kcfg = _cfg(solver=SolverKind.JACOBI_KERNEL, contact_capacity=16,
                pair_capacity=6, broadphase_margin=0.1, solver_iters=6)
    xcfg = kcfg.replace(solver=SolverKind.JACOBI)
    out_k = step_ode_batched(spec, states, kcfg)
    out_x = step_ode_batched(spec, states, xcfg)
    np.testing.assert_allclose(
        np.asarray(out_k.p), np.asarray(out_x.p), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_k.v), np.asarray(out_x.v), atol=1e-7
    )
