"""Matrix-free JMJ^T operator + projected iterations for large single
scenes — the reference's sparse constraint-wise path
(eggshell/sparse_iterations_utils.cc:67-373, CalculateSparseJMJtX
:624-695) rebuilt on compact two-body blocks with segment-sums."""

import jax
import jax.numpy as jnp
import numpy as np

import eggshell_tpu.physics.scene as scn
from eggshell_tpu.ops import lcp, lcp_matrix_free as mf
from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.constraints import build_constraints
from eggshell_tpu.physics.contacts import make_contacts
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig, SolverKind


def _contact_rich_scene():
    cfg = SimConfig(
        solver=SolverKind.PGS, solver_iters=60, conditional_cfm=False,
        cfm_always=0.01, contact_capacity=48,
    )
    spec, state = scenes.living_room()
    # settle a few steps so box-box and ground contacts coexist
    for _ in range(5):
        state, _ = step_ode(spec, state, cfg)
    cs = make_contacts(spec, state, cfg)
    sys = build_constraints(spec, state, cs, cfg)
    Minv = scn.inv_mass_blocks(spec, state)
    return spec, state, cfg, cs, sys, Minv


def test_matrix_free_matvec_matches_dense():
    spec, state, cfg, cs, sys, Minv = _contact_rich_scene()
    blocks, b0, b1 = mf.compact_blocks(sys, cs, spec)
    m = sys.num_rows
    Jf = sys.J.reshape(m, -1)
    Minv_full = jax.scipy.linalg.block_diag(*[Minv[i] for i in range(
        spec.num_bodies)])
    A = Jf @ Minv_full @ Jf.T

    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=m))
        want = A @ x + 0.01 * x
        got = mf.jmjt_matvec(blocks, b0, b1, Minv, x, cfm=0.01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-10)

    d_want = jnp.diagonal(A) + 0.01
    d_got = mf.jmjt_diagonal(blocks, b0, b1, Minv, cfm=0.01)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want),
                               atol=1e-10)


def test_matrix_free_solver_matches_dense_jacobi():
    """Identical iterates to ops/lcp.solve_lcp(method='jacobi') on the
    dense system (same sweeps/omega/beta) — the matrix-free form is a
    reformulation, not an approximation."""
    from eggshell_tpu.physics.stepper import system_matrix

    spec, state, cfg, cs, sys, Minv = _contact_rich_scene()
    blocks, b0, b1 = mf.compact_blocks(sys, cs, spec)
    A = system_matrix(spec, state, sys, cfg)

    u = scn.pack_velocity(state)
    F = scn.external_forces(spec, state, cfg.gravity)
    MinvF = jnp.einsum("nij,nj->ni", Minv, F)
    rhs = -cfg.erp / cfg.dt / cfg.dt * sys.err - jnp.einsum(
        "mnk,nk->m", sys.J, u / cfg.dt + MinvF
    )

    x_dense = lcp.solve_lcp(
        A, rhs, sys.is_eq, sys.lo, sys.hi, iters=40, method="jacobi",
        jacobi_omega=0.3, jacobi_beta=0.45,
    )
    x_mf = mf.solve_lcp_matrix_free(
        blocks, b0, b1, Minv, rhs, sys.is_eq, sys.lo, sys.hi,
        iters=40, omega=0.3, beta=0.45, cfm=float(cfg.cfm_always),
    )
    act = np.asarray(sys.row_active)
    np.testing.assert_allclose(
        np.asarray(x_mf)[act], np.asarray(x_dense)[act], atol=1e-9
    )


def test_matrix_free_with_joints():
    """Joint (equality) lanes flow through the compact-block operator."""
    cfg = SimConfig(
        solver=SolverKind.PGS, solver_iters=60, conditional_cfm=False,
        cfm_always=0.01, contact_capacity=16,
    )
    spec, state = scenes.pendulum_chain(4)
    cs = make_contacts(spec, state, cfg)
    sys = build_constraints(spec, state, cs, cfg)
    Minv = scn.inv_mass_blocks(spec, state)
    blocks, b0, b1 = mf.compact_blocks(sys, cs, spec)
    m = sys.num_rows
    Jf = sys.J.reshape(m, -1)
    Minv_full = jax.scipy.linalg.block_diag(
        *[Minv[i] for i in range(spec.num_bodies)]
    )
    A = Jf @ Minv_full @ Jf.T
    x = jnp.asarray(np.random.default_rng(1).normal(size=m))
    np.testing.assert_allclose(
        np.asarray(mf.jmjt_matvec(blocks, b0, b1, Minv, x)),
        np.asarray(A @ x), atol=1e-10,
    )
