"""Scalable sparse FEM solve + differentiable core + numerical port
modes — the reference-depth solver tier (ref toolkit/femsolver.h triplet
assembly + SimplicialLLT/SparseLU :134-135, 255-310; rama/solver.cc
WaveguideModeFEMProblem :251; jet derivatives rama/solver.h:272-277).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.fem import sparse as sparselib
from eggshell_tpu.fem.helmholtz import (
    FemConfig,
    _cdtype,
    make_driven_fn,
    solve_driven,
)
from eggshell_tpu.fem.mesher import mesh_structured
from eggshell_tpu.fem.shape import Rectangle


def _wr90(L=60.0, a=22.86):
    cd = Rectangle(0, 0, L, a)
    cd.Port((0, 0), (0, a), 1).Port((L, 0), (L, a), 2)
    return cd


CFG = FemConfig(type="EZ", frequency=10e9, unit=1e-3, excited_port=1)


# ---------------------------------------------------------------------------
# sparse_solve vs dense


def test_sparse_solve_matches_dense_complex():
    rng = np.random.default_rng(0)
    n = 60
    d = rng.uniform(1, 2, n)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    off = rng.normal(size=n - 1) * 0.3 + 1j * rng.normal(size=n - 1) * 0.1
    vals = jnp.asarray(
        np.concatenate([d + 0j, off, off]), jnp.complex128
    )
    b = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    x = sparselib.sparse_solve(rows, cols, vals, b, n)
    A = np.asarray(sparselib.coo_to_dense(
        jnp.asarray(rows), jnp.asarray(cols), vals, n
    ))
    np.testing.assert_allclose(A @ np.asarray(x), np.asarray(b), atol=1e-10)


def test_sparse_solve_duplicate_triplets_accumulate():
    # same entry listed twice must sum (Eigen setFromTriplets semantics)
    rows = np.array([0, 0, 1, 1])
    cols = np.array([0, 0, 1, 1])
    vals = jnp.asarray([1.0, 1.0, 3.0, 1.0], jnp.complex128)
    b = jnp.asarray([2.0, 8.0], jnp.complex128)
    x = sparselib.sparse_solve(rows, cols, vals, b, 2)
    np.testing.assert_allclose(np.asarray(x), [1.0, 2.0], atol=1e-12)


# ---------------------------------------------------------------------------
# Scalable driven solve (the single biggest round-1 gap)


def test_large_mesh_sparse_solve_matches_small_dense():
    """A >=10k-node waveguide run solves through the sparse path and
    reproduces the coarse-mesh S-parameters (the reference routinely
    meshes 10k+ triangles, rama/mesh.cc)."""
    cd = _wr90()
    m_small = mesh_structured(cd, (0, 0), (60.0, 0), (0, 22.86), 2.0)
    m_big = mesh_structured(cd, (0, 0), (60.0, 0), (0, 22.86), 0.36)
    assert m_small.num_points < 1200       # dense path
    assert m_big.num_points > 10000        # sparse path
    sol_s = solve_driven(m_small, CFG)
    sol_b = solve_driven(m_big, CFG)
    # matched guide: |S21| = 1, |S11| = 0 at any resolution
    assert abs(abs(sol_b.s_params[2]) - 1.0) < 1e-3
    assert abs(sol_b.s_params[1]) < 1e-3
    assert abs(abs(sol_s.s_params[2]) - abs(sol_b.s_params[2])) < 2e-3


def test_mesh_refinement_convergence():
    """S21 phase converges to the analytic TE10 value as the mesh is
    refined (dispersion-error convergence — the mesher/solver pair is
    actually convergent, not just stable)."""
    a, L = 22.86, 60.0
    cd = _wr90(L, a)
    k0 = CFG.k0
    beta = np.sqrt(k0**2 - (np.pi / a) ** 2)
    target = np.exp(-1j * beta * L)
    errs = []
    for h in [2.0, 1.0, 0.5]:
        m = mesh_structured(cd, (0, 0), (L, 0), (0, a), h)
        sol = solve_driven(m, CFG)
        errs.append(abs(sol.s_params[2] - target))
    # monotone decrease and roughly O(h^2)
    assert errs[1] < errs[0] and errs[2] < errs[1], errs
    assert errs[2] < errs[0] / 6, errs


# ---------------------------------------------------------------------------
# End-to-end differentiable core


@pytest.mark.parametrize("h,label", [(2.0, "dense"), (0.7, "sparse")])
def test_grad_through_public_api(h, label):
    """jax.grad of an S-parameter w.r.t. a geometry parameter flows
    through assembly AND the (dense or host-factorized sparse) solve and
    matches finite differences (ref capability: jets through the whole
    pipeline, rama/my_jet.h, solver.h:272-277)."""
    cd = _wr90(30.0)
    m = mesh_structured(cd, (0, 0), (30.0, 0), (0, 22.86), h)
    is_sparse = m.num_points > 1200
    assert is_sparse == (label == "sparse")
    fn, plan = make_driven_fn(m, CFG)
    dtype = _cdtype()
    eps = jnp.asarray(m.epsilon, dtype)
    sxx = jnp.asarray(m.sigma_xx)
    syy = jnp.asarray(m.sigma_yy)
    sxy = jnp.asarray(m.sigma_xy)
    exc = jnp.asarray(m.excitation, dtype)
    pts0 = jnp.asarray(m.points)

    def loss(theta):  # stretch the guide in x
        pts = pts0 * jnp.asarray([1.0 + theta, 1.0])
        _, s = fn(pts, eps, sxx, syy, sxy, exc, jnp.asarray(CFG.k0))
        return jnp.real(s[1, 0])

    g = jax.grad(loss)(0.0)
    step = 1e-6
    fd = (loss(step) - loss(-step)) / (2 * step)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5, atol=1e-8)

    # reverse-mode w.r.t. the material field works too
    geps = jax.grad(
        lambda e: jnp.abs(
            fn(pts0, e.astype(dtype), sxx, syy, sxy, exc,
               jnp.asarray(CFG.k0))[1][0, 0]
        ) ** 2
    )(jnp.real(eps))
    assert np.isfinite(np.asarray(geps)).all()


def test_grad_wrt_frequency():
    cd = _wr90(30.0)
    m = mesh_structured(cd, (0, 0), (30.0, 0), (0, 22.86), 2.0)
    fn, _ = make_driven_fn(m, CFG)
    dtype = _cdtype()
    args = (
        jnp.asarray(m.points), jnp.asarray(m.epsilon, dtype),
        jnp.asarray(m.sigma_xx), jnp.asarray(m.sigma_yy),
        jnp.asarray(m.sigma_xy), jnp.asarray(m.excitation, dtype),
    )

    def loss(k0):
        return jnp.real(fn(*args, k0)[1][1, 0])

    g = jax.grad(loss)(jnp.asarray(CFG.k0))
    step = 1e-7
    fd = (loss(jnp.asarray(CFG.k0 + step)) - loss(jnp.asarray(CFG.k0 - step))) / (2 * step)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


# ---------------------------------------------------------------------------
# Numerical port modes (dielectric-loaded port)


def test_dielectric_loaded_port_needs_numerical_modes():
    """Half-filled guide (eps=4 lower half): the analytic sin-mode port
    assumption produces spurious reflection; the numerical transverse
    eigenmode (WaveguideModeFEMProblem analog, rama/solver.cc:251)
    matches the true mode and transmits cleanly."""
    a, L = 22.86, 40.0
    cd = Rectangle(0, 0, L, a)
    cd.Port((0, 0), (0, a), 1).Port((L, 0), (L, a), 2)
    cd.Paint(Rectangle(-1, -1, L + 1, a / 2), epsilon=4.0)
    m = mesh_structured(cd, (0, 0), (L, 0), (0, a), 0.7,
                        material_split=0.5)
    sol_num = solve_driven(m, CFG, numerical_modes="auto")
    sol_ana = solve_driven(m, CFG, numerical_modes="never")
    assert abs(sol_num.s_params[1]) < 0.01          # matched
    assert abs(abs(sol_num.s_params[2]) - 1.0) < 0.01
    assert abs(sol_ana.s_params[1]) > 0.03          # analytic is wrong here
    # the loaded plan actually used numerical modes
    _, plan = make_driven_fn(m, CFG)
    assert all(not pp.analytic for pp in plan.ports)


def test_numerical_modes_match_analytic_on_homogeneous_port():
    """Forcing the numerical mode solver on an empty guide reproduces
    the analytic sin-mode S-parameters (cross-check of the 1D transverse
    eigensolver against the closed form)."""
    cd = _wr90(30.0)
    m = mesh_structured(cd, (0, 0), (30.0, 0), (0, 22.86), 1.0)
    sol_num = solve_driven(m, CFG, numerical_modes="always")
    sol_ana = solve_driven(m, CFG, numerical_modes="never")
    assert abs(sol_num.s_params[2] - sol_ana.s_params[2]) < 2e-3
    assert abs(sol_num.s_params[1] - sol_ana.s_params[1]) < 2e-3


def test_transverse_mode_cutoffs_match_analytic():
    """1D transverse eigenvalues reproduce (m pi / a)^2 cutoffs on a
    homogeneous port (cross-check against mode_cutoff_frequencies'
    closed form, ref rama/solver.h:240-243)."""
    from eggshell_tpu.fem import ports as portlib

    a = 22.86
    t = np.linspace(0, a, 61)
    eps = np.ones(61)
    k2 = CFG.k0**2
    tm = portlib.transverse_modes(t, eps, k2, 3, dirichlet=True)
    for i in range(3):
        kc2 = (i + 1) ** 2 * np.pi**2 / a**2
        # P1 line elements: O(h^2) eigenvalue error, ~9x larger for
        # mode 3 (kc scales with m)
        np.testing.assert_allclose(
            np.real(tm.kc2[i]), kc2, rtol=4e-3
        )


# ---------------------------------------------------------------------------
# Non-axis-aligned (diagonal) ports


def test_rotated_guide_matches_straight():
    """A 30-degree rotated guide gives the same S21 (magnitude AND
    phase) as the axis-aligned one — exercises chain-walk port node
    ordering on diagonal ports (would be corrupted by dominant-axis
    ordering)."""
    import math

    a, L = 22.86, 40.0
    ang = math.radians(30)
    c, s = math.cos(ang), math.sin(ang)

    def rot(pt):
        return (c * pt[0] - s * pt[1], s * pt[0] + c * pt[1])

    from eggshell_tpu.fem.shape import Shape, _RectSDF

    cdr = Shape(_RectSDF(0, 0, L, a))
    cdr.Port(rot((0, 0)), rot((0, a)), 1).Port(rot((L, 0)), rot((L, a)), 2)
    mr = mesh_structured(cdr, (0, 0), (c * L, s * L), (-s * a, c * a), 0.7)

    cd0 = _wr90(L, a)
    m0 = mesh_structured(cd0, (0, 0), (L, 0), (0, a), 0.7)
    solr = solve_driven(mr, CFG)
    sol0 = solve_driven(m0, CFG)
    assert abs(solr.s_params[2] - sol0.s_params[2]) < 2e-3
    assert abs(solr.s_params[1] - sol0.s_params[1]) < 2e-3


# ---------------------------------------------------------------------------
# Multimode S-matrix


def test_multimode_s_matrix_overmoded_guide():
    """Overmoded guide (a large enough for TE20): exciting mode 1 of a
    uniform guide stays in mode 1 (clean S-matrix diagonal); exciting
    mode 2 propagates mode 2 (beta2 correct by phase check)."""
    a, L = 50.0, 40.0
    cd = _wr90(L, a)
    m = mesh_structured(cd, (0, 0), (L, 0), (0, a), 1.0)

    sol1 = solve_driven(m, FemConfig(
        type="EZ", frequency=10e9, unit=1e-3, excited_port=1,
        excited_mode=1), num_modes=2)
    s1 = sol1.s_matrix
    assert abs(abs(s1[1, 0]) - 1.0) < 5e-3       # S21 mode1->mode1
    assert abs(s1[1, 1]) < 5e-3                  # no mode conversion
    assert abs(s1[0, 0]) < 5e-3 and abs(s1[0, 1]) < 5e-3

    sol2 = solve_driven(m, FemConfig(
        type="EZ", frequency=10e9, unit=1e-3, excited_port=1,
        excited_mode=2), num_modes=2)
    s2 = sol2.s_matrix
    assert abs(abs(s2[1, 1]) - 1.0) < 5e-3       # S21 mode2->mode2
    assert abs(s2[1, 0]) < 5e-3
    k0 = CFG.k0
    beta2 = np.sqrt(k0**2 - (2 * np.pi / a) ** 2)
    target = np.exp(-1j * beta2 * L)
    assert abs(np.angle(s2[1, 1] / target)) < 0.05


def test_lobpcg_50k_nodes_sparse_on_device():
    """The on-device eigen path at scale: >= 50k-node cavity mode solve
    through the SPARSE generalized LOBPCG (fem/sparse.lobpcg_generalized
    — O(nnz) memory, no densification; r2's dense-transform variant
    would need a ~20 GB dense factor here).  Gated against host ARPACK
    (the reference's solver, toolkit/eigensolvers.h:66-150)."""
    from eggshell_tpu.fem import Rectangle
    from eggshell_tpu.fem.helmholtz import solve_modes
    from eggshell_tpu.fem.mesher import mesh_structured

    cav = Rectangle(0, 0, 2.0, 1.0)
    m = mesh_structured(cav, (0, 0), (2.0, 0), (0, 1.0), 0.0062)
    assert m.num_points >= 50_000, m.num_points
    v_arpack, _ = solve_modes(m, num_modes=3, dirichlet=True)
    v_dev, _ = solve_modes(m, num_modes=3, dirichlet=True, use_lobpcg=True)
    np.testing.assert_allclose(v_dev, v_arpack, rtol=2e-2)


def test_lobpcg_neumann_free_modes():
    """dirichlet=False (Neumann/free modes): K is singular — its
    constant nullspace IS the lambda=0 mode — which made the r3 CG
    preconditioner's inner solve K W = R inconsistent (ADVICE r3: the
    null component of R can be amplified).  The shifted (K + sigma M)
    preconditioner must keep LOBPCG stable here, recovering lambda_0 ~ 0
    and the first nonzero Neumann eigenvalues of the rectangle
    (analytic: pi^2 (p/a)^2 + pi^2 (q/b)^2)."""
    from eggshell_tpu.fem import Rectangle
    from eggshell_tpu.fem.helmholtz import solve_modes
    from eggshell_tpu.fem.mesher import mesh_structured

    a, b = 2.0, 1.0
    cav = Rectangle(0, 0, a, b)
    m = mesh_structured(cav, (0, 0), (a, 0), (0, b), 0.05)
    v_dev, _ = solve_modes(m, num_modes=4, dirichlet=False,
                           use_lobpcg=True)
    analytic = sorted(
        (np.pi * p / a) ** 2 + (np.pi * q / b) ** 2
        for p in range(4) for q in range(4)
    )[:4]
    # constant mode at ~0, then the analytic Neumann ladder
    assert abs(v_dev[0]) < 1e-3 * analytic[1]
    np.testing.assert_allclose(v_dev[1:4], analytic[1:4], rtol=2e-2)


def test_shift_invert_modes_six_clustered_modes():
    """The round-5 mode-solver regression: 6 modes of a 2x1 rectangle
    include a near-degenerate cluster (modes 5/6) that the polynomial-
    preconditioned LOBPCG cannot separate (measured rel err ~1.3 on
    this mesh).  The BCR shift-invert subspace iteration
    (fem/sparse.shift_invert_modes, the on-device ARPACK analog —
    toolkit/eigensolvers.h:66-150) must hold all six to < 1% vs host
    ARPACK.  Gates the fem_modes bench config."""
    from eggshell_tpu.fem import Rectangle
    from eggshell_tpu.fem.helmholtz import solve_modes
    from eggshell_tpu.fem.mesher import mesh_shape

    cd = Rectangle(0.0, 0.0, 2.0, 1.0)
    mesh = mesh_shape(cd, 0.05, seed=0)
    va, _ = solve_modes(mesh, num_modes=6)
    vs, _ = solve_modes(mesh, num_modes=6, method="shift_invert")
    np.testing.assert_allclose(np.asarray(vs), np.asarray(va), rtol=1e-2)


def test_shift_invert_modes_neumann_free():
    """dirichlet=False: K is singular (constant nullspace = the
    lambda=0 mode), so factoring K itself would blow up along the null
    direction.  The auto NEGATIVE shift (factor K + s*M, s ~ 1e-3 of
    the spectral scale — the on-device analog of the host path's
    eigsh sigma=1e-6) keeps the BCR factorization SPD; Rayleigh
    quotients stay unshifted.  Recovers the analytic Neumann ladder of
    the rectangle."""
    from eggshell_tpu.fem import Rectangle
    from eggshell_tpu.fem.helmholtz import solve_modes
    from eggshell_tpu.fem.mesher import mesh_structured

    a, b = 2.0, 1.0
    m = mesh_structured(Rectangle(0, 0, a, b), (0, 0), (a, 0), (0, b), 0.05)
    v, _ = solve_modes(m, num_modes=4, dirichlet=False,
                       method="shift_invert")
    analytic = sorted(
        (np.pi * p / a) ** 2 + (np.pi * q / b) ** 2
        for p in range(4) for q in range(4)
    )[:4]
    assert abs(v[0]) < 1e-3 * analytic[1]
    np.testing.assert_allclose(np.asarray(v[1:4]), analytic[1:4], rtol=2e-2)
