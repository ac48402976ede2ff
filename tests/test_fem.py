"""FEM tier tests — the analog of rama's script tests
(rama/tests/test_s11.lua: S-parameters vs a transmission-line analytic
model within 0.01-0.02; cavity/Schrodinger eigenvalues vs closed forms).
"""

import numpy as np
import pytest

import jax

from eggshell_tpu.fem import Circle, Rectangle, mesh_shape
from eggshell_tpu.fem.helmholtz import (
    FemConfig,
    port_beta,
    solve_driven,
    solve_modes,
)

C0 = 299792458.0


def freq_for_k(k0):
    return k0 * C0 / (2 * np.pi)


@pytest.fixture(scope="module")
def waveguide_mesh():
    wg = Rectangle(0, 0, 2.0, 1.0)
    wg.Port((0, 0), (0, 1), 1).Port((2.0, 0), (2.0, 1), 2)
    return mesh_shape(wg, 0.06, seed=0)


def test_empty_waveguide_s_params(waveguide_mesh):
    """Matched uniform guide: no reflection, unit transmission with
    phase -beta L (ref rama/tests/test_s11.lua:17-33 tolerances)."""
    k0 = 4.5
    cfg = FemConfig(type="EZ", frequency=freq_for_k(k0), excited_port=1)
    sol = solve_driven(waveguide_mesh, cfg)
    beta = float(np.real(np.asarray(port_beta(k0**2, 1.0))))
    s11 = sol.s_params[1]
    s21 = sol.s_params[2]
    assert abs(s11) < 0.03, s11
    assert abs(abs(s21) - 1.0) < 0.03, s21
    want_phase = (-beta * 2.0) % (2 * np.pi)
    got_phase = np.angle(s21) % (2 * np.pi)
    dphi = min(abs(got_phase - want_phase), 2 * np.pi - abs(got_phase - want_phase))
    assert dphi < 0.15, (got_phase, want_phase)
    # power conservation (lossless): |S11|^2 + |S21|^2 ~ 1
    assert abs(sol.port_power[1] + sol.port_power[2] - 1.0) < 0.05


def test_dielectric_slab_matches_transmission_line():
    """eps=4 slab in the guide: |S11| within 0.02 of the two-interface
    transmission-line model (the test_s11.lua methodology)."""
    eps2 = 4.0
    d = 0.35
    wg = Rectangle(0, 0, 2.0, 1.0)
    wg.Port((0, 0), (0, 1), 1).Port((2.0, 0), (2.0, 1), 2)
    wg.Paint(Rectangle(0.9, 0, 0.9 + d, 1.0), epsilon=eps2)
    mesh = mesh_shape(wg, 0.035, seed=0)
    k0 = 4.5
    cfg = FemConfig(type="EZ", frequency=freq_for_k(k0), excited_port=1)
    sol = solve_driven(mesh, cfg)

    b1 = complex(np.asarray(port_beta(k0**2, 1.0)))
    b2 = complex(np.asarray(port_beta(eps2 * k0**2, 1.0)))
    r12 = (b1 - b2) / (b1 + b2)
    ph = np.exp(-2j * b2 * d)
    r_tot = r12 * (1 - ph) / (1 - r12**2 * ph)
    assert abs(abs(sol.s_params[1]) - abs(r_tot)) < 0.02, (
        sol.s_params[1], r_tot
    )
    # lossless: power conserved
    assert abs(sol.port_power[1] + sol.port_power[2] - 1.0) < 0.05


def test_cavity_eigenvalues():
    """2x1 Dirichlet cavity: lambda = pi^2 (m^2/4 + n^2)
    (ARPACK shift-invert path, toolkit/eigensolvers.h analog)."""
    cav = Rectangle(0, 0, 2.0, 1.0)
    mesh = mesh_shape(cav, 0.07, seed=0)
    vals, vecs = solve_modes(mesh, num_modes=4, dirichlet=True)
    want = np.sort(
        [np.pi**2 * (m**2 / 4 + n**2) for m in range(1, 4) for n in range(1, 3)]
    )[:4]
    np.testing.assert_allclose(vals, want, rtol=0.03)


def test_modes_lobpcg_matches_arpack():
    cav = Rectangle(0, 0, 1.0, 1.0)
    mesh = mesh_shape(cav, 0.1, seed=0)
    v1, _ = solve_modes(mesh, num_modes=3, dirichlet=True)
    v2, _ = solve_modes(mesh, num_modes=3, dirichlet=True, use_lobpcg=True)
    np.testing.assert_allclose(v1, v2, rtol=0.02)


def test_schrodinger_constant_potential_shift():
    """-grad^2 psi + V psi: constant V shifts all eigenvalues by V."""
    box = Rectangle(0, 0, 1.0, 1.0)
    mesh = mesh_shape(box, 0.1, seed=0)
    v0, _ = solve_modes(mesh, num_modes=3, dirichlet=True)
    V = np.full(mesh.num_triangles, 7.0)
    v1, _ = solve_modes(mesh, num_modes=3, dirichlet=True, potential=V)
    np.testing.assert_allclose(v1, v0 + 7.0, rtol=1e-3, atol=0.05)


def test_geometry_jvp_derivative():
    """Forward-mode derivative of the FEM energy wrt a smooth mesh
    stretch — the jet-derivative capability (rama/my_jet.h analog)."""
    import jax.numpy as jnp
    from eggshell_tpu.fem.helmholtz import assemble_matrices

    box = Rectangle(0, 0, 1.0, 1.0)
    mesh = mesh_shape(box, 0.15, seed=0)
    tri = jnp.asarray(mesh.triangles)
    base = jnp.asarray(mesh.points)
    eps = jnp.ones(mesh.num_triangles)

    def total_stiffness_trace(scale):
        pts = base * jnp.stack([scale, jnp.ones_like(scale)])
        K, M = assemble_matrices(pts, tri, eps)
        return jnp.trace(K)

    val, dval = jax.jvp(
        total_stiffness_trace, (jnp.asarray(1.0),), (jnp.asarray(1.0),)
    )
    # finite-difference check
    h = 1e-4
    fd = (
        float(total_stiffness_trace(jnp.asarray(1.0 + h)))
        - float(total_stiffness_trace(jnp.asarray(1.0 - h)))
    ) / (2 * h)
    np.testing.assert_allclose(float(dval), fd, rtol=1e-3)


def test_abc_absorbs():
    """A radiating line with an ABC wall: most power leaves (no standing
    blow-up) — smoke-level check of the absorbing boundary."""
    box = Rectangle(0, 0, 1.0, 1.0)
    box.Port((0, 0), (0, 1), 1)
    box.ABC((1.0, 0), (1.0, 1))
    mesh = mesh_shape(box, 0.07, seed=0)
    k0 = 4.5
    sol = solve_driven(
        mesh, FemConfig(type="EZ", frequency=freq_for_k(k0), excited_port=1)
    )
    # reflection at the ABC should be modest
    assert abs(sol.s_params[1]) < 0.35
    assert np.isfinite(np.asarray(sol.field)).all()


def test_antenna_pattern_isotropic_monopole():
    """Center line-source in a circular ABC domain radiates isotropically:
    directivity ~ 1 and phase center ~ the source location
    (rama antenna-pattern capability, solver.h:208-224)."""
    from eggshell_tpu.fem.antenna import antenna_pattern, directivity, phase_center

    dom = Circle(0, 0, 1.0)
    # paint the whole rim as ABC with four segments (chords catch all edges
    # within tol of the circle via generous tolerance)
    import numpy as _np

    th = _np.linspace(0, 2 * _np.pi, 65)
    for a, b in zip(th[:-1], th[1:]):
        dom.ABC((float(_np.cos(a)), float(_np.sin(a))),
                (float(_np.cos(b)), float(_np.sin(b))), tol=0.05)
    mesh = mesh_shape(dom, 0.08, seed=0)
    assert (mesh.edge_kind == 2).sum() > 30

    k0 = 6.0
    sol = solve_driven(
        mesh, FemConfig(type="EXY", frequency=freq_for_k(k0)),
        point_source=(0.0, 0.0),
    )
    angles = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    pat = antenna_pattern(mesh, np.asarray(sol.field), k0, angles)
    D = directivity(pat)
    assert D < 1.6, D
    mag = np.abs(pat)
    assert mag.max() / mag.min() < 1.8

    cx, cy = phase_center(mesh, np.asarray(sol.field), k0, angles,
                          search_radius=0.4, grid=9)
    assert abs(cx) < 0.15 and abs(cy) < 0.15, (cx, cy)


def test_antenna_pattern_boresight_and_aperture_scaling():
    """Kirchhoff pattern regression (the sign of du/dn in the Green's
    identity inverts the pattern if wrong): an open-ended waveguide
    radiates a boresight-peaked beam, and a wider (horn) aperture gives
    a narrower beam / higher directivity (ref ComputeAntennaPattern,
    rama/solver.h:208-224)."""
    import numpy as np

    from eggshell_tpu.fem.antenna import antenna_pattern, directivity
    from eggshell_tpu.fem.helmholtz import FemConfig, solve_driven
    from eggshell_tpu.fem.mesher import mesh_shape
    from eggshell_tpu.fem.shape import Polygon, Rectangle

    a = 22.86
    cfg = FemConfig(type="EZ", frequency=10e9, unit=1e-3, excited_port=1)
    angles = np.radians(np.linspace(-90, 90, 181))

    def pattern_of(cd, h=1.4):
        mesh = mesh_shape(cd, h)
        sol = solve_driven(mesh, cfg)
        assert abs(sol.s_params[1]) < 0.35       # reasonably matched feed
        return antenna_pattern(mesh, np.asarray(sol.field), cfg.k0, angles)

    # open-ended guide
    feed = Rectangle(-25, -a / 2, 0, a / 2)
    free = Rectangle(0, -55, 60, 55)
    cd = feed + free
    cd.Port((-25, -a / 2), (-25, a / 2), 1)
    cd.ABC((0, -55), (60, -55)).ABC((60, -55), (60, 55)).ABC((0, 55), (60, 55))
    pat_open = pattern_of(cd)
    p2 = np.abs(pat_open) ** 2
    peak_deg = np.degrees(angles[int(np.argmax(p2))])
    assert abs(peak_deg) < 6.0, peak_deg        # boresight beam
    assert 10 * np.log10(p2[30] / p2.max()) < -6     # -60 deg well down
    assert 10 * np.log10(p2[150] / p2.max()) < -6    # +60 deg well down

    # horn: wider aperture -> higher directivity, narrower beam
    horn = Polygon([(0.0, -a / 2), (25.0, -30.0), (25.0, 30.0), (0.0, a / 2)])
    free2 = Rectangle(25, -60, 75, 60)
    cdh = feed + horn + free2
    cdh.Port((-25, -a / 2), (-25, a / 2), 1)
    cdh.ABC((25, -60), (75, -60)).ABC((75, -60), (75, 60)).ABC((25, 60), (75, 60))
    pat_horn = pattern_of(cdh)
    assert directivity(pat_horn) > 1.3 * directivity(pat_open)
    ph2 = np.abs(pat_horn) ** 2
    assert abs(np.degrees(angles[int(np.argmax(ph2))])) < 6.0
