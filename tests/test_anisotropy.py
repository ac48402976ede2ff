"""Anisotropic material validation — the reference's
rama/tests/test_anisotropy.lua ported property-for-property (12 cases:
angles {0, 30, 60, 90} x materials {eps=sig=1, eps=2, sigma_eps=2}).

A rectangular Exy guide (500 x 122 mil at 70 GHz) rotated by `angle`,
painted with the anisotropy tensor
    sxx = (1/se - 1) c^2 + 1
    syy = (1 - 1/se) c^2 + 1/se
    sxy = (1/se - 1) c s
(the world-frame rotation of diag(1/se, 1)).  Gates:

* ports are matched and power-conserving: |S11|^2 < 1e-5,
  ||S21|^2 - 1| < 1e-5 (the reference's exact asserts) — this exercises
  the flux-consistent anisotropic port matching (the reference's
  sqrt(n^T sigma n) Robin scale, toolkit/femsolver.h:622-638);
* the S21 phase is invariant under rotation (the sxy cross-term
  assembly is a correct tensor transform);
* painting eps=2 and painting sigma=1/2 agree (the reference's
  "simulate a dielectric by sigma=1/eps" equivalence) within its 0.3
  deg spread;
* the phase converges to the analytic continuum value under mesh
  refinement.  (The reference's hardcoded 13.1/-67.75 deg are its OWN
  h=5 dispersion-biased values — the continuum values are +12.46 and
  -69.7 deg — so we gate against physics + proximity, not its biased
  constants verbatim.)
"""

import math

import numpy as np
import pytest

from eggshell_tpu.fem.helmholtz import FemConfig, solve_driven
from eggshell_tpu.fem.mesher import mesh_structured
from eggshell_tpu.fem.shape import Shape, _RectSDF

L, H = 500.0, 122.0          # mils (ref test_anisotropy.lua:91-92)
UNIT = 2.54e-5               # meters per mil
CFG = FemConfig(type="EXY", frequency=70e9, unit=UNIT, excited_port=1)


def _run(angle_deg, eps, sig_eps, h=4.0):
    ang = math.radians(angle_deg)
    c, s = math.cos(ang), math.sin(ang)

    def rot(pt):
        return (c * pt[0] - s * pt[1], s * pt[0] + c * pt[1])

    cd = Shape(_RectSDF(0, 0, L, H))
    cd.Port(rot((0, 0)), rot((0, H)), 1)
    cd.Port(rot((L, 0)), rot((L, H)), 2)
    sxx = (1 / sig_eps - 1) * c**2 + 1
    syy = (1 - 1 / sig_eps) * c**2 + 1 / sig_eps
    sxy = (1 / sig_eps - 1) * c * s
    big = Shape(_RectSDF(-1e4, -1e4, 1e4, 1e4))
    cd.Paint(big, epsilon=eps, sigma_xx=sxx, sigma_yy=syy, sigma_xy=sxy)
    m = mesh_structured(cd, (0, 0), (c * L, s * L), (-s * H, c * H), h)
    return solve_driven(m, CFG)


def _phase_deg(sol):
    return float(np.degrees(np.angle(sol.s_params[2])))


ANGLES = [0, 30, 60, 90]
MATERIALS = [("base", 1, 1), ("eps2", 2, 1), ("sig2", 1, 2)]


@pytest.fixture(scope="module")
def solutions():
    return {
        (ang, tag): _run(ang, eps, se)
        for ang in ANGLES
        for tag, eps, se in MATERIALS
    }


@pytest.mark.parametrize("ang", ANGLES)
@pytest.mark.parametrize("tag", [m[0] for m in MATERIALS])
def test_matched_and_power_conserving(solutions, ang, tag):
    """ref asserts: port_power[1] < 1e-5, |port_power[2] - 1| < 1e-5."""
    sol = solutions[(ang, tag)]
    assert abs(sol.s_params[1]) ** 2 < 1e-5
    assert abs(abs(sol.s_params[2]) ** 2 - 1.0) < 1e-5


@pytest.mark.parametrize("tag", [m[0] for m in MATERIALS])
def test_rotation_invariance(solutions, tag):
    """S21 phase identical for all rotations of the guide+tensor
    (ref tolerance 0.1 deg for the base case)."""
    phases = [_phase_deg(solutions[(ang, tag)]) for ang in ANGLES]
    assert max(phases) - min(phases) < 0.1, (tag, phases)


def test_eps_equals_inverse_sigma(solutions):
    """Painting eps=2 == painting sigma=1/2 (the reference's equivalence
    check; its own two values agree within 0.3 deg)."""
    for ang in ANGLES:
        p_eps = _phase_deg(solutions[(ang, "eps2")])
        p_sig = _phase_deg(solutions[(ang, "sig2")])
        assert abs(p_eps - p_sig) < 0.3, (ang, p_eps, p_sig)


def test_phase_near_reference_value(solutions):
    """At the reference's mesh edge (h=5 mil) the computed phases sit
    near its recorded h=5 values (+13.1 / -67.75 deg) — within the
    discretization-layout spread between the two meshers."""
    assert abs(_phase_deg(solutions[(0, "base")]) - 13.1) < 1.0
    assert abs(_phase_deg(solutions[(0, "eps2")]) + 67.75) < 2.0
    assert abs(_phase_deg(solutions[(0, "sig2")]) + 67.75) < 2.0


def test_phase_converges_to_analytic():
    """Under refinement the base-case phase approaches the continuum
    value -k0 L mod 360 = +12.46 deg (and the reference's 13.1 is the
    same quantity biased by ITS h=5 dispersion)."""
    k0 = CFG.k0
    analytic = (np.degrees(-k0 * L) + 360 * 1000) % 360
    analytic = analytic - 360 if analytic > 180 else analytic
    errs = []
    for h in [4.0, 2.0]:
        p = _phase_deg(_run(0, 1, 1, h=h))
        errs.append(abs(p - analytic))
    assert errs[1] < errs[0] / 2.5, (errs, analytic)   # ~O(h^2)
    assert errs[1] < 0.4
