"""Physics gates for the rama example models (the reference ships these
as Lua example scripts with config.test assertions; here each example
module exposes solve()/build() and the gates live in pytest —
rama/examples/waveguide_bend.lua, wire_polarizer.lua,
waveguide_modes.lua, waveguide_transition_Ez.lua).
"""

import importlib.util
import os

import numpy as np
import pytest


def _load(name):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(root, "examples", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_waveguide_bend_reflection_vs_radius():
    """A gentler 90-degree bend reflects less; power is conserved
    (rama/examples/waveguide_bend.lua physics)."""
    wb = _load("waveguide_bend")
    _, (r_sharp, t_sharp) = wb.solve(70.0)
    _, (r_gentle, t_gentle) = wb.solve(220.0)
    assert abs(r_sharp) > 3 * abs(r_gentle), (abs(r_sharp), abs(r_gentle))
    assert abs(r_gentle) < 0.01
    for r, t in ((r_sharp, t_sharp), (r_gentle, t_gentle)):
        assert abs(abs(r) ** 2 + abs(t) ** 2 - 1.0) < 0.03


def test_wire_polarizer():
    """E parallel to the wires (Ez) mirrors; E perpendicular (Exy)
    passes (rama/examples/wire_polarizer.lua physics)."""
    wp = _load("wire_polarizer")
    mesh = wp.build(h=0.12)
    _, (r_ez, t_ez) = wp.solve("EZ", mesh=mesh)
    _, (r_exy, t_exy) = wp.solve("EXY", mesh=mesh)
    assert abs(t_ez) < 0.25, abs(t_ez)
    assert abs(r_ez) > 0.95, abs(r_ez)
    assert abs(t_exy) > 0.95, abs(t_exy)
    assert abs(r_exy) < 0.25, abs(r_exy)


def test_waveguide_mode_cutoffs_vs_analytic():
    """TE/TM cutoff wavenumbers of rectangular and circular guides match
    the analytic values within 1% (rama/examples/waveguide_modes.lua +
    the TE/TM ScriptConfig types, rama/solver.h:49-50)."""
    wm = _load("waveguide_modes")
    a, K = 122.0, 0.5
    (_, kc_te), (_, kc_tm) = wm.rectangular(a, K, h=4.0)
    np.testing.assert_allclose(kc_te[0], np.pi / a, rtol=0.01)
    np.testing.assert_allclose(
        kc_tm[0], np.pi * np.hypot(1 / a, 1 / (K * a)), rtol=0.01
    )
    # TE20 and TE01 are degenerate for aspect 0.5 (kc = 2pi/a = pi/b)
    np.testing.assert_allclose(kc_te[1], 2 * np.pi / a, rtol=0.01)
    np.testing.assert_allclose(kc_te[2], 2 * np.pi / a, rtol=0.01)

    (_, ckc_te), (_, ckc_tm) = wm.circular(61.0, h=4.0)
    np.testing.assert_allclose(ckc_te[0], 1.84118 / 61.0, rtol=0.01)
    np.testing.assert_allclose(ckc_tm[0], 2.40483 / 61.0, rtol=0.01)


def test_waveguide_transition():
    """Width transitions: identity for equal widths, reflective when
    abrupt, total reflection below cutoff — with a UNITARY power-wave
    S-matrix even though the port widths differ
    (rama/examples/waveguide_transition_Ez.lua physics)."""
    wt = _load("waveguide_transition")
    wc = wt.cutoff_width_mil()
    assert 70.0 < wc < 122.0   # the test frequencies straddle cutoff

    _, (r0, t0) = wt.solve(122.0, 122.0, 50.0, h=6.0)
    assert abs(r0) < 0.02 and abs(t0) > 0.99

    _, (r_cut, t_cut) = wt.solve(122.0, 70.0, 50.0, h=6.0)
    assert abs(r_cut) > 0.98 and abs(t_cut) < 0.05

    _, (r_ab, t_ab) = wt.solve(122.0, 200.0, 5.0, h=6.0)
    _, (r_tp, t_tp) = wt.solve(122.0, 200.0, 300.0, h=6.0)
    assert abs(r_ab) > 3 * abs(r_tp), (abs(r_ab), abs(r_tp))
    for r, t in ((r_ab, t_ab), (r_tp, t_tp)):
        assert abs(abs(r) ** 2 + abs(t) ** 2 - 1.0) < 0.01
