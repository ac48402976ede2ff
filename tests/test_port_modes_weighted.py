"""Weighted numerical port modes: dielectric-loaded EXY ports and
anisotropic-sigma EZ ports get TRUE transverse eigenmodes (the weighted
1D generalized problem, fem/ports.transverse_modes(w_stiff, w_beta)) —
closing the reference's gap where WaveguideModeFEMProblem
(rama/solver.cc:251) is intended but EXY/anisotropic ports silently fall
back to closed-form cos/sin modes (rama/solver.cc:175-177)."""

import numpy as np
import pytest

from eggshell_tpu.fem import Rectangle
from eggshell_tpu.fem.helmholtz import (
    FemConfig,
    make_driven_fn,
    solve_driven,
)
from eggshell_tpu.fem.mesher import mesh_structured


CFG_EXY = FemConfig(type="EXY", frequency=10e9, unit=1e-3, excited_port=1)


def _loaded_guide(type_, a=22.86, L=40.0, eps2=4.0, h=0.7):
    cd = Rectangle(0, 0, L, a)
    cd.Port((0, 0), (0, a), 1).Port((L, 0), (L, a), 2)
    cd.Paint(Rectangle(-1, -1, L + 1, a / 2), epsilon=eps2)
    return mesh_structured(cd, (0, 0), (L, 0), (0, a), h,
                           material_split=0.5)


def test_exy_loaded_port_uses_numerical_modes():
    """Half-filled EXY guide: the plan now solves the weighted transverse
    problem instead of falling back to cos modes."""
    m = _loaded_guide("EXY")
    _, plan = make_driven_fn(m, CFG_EXY)
    assert all(not pp.analytic for pp in plan.ports)
    assert all(pp.wn_profile is not None for pp in plan.ports)


def test_exy_loaded_port_numerical_modes_conserve_power():
    """Uniform cross-section loaded EXY guide: the true mode transmits
    cleanly (|S11| small, |S21| ~ 1); the closed-form cos mode is
    measurably wrong (spurious reflection + power error)."""
    m = _loaded_guide("EXY")
    sol_num = solve_driven(m, CFG_EXY, numerical_modes="auto")
    sol_ana = solve_driven(m, CFG_EXY, numerical_modes="never")

    assert abs(sol_num.s_params[1]) < 0.02, sol_num.s_params
    assert abs(abs(sol_num.s_params[2]) - 1.0) < 0.02, sol_num.s_params
    p_num = sol_num.port_power[1] + sol_num.port_power[2]
    assert abs(p_num - 1.0) < 0.05, p_num

    # the closed-form mode mismatches the loaded guide's true mode
    assert abs(sol_ana.s_params[1]) > 0.05, sol_ana.s_params


def test_anisotropic_ez_numerical_modes_match_analytic():
    """Uniform anisotropic sigma: the analytic branch already handles
    scalar W_t/W_n, so FORCING the numerical solver must reproduce it —
    pins the weighted eigenproblem + weighted Robin/flux terms to the
    known-good closed form."""
    a, L = 22.86, 30.0
    cd = Rectangle(0, 0, L, a)
    cd.Port((0, 0), (0, a), 1).Port((L, 0), (L, a), 2)
    cd.Paint(Rectangle(-1, -1, L + 1, a + 1), epsilon=1.0,
             sigma_xx=1.7, sigma_yy=0.6)
    m = mesh_structured(cd, (0, 0), (L, 0), (0, a), 1.0)
    cfg = FemConfig(type="EZ", frequency=10e9, unit=1e-3, excited_port=1)
    sol_num = solve_driven(m, cfg, numerical_modes="always")
    sol_ana = solve_driven(m, cfg, numerical_modes="never")
    assert abs(sol_num.s_params[1] - sol_ana.s_params[1]) < 5e-3
    assert abs(sol_num.s_params[2] - sol_ana.s_params[2]) < 5e-3
