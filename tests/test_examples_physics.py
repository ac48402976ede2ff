"""Physics-gated execution of the dynamics/control/FDTD example scripts
(the rama example set is gated by tests/test_examples_rama.py; these
close the gap for BASELINE config #5 and friends — each example's
OUTCOME is asserted, not just that it runs)."""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load(name):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", f"{name}.py"
    )
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_living_room_mpc_cost_improves(tmp_path):
    """BASELINE config #5: the living-room MPPI manipulation loop must
    IMPROVE the task cost (>= 30% over 12 control steps, fixed seed) —
    the pass/fail the bench number is meaningless without."""
    mod = _load("living_room_mpc")
    c0, c1 = mod.main(num_samples=64, steps=12)
    assert np.isfinite(c0) and np.isfinite(c1)
    assert c1 < 0.7 * c0, (
        f"living-room MPPI failed to improve cost: {c0:.3f} -> {c1:.3f}"
    )


def test_push_mpc_reaches_toward_target(tmp_path):
    """The push-to-target loop must move the box at least 60% of the way
    to x=0.25 from x=0 (fixed seed, reduced sample budget)."""
    mod = _load("push_mpc")
    xs = mod.main(str(tmp_path), control_steps=30, num_samples=64,
                  horizon=25)
    assert (tmp_path / "push_mpc.png").exists()
    assert xs[-1] > 0.15, f"box only reached x={xs[-1]:.3f} (target 0.25)"


def test_chain_swing_renders_and_conserves(tmp_path):
    """The chain swings (anchored pendulum), stays finite, and the links
    stay joined: max joint gap well under a link length."""
    mod = _load("chain_swing")
    final, traj = mod.main(str(tmp_path), steps=200)
    assert (tmp_path / "chain_swing.gif").exists()
    p = np.asarray(traj.p)  # (T, n, 3)
    assert np.isfinite(p).all()
    # links remain chained: neighbor distance stays near sqrt(3)*0.3
    d = np.linalg.norm(p[:, 1:] - p[:, :-1], axis=-1)
    assert d.max() < 0.75, f"chain broke apart: max link gap {d.max():.3f}"
    # it actually swings (anchor joint torque-free drop)
    assert np.abs(p[-1] - p[0]).max() > 0.05


def test_fdtd_aperture_diffracts_and_blocks(tmp_path):
    """Energy passes THROUGH the aperture (diffraction) while the PEC
    wall blocks the rest: deep-shadow field << aperture-beam field."""
    mod = _load("fdtd_aperture")
    leak, ez = mod.main(str(tmp_path), n=96)
    assert (tmp_path / "fdtd_aperture.png").exists()
    n = ez.shape[0]
    assert np.isfinite(ez).all()
    assert leak > 1e-3, "nothing diffracted through the aperture"
    # Deep shadow (behind the wall, far off the aperture axis) vs beam
    # (behind the wall, on axis).
    beam = np.abs(ez[n // 2 - 8: n // 2 + 8, n // 2 + 4:]).max()
    shadow = max(
        np.abs(ez[: n // 6, n // 2 + 4:]).max(),
        np.abs(ez[-n // 6:, n // 2 + 4:]).max(),
    )
    assert shadow < 0.5 * beam, (
        f"PEC wall not shadowing: shadow={shadow:.2e} beam={beam:.2e}"
    )
