"""Visualization + model-API tests."""

import os

import numpy as np
import pytest

from eggshell_tpu.viz import Figure, colormap, draw_field, draw_mesh, draw_scene
from eggshell_tpu.models import Model, Parameter


def test_colormaps():
    for name in ("jet", "hot", "gray", "hsv"):
        cm = colormap(name, 64)
        assert cm.shape == (64, 3)
        assert cm.min() >= 0 and cm.max() <= 1
    with pytest.raises(ValueError):
        colormap("nope")


def test_figure_saves(tmp_path):
    p = str(tmp_path / "fig.png")
    Figure().plot([0, 1, 2], [1, 0, 2]).xlabel("x").title("t").grid().save(p)
    assert os.path.getsize(p) > 1000


def test_draw_scene(tmp_path):
    from eggshell_tpu.physics import scenes

    spec, state = scenes.box_stack(3)
    p = draw_scene(spec, state, str(tmp_path / "scene.png"), title="stack")
    assert os.path.getsize(p) > 5000


def test_draw_mesh_and_field(tmp_path):
    from eggshell_tpu.fem import Rectangle, mesh_shape

    wg = Rectangle(0, 0, 1.0, 1.0)
    wg.Port((0, 0), (0, 1), 1)
    m = mesh_shape(wg, 0.15)
    p1 = draw_mesh(m, str(tmp_path / "mesh.png"))
    f = np.sin(m.points[:, 0] * np.pi)
    p2 = draw_field(m, f, str(tmp_path / "field.png"))
    assert os.path.getsize(p1) > 3000 and os.path.getsize(p2) > 3000


def test_model_sweep_and_optimize():
    """Analytic model: output (x-1)^2 + (y+2)^2; sweep + optimize find
    the minimum (lua_model_viewer Sweep/Optimize analog)."""
    calls = []

    def builder(params):
        calls.append(dict(params))
        return params

    def output(sol):
        return (sol["x"] - 1.0) ** 2 + (sol["y"] + 2.0) ** 2

    m = Model(
        builder,
        [Parameter("x", -5, 5, 0.0), Parameter("y", -5, 5, 0.0)],
        output=output,
    )
    vals = m.sweep("x", [0.0, 0.5, 1.0, 1.5])
    assert np.argmin(vals) == 2  # x = 1 minimises with y at default 0

    best, fval = m.optimize("nelder_mead")
    assert abs(best["x"] - 1.0) < 1e-3 and abs(best["y"] + 2.0) < 1e-3
    assert fval < 1e-6

    # caching: running the same params twice must not rebuild
    n0 = len(calls)
    m.run({"x": 1.0, "y": 1.0})
    m.run({"x": 1.0, "y": 1.0})
    assert len(calls) == n0 + 1

    # bounds clipping
    out = m.run({"x": 99.0, "y": 0.0})
    assert out["x"] == 5.0


def test_model_random_search():
    def output(sol):
        return abs(sol["a"] - 0.25)

    m = Model(lambda p: p, [Parameter("a", 0, 1)], output=output)
    best, fval = m.optimize("random_search", num_samples=500)
    assert fval < 0.02


def test_interactive_viewer_step_loop(tmp_path):
    """The eggshell_view run/step-loop analog (ref eggshell_view.cc:
    497-554): programmatic step/run/reset controls advance the sim and
    render frames headlessly."""
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from eggshell_tpu.physics import scenes
    from eggshell_tpu.utils.config import SimConfig, SolverKind
    from eggshell_tpu.viz import InteractiveViewer

    cfg = SimConfig(solver=SolverKind.PGS, solver_iters=30,
                    conditional_cfm=False, cfm_always=0.01,
                    contact_capacity=16)
    spec, state = scenes.box_drop(height=0.5)
    v = InteractiveViewer(spec, state, cfg, steps_per_frame=10)

    z0 = float(v.state.p[0, 2])
    v.step_once()
    v.step_once()
    assert v.sim_steps == 20
    assert float(v.state.p[0, 2]) < z0          # the box is falling
    assert not v.running
    v.toggle_running()
    assert v.running
    ax = v.render_frame()
    assert ax is not None
    v.reset()
    assert v.sim_steps == 0
    assert float(v.state.p[0, 2]) == z0
    # headless event-loop fallback records an animation
    out = str(tmp_path / "run.gif")
    v.run_headless(out, frames=3, fps=5)
    import os

    assert os.path.getsize(out) > 1000
