"""Interactive simulation viewer — the eggshell_view run/step loop
(ref eggshell/eggshell_view.cc:497-554: GLViewer with a run toggle,
single-step, and a sim timer) on a matplotlib window.

Keyboard bindings (the reference's single-key scheme):
  space  toggle run/pause          (ref ToggleRunning :522-527)
  s      single step while paused  (ref single-step)
  r      reset to the initial state
  q      close

Works with any interactive matplotlib backend; under a headless Agg
backend the event loop degrades to programmatic `step_once()` /
`render_frame()` calls (which is also how the smoke test drives it) and
`run_headless()` writes an animation instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig
from eggshell_tpu.viz.scene_view import _box_faces


class InteractiveViewer:
    """Run/pause/step viewer for one scene."""

    def __init__(self, spec: SceneSpec, state: State, cfg: SimConfig,
                 steps_per_frame: int = 5, elev: float = 20,
                 azim: float = -60):
        self.spec = spec
        self.cfg = cfg
        self.initial_state = state
        self.state = state
        self.steps_per_frame = steps_per_frame
        self.running = False
        self.sim_steps = 0
        self._elev = elev
        self._azim = azim
        self._fig = None
        self._ax = None

        @jax.jit
        def _advance(st):
            def body(s, _):
                s2, _ = step_ode(spec, s, cfg)
                return s2, None

            return jax.lax.scan(body, st, None,
                                length=steps_per_frame)[0]

        self._advance = _advance

    # ---- simulation control (the reference's slots) ----
    def step_once(self) -> None:
        """Advance steps_per_frame sim steps (ref OnSimulationTimeout)."""
        self.state = self._advance(self.state)
        self.sim_steps += self.steps_per_frame

    def toggle_running(self) -> None:
        self.running = not self.running

    def reset(self) -> None:
        self.state = self.initial_state
        self.sim_steps = 0

    # ---- drawing ----
    def render_frame(self, ax=None):
        """Draw the current state into a 3D axes (creates one if None).
        Returns the axes."""
        import matplotlib.pyplot as plt
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        if ax is None:
            if self._fig is None:
                self._fig = plt.figure(figsize=(7, 6))
                self._ax = self._fig.add_subplot(111, projection="3d")
            ax = self._ax
        ax.clear()
        p = np.asarray(self.state.p)
        R = np.asarray(self.state.R())
        h = np.asarray(self.spec.half_extents)
        lim = max(1.0, float(np.abs(p).max()) + float(h.max()))
        for i in range(self.spec.num_bodies):
            faces = _box_faces(p[i], R[i], h[i])
            col = Poly3DCollection(faces, alpha=0.8, linewidths=0.5,
                                   edgecolors="k")
            static = float(self.spec.inv_mass[i]) == 0.0
            col.set_facecolor("#b0b0b0" if static else "#4c8ed9")
            ax.add_collection3d(col)
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(0, 2 * lim)
        ax.view_init(elev=self._elev, azim=self._azim)
        ax.set_title(
            f"t = {self.sim_steps * self.cfg.dt:.3f} s  "
            f"[{'running' if self.running else 'paused'}]  "
            "space=run/pause  s=step  r=reset  q=quit"
        )
        return ax

    # ---- event loop ----
    def _on_key(self, event) -> None:
        import matplotlib.pyplot as plt

        if event.key == " ":
            self.toggle_running()
        elif event.key == "s" and not self.running:
            self.step_once()
        elif event.key == "r":
            self.reset()
        elif event.key == "q":
            plt.close(self._fig)
            return
        self.render_frame()
        self._fig.canvas.draw_idle()

    def show(self, frame_ms: int = 30) -> None:
        """Open the interactive window and run the timer loop (requires
        an interactive matplotlib backend; use run_headless otherwise)."""
        import matplotlib
        import matplotlib.pyplot as plt

        if matplotlib.get_backend().lower().startswith("agg"):
            raise RuntimeError(
                "no interactive matplotlib backend; use run_headless()"
            )
        self.render_frame()
        self._fig.canvas.mpl_connect("key_press_event", self._on_key)
        timer = self._fig.canvas.new_timer(interval=frame_ms)

        def tick():
            if self.running:
                self.step_once()
                self.render_frame()
                self._fig.canvas.draw_idle()

        timer.add_callback(tick)
        timer.start()
        plt.show()

    def run_headless(self, path: str, frames: int = 60,
                     fps: int = 20) -> None:
        """Headless fallback: advance and record `frames` frames to an
        animated GIF at `path`."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.animation as anim
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(111, projection="3d")

        def update(_):
            self.step_once()
            self.render_frame(ax)
            return []

        a = anim.FuncAnimation(fig, update, frames=frames, blit=False)
        a.save(path, writer=anim.PillowWriter(fps=fps))
        plt.close(fig)
