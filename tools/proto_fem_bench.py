"""Prototype: FEM driven-solve perf on the live chip (round-5 scoping).

Times the WR-12 waveguide S-parameter solve at several mesh sizes on
three solve paths (dense MXU, host SuperLU, on-device BiCGStab) and
prints solves/s + cross-path |S21| parity.  Not part of the committed
bench yet — results shape the fem_driven config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:  # some shells carry JAX_PLATFORMS=axon without the plugin registered
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()
import jax.numpy as jnp
import numpy as np

from eggshell_tpu.fem.helmholtz import (
    FemConfig, _cdtype, make_driven_fn, solve_driven,
)
from eggshell_tpu.fem.mesher import mesh_structured
from eggshell_tpu.fem.shape import Rectangle


def guide_mesh(h, W=250.0, H=3.0988):
    cd = Rectangle(-W / 2, -H / 2, W / 2, H / 2)
    cd.Port((-W / 2, -H / 2), (-W / 2, H / 2), 1)
    cd.Port((W / 2, -H / 2), (W / 2, H / 2), 2)
    return mesh_structured(cd, (-W / 2, -H / 2), (W, 0), (0, H), h)


def time_solve(mesh, cfg, solver, reps=3):
    fn, plan = make_driven_fn(mesh, cfg, solver=solver)
    dtype = _cdtype()
    args = (
        jnp.asarray(mesh.points),
        jnp.asarray(mesh.epsilon, dtype),
        jnp.asarray(mesh.sigma_xx),
        jnp.asarray(mesh.sigma_yy),
        jnp.asarray(mesh.sigma_xy),
        jnp.asarray(mesh.excitation, dtype),
    )
    k0 = jnp.asarray(cfg.k0, jnp.float32)
    jfn = jax.jit(fn)
    u, s = jfn(*args, k0)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for _ in range(reps):
        u, s = jfn(*args, k0)
    jax.block_until_ready(u)
    dt = (time.perf_counter() - t0) / reps
    return dt, np.asarray(s)


def main():
    print("backend:", jax.default_backend())
    cfg = FemConfig(type="EZ", frequency=75e9, unit=1e-3, excited_port=1)
    for h, paths in (
        (0.4, ("sparse", "bcr")),
        (0.15, ("sparse", "bcr")),
        (0.12, ("sparse", "bcr")),
    ):
        m = guide_mesh(h)
        print(f"h={h}: N={m.num_points} tris={m.num_triangles}")
        s_ref = None
        for solver in paths:
            try:
                dt, s = time_solve(m, cfg, solver)
                s21 = abs(s[1, 0]) if s.shape[0] > 1 else float("nan")
                note = ""
                if s_ref is not None:
                    note = f" dS21={abs(s21 - s_ref):.2e}"
                else:
                    s_ref = s21
                print(f"  {solver:9s}: {dt*1e3:8.1f} ms  "
                      f"({1/dt:7.2f} solves/s)  |S21|={s21:.4f}{note}")
            except Exception as e:
                print(f"  {solver:9s}: FAILED {repr(e)[:200]}")


if __name__ == "__main__":
    main()
