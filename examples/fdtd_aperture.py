"""FDTD: a pulse diffracting through an aperture in a PEC wall.

Usage: python examples/fdtd_aperture.py [out_dir]
"""

import sys

import jax.numpy as jnp
import numpy as np

from eggshell_tpu.fem import fdtd
from eggshell_tpu.viz import Figure


def main(out_dir=".", n: int = 160):
    n = int(n)
    dx = 1.0 / (n - 1)
    dt = float(fdtd.courant_dt(dx, 2, 0.7))
    pec = np.zeros((n, n), bool)
    pec[:, n // 2] = True
    pec[n // 2 - 8 : n // 2 + 8, n // 2] = False
    f = fdtd.init_2d(n, n, jnp.float32)

    t0, sig = 40 * dt, 12 * dt

    def src(t):
        return jnp.exp(-((t - t0) ** 2) / (2 * sig**2))

    steps = int(n * 260 / 160)
    fin, _ = fdtd.simulate_2d(
        f, steps, dt, dx, pec=jnp.asarray(pec),
        source_ij=(n // 2, n // 5), source_fn=src,
    )
    ez = np.asarray(fin.ez)
    print(f"field max {np.abs(ez).max():.3e}; "
          f"leaked beyond wall: {np.abs(ez[:, n//2+4:]).max():.3e}")
    leak = float(np.abs(ez[:, n//2+4:]).max()) / float(np.abs(ez).max())
    Figure(figsize=(6, 6)).imshow(ez.T, cmap="RdBu").title(
        "Ez after aperture diffraction"
    ).save(f"{out_dir}/fdtd_aperture.png")
    print(f"wrote {out_dir}/fdtd_aperture.png")
    return leak, ez


if __name__ == "__main__":
    main(*sys.argv[1:])
