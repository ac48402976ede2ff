"""Prototype: FDTD cell-steps/s on the live chip vs the HBM roofline.

2D: XLA stencil vs the fused Pallas kernel at 1024^2 and 2048^2.
3D: XLA roll-based Yee (+ CPML) at 128^3 / 192^3; roofline estimate
from the per-step field traffic.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
    jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/eggshell_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from eggshell_tpu.fem import fdtd


def bench_2d(n, steps=200):
    f = fdtd.init_2d(n, n)
    dt = float(fdtd.courant_dt(1.0, 2))

    @jax.jit
    def run_xla(f):
        def body(fld, _):
            return fdtd.step_2d(fld, dt, 1.0), None
        out, _ = jax.lax.scan(body, f, None, length=steps)
        return out

    out = run_xla(f)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_xla(f)
    jax.block_until_ready(out)
    t_x = (time.perf_counter() - t0) / steps

    ez = jnp.zeros((n, n))
    hx = jnp.zeros((n, n))
    hy = jnp.zeros((n, n))
    inv_eps = jnp.ones((n, n))
    pec_free = jnp.ones((n, n)).at[0, :].set(0).at[-1, :].set(0)
    pec_free = pec_free.at[:, 0].set(0).at[:, -1].set(0)

    @jax.jit
    def run_pl(ez, hx, hy):
        def body(c, _):
            e, x, y = c
            e, x, y = fdtd.step_2d_pallas(e, x, y, inv_eps, pec_free,
                                          dt, 1.0)
            return (e, x, y), None
        out, _ = jax.lax.scan(body, (ez, hx, hy), None, length=steps)
        return out

    out = run_pl(ez, hx, hy)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_pl(ez, hx, hy)
    jax.block_until_ready(out)
    t_p = (time.perf_counter() - t0) / steps

    print(f"2d n={n}: xla {n*n/t_x/1e9:7.2f} Gcell/s   "
          f"pallas {n*n/t_p/1e9:7.2f} Gcell/s   "
          f"(xla {t_x*1e6:.0f} us, pallas {t_p*1e6:.0f} us/step)")


def bench_3d(n, steps=50, pml=True):
    f = fdtd.init_3d(n)
    dt = float(fdtd.courant_dt(1.0, 3))
    cpml = psi = None
    if pml:
        cpml, psi = fdtd.make_cpml_3d((n, n, n), dt, 1.0)

    @jax.jit
    def run(f, psi):
        def body(c, _):
            fld, p = c
            if pml:
                fld, p = fdtd.step_3d(fld, dt, 1.0, cpml=cpml, psi=p)
            else:
                fld = fdtd.step_3d(fld, dt, 1.0)
            return (fld, p), None
        out, _ = jax.lax.scan(body, (f, psi), None, length=steps)
        return out

    out = run(f, psi)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(f, psi)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / steps
    cells = n ** 3
    # traffic: 6 E + 6 H r/w (24 f32) + 12 psi r/w (24 f32) when pml
    nb = (48 if pml else 24) * 4
    print(f"3d n={n} pml={pml}: {cells/t/1e9:6.2f} Gcell/s "
          f"({t*1e3:.2f} ms/step, ~{cells*nb/t/1e9:.0f} GB/s of 819)")


def main():
    print("backend:", jax.default_backend())
    bench_2d(1024)
    bench_2d(2048)
    bench_3d(128, pml=False)
    bench_3d(128, pml=True)
    bench_3d(192, pml=True)


if __name__ == "__main__":
    main()
