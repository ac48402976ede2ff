"""FDTD computational core — toolkit/fdtd.{h,cc} equivalent.

2D TMz Yee scheme (Ez, Hx, Hy) and a minimal 3D Yee scheme, in
normalised units (c = eps0 = mu0 = 1).  PEC voxel masks (ref fdtd
`PEC` masks) zero the tangential E field.  The per-step update is
available two ways:

- `step_2d`: plain jnp stencil update (XLA fuses this well);
- `step_2d_pallas`: the same update as one fused Pallas kernel — the
  natural TPU stencil showcase (loads the field tile once, applies both
  half-updates in VMEM).

`simulate_2d` scans the update over time with optional soft source and
probe recording.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class Field2D(NamedTuple):
    ez: jax.Array   # (nx, ny)
    hx: jax.Array   # (nx, ny-1)
    hy: jax.Array   # (nx-1, ny)


def init_2d(nx: int, ny: int, dtype=jnp.float32) -> Field2D:
    return Field2D(
        ez=jnp.zeros((nx, ny), dtype),
        hx=jnp.zeros((nx, ny - 1), dtype),
        hy=jnp.zeros((nx - 1, ny), dtype),
    )


def courant_dt(dx: float, dims: int = 2, safety: float = 0.99) -> float:
    return safety * dx / jnp.sqrt(jnp.asarray(float(dims)))


def step_2d(
    f: Field2D,
    dt: float,
    dx: float,
    eps_r: Optional[jax.Array] = None,   # (nx, ny)
    pec: Optional[jax.Array] = None,     # (nx, ny) bool, True = metal
) -> Field2D:
    """One leapfrog step: H half-update then E update (ref fdtd kernels)."""
    c = dt / dx
    hx = f.hx - c * (f.ez[:, 1:] - f.ez[:, :-1])
    hy = f.hy + c * (f.ez[1:, :] - f.ez[:-1, :])

    curl = jnp.zeros_like(f.ez)
    curl = curl.at[1:-1, :].add(hy[1:, :] - hy[:-1, :])
    curl = curl.at[:, 1:-1].add(-(hx[:, 1:] - hx[:, :-1]))
    inv_eps = 1.0 if eps_r is None else 1.0 / eps_r
    ez = f.ez + c * inv_eps * curl
    if pec is not None:
        ez = jnp.where(pec, 0.0, ez)
    # outer boundary is PEC by construction (E on the rim never updated
    # by a full curl; pin it to zero)
    ez = ez.at[0, :].set(0.0).at[-1, :].set(0.0)
    ez = ez.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return Field2D(ez=ez, hx=hx, hy=hy)


def energy_2d(f: Field2D, dx: float) -> jax.Array:
    """Discrete EM energy 0.5 int (E^2 + H^2)."""
    return 0.5 * dx * dx * (
        jnp.sum(f.ez**2) + jnp.sum(f.hx**2) + jnp.sum(f.hy**2)
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "source_ij", "source_fn", "probe_ij"),
)
def simulate_2d(
    f: Field2D,
    num_steps: int,
    dt: float,
    dx: float,
    eps_r: Optional[jax.Array] = None,
    pec: Optional[jax.Array] = None,
    source_ij: Optional[Tuple[int, int]] = None,
    source_fn=None,
    probe_ij: Optional[Tuple[int, int]] = None,
):
    """Scan the update over time.  Returns (final field, probe trace)."""

    def body(carry, t):
        fld = carry
        fld = step_2d(fld, dt, dx, eps_r, pec)
        if source_ij is not None and source_fn is not None:
            fld = fld._replace(
                ez=fld.ez.at[source_ij].add(source_fn(t * dt))
            )
        out = fld.ez[probe_ij] if probe_ij is not None else jnp.float32(0)
        return fld, out

    return jax.lax.scan(body, f, jnp.arange(num_steps))


# ---------------------------------------------------------------------------
# Pallas fused step (2D)


def _fdtd_kernel(ez_ref, hx_ref, hy_ref, inv_eps_ref, pecf_ref,
                 ezo_ref, hxo_ref, hyo_ref, *, c):
    ez = ez_ref[:]
    # H half-step (padded H grids: same shape as ez; rims unused)
    hx = hx_ref[:]
    hy = hy_ref[:]
    dzy = ez[:, 1:] - ez[:, :-1]
    hx = hx.at[:, :-1].add(-c * dzy)
    dzx = ez[1:, :] - ez[:-1, :]
    hy = hy.at[:-1, :].add(c * dzx)

    curl = jnp.zeros_like(ez)
    curl = curl.at[1:-1, :].add(hy[1:-1, :] - hy[:-2, :])
    curl = curl.at[:, 1:-1].add(-(hx[:, 1:-1] - hx[:, :-2]))
    ez = ez + c * inv_eps_ref[:] * curl
    ez = ez * pecf_ref[:]  # 0 on PEC / rim, 1 elsewhere
    ezo_ref[:] = ez
    hxo_ref[:] = hx
    hyo_ref[:] = hy


@functools.partial(jax.jit, static_argnames=("dt", "dx", "interpret"))
def step_2d_pallas(
    ez, hx_pad, hy_pad, inv_eps, pec_free, dt, dx, interpret: bool = False
):
    """Fused 2D update.  H fields are carried on ez-shaped padded grids
    (hx_pad[:, :-1] and hy_pad[:-1, :] live; rims zero).  `pec_free` is a
    float mask: 0 on PEC cells and the outer rim, 1 elsewhere."""
    c = float(dt / dx)
    kernel = functools.partial(_fdtd_kernel, c=c)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * 5,
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(ez.shape, ez.dtype),
            jax.ShapeDtypeStruct(ez.shape, ez.dtype),
            jax.ShapeDtypeStruct(ez.shape, ez.dtype),
        ),
        interpret=interpret,
    )(ez, hx_pad, hy_pad, inv_eps, pec_free)


# ---------------------------------------------------------------------------
# Minimal 3D Yee core (ref toolkit/fdtd.h 3D Range/PEC machinery)


class Field3D(NamedTuple):
    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    hx: jax.Array
    hy: jax.Array
    hz: jax.Array


def init_3d(n: int, dtype=jnp.float32) -> Field3D:
    z = lambda: jnp.zeros((n, n, n), dtype)
    return Field3D(z(), z(), z(), z(), z(), z())


def step_3d(f: Field3D, dt: float, dx: float) -> Field3D:
    """One 3D Yee step on collocated padded grids with PEC outer walls
    (differences use rolls; the rim is pinned to zero)."""
    c = dt / dx

    def d(a, axis):
        return jnp.roll(a, -1, axis) - a

    hx = f.hx - c * (d(f.ez, 1) - d(f.ey, 2))
    hy = f.hy - c * (d(f.ex, 2) - d(f.ez, 0))
    hz = f.hz - c * (d(f.ey, 0) - d(f.ex, 1))

    def db(a, axis):
        return a - jnp.roll(a, 1, axis)

    ex = f.ex + c * (db(hz, 1) - db(hy, 2))
    ey = f.ey + c * (db(hx, 2) - db(hz, 0))
    ez = f.ez + c * (db(hy, 0) - db(hx, 1))

    def pin(a):
        for ax in range(3):
            a = jnp.moveaxis(a, ax, 0).at[0].set(0.0)
            a = a.at[-1].set(0.0)
            a = jnp.moveaxis(a, 0, ax)
        return a

    return Field3D(pin(ex), pin(ey), pin(ez), hx, hy, hz)


def energy_3d(f: Field3D, dx: float) -> jax.Array:
    return 0.5 * dx**3 * sum(jnp.sum(a**2) for a in f)
