"""Scratch prototype: slab-stored CPML psi for the 3D Yee update.
Parity vs step_3d (full-grid psi) + TPU perf at n=128."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
import numpy as np
from typing import NamedTuple, Tuple
from eggshell_tpu.fem import fdtd as fd


class PsiSlab(NamedTuple):
    hx_y: jax.Array; hx_z: jax.Array; hy_z: jax.Array; hy_x: jax.Array
    hz_x: jax.Array; hz_y: jax.Array; ex_y: jax.Array; ex_z: jax.Array
    ey_z: jax.Array; ey_x: jax.Array; ez_x: jax.Array; ez_y: jax.Array


def make_slab_psi(shape, ds, dtype=jnp.float32):
    def z(axis):
        s = list(shape); s[axis] = 2 * ds
        return jnp.zeros(tuple(s), dtype)
    # component -> derivative axis (matches step_3d's conv calls)
    axes = dict(hx_y=1, hx_z=2, hy_z=2, hy_x=0, hz_x=0, hz_y=1,
                ex_y=1, ex_z=2, ey_z=2, ey_x=0, ez_x=0, ez_y=1)
    return PsiSlab(**{k: z(ax) for k, ax in axes.items()})


def _slab_coeff(v, ds, axis):
    c = jnp.concatenate([v[:ds], v[-ds:]])
    shape = [1, 1, 1]; shape[axis] = 2 * ds
    return c.reshape(shape)


def _take_slabs(a, ds, axis):
    n = a.shape[axis]
    lo = jax.lax.slice_in_dim(a, 0, ds, axis=axis)
    hi = jax.lax.slice_in_dim(a, n - ds, n, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _add_slabs(a, s, ds, axis):
    n = a.shape[axis]
    lo = jax.lax.slice_in_dim(s, 0, ds, axis=axis)
    hi = jax.lax.slice_in_dim(s, ds, 2 * ds, axis=axis)
    alo = jax.lax.slice_in_dim(a, 0, ds, axis=axis)
    ahi = jax.lax.slice_in_dim(a, n - ds, n, axis=axis)
    idx_lo = [slice(None)] * 3; idx_lo[axis] = slice(0, ds)
    idx_hi = [slice(None)] * 3; idx_hi[axis] = slice(n - ds, n)
    a = a.at[tuple(idx_lo)].set(alo + lo)
    return a.at[tuple(idx_hi)].set(ahi + hi)


def step_3d_slab(f, dt, dx, cpml, psi, ds):
    c = dt / dx

    def d(a, axis):
        return jnp.roll(a, -1, axis) - a

    def db(a, axis):
        return a - jnp.roll(a, 1, axis)

    def conv(dF, axis, p, a_t, b_t):
        sl = _take_slabs(dF, ds, axis)
        pn = _slab_coeff(b_t[axis], ds, axis) * p + \
            _slab_coeff(a_t[axis], ds, axis) * sl
        return _add_slabs(dF, pn, ds, axis), pn

    ch = lambda dF, ax, p: conv(dF, ax, p, cpml.a_h, cpml.b_h)
    ce = lambda dF, ax, p: conv(dF, ax, p, cpml.a_e, cpml.b_e)

    dzy, p_hx_y = ch(d(f.ez, 1), 1, psi.hx_y)
    dyz, p_hx_z = ch(d(f.ey, 2), 2, psi.hx_z)
    dxz, p_hy_z = ch(d(f.ex, 2), 2, psi.hy_z)
    dzx, p_hy_x = ch(d(f.ez, 0), 0, psi.hy_x)
    dyx, p_hz_x = ch(d(f.ey, 0), 0, psi.hz_x)
    dxy, p_hz_y = ch(d(f.ex, 1), 1, psi.hz_y)

    hx = f.hx - c * (dzy - dyz)
    hy = f.hy - c * (dxz - dzx)
    hz = f.hz - c * (dyx - dxy)

    bzy, p_ex_y = ce(db(hz, 1), 1, psi.ex_y)
    byz, p_ex_z = ce(db(hy, 2), 2, psi.ex_z)
    bxz, p_ey_z = ce(db(hx, 2), 2, psi.ey_z)
    bzx, p_ey_x = ce(db(hz, 0), 0, psi.ey_x)
    byx, p_ez_x = ce(db(hy, 0), 0, psi.ez_x)
    bxy, p_ez_y = ce(db(hx, 1), 1, psi.ez_y)

    ex = f.ex + c * (bzy - byz)
    ey = f.ey + c * (bxz - bzx)
    ez = f.ez + c * (byx - bxy)

    def pin(a):
        for ax in range(3):
            a = jnp.moveaxis(a, ax, 0).at[0].set(0.0)
            a = a.at[-1].set(0.0)
            a = jnp.moveaxis(a, 0, ax)
        return a

    return fd.Field3D(pin(ex), pin(ey), pin(ez), hx, hy, hz), psi._replace(
        hx_y=p_hx_y, hx_z=p_hx_z, hy_z=p_hy_z, hy_x=p_hy_x,
        hz_x=p_hz_x, hz_y=p_hz_y, ex_y=p_ex_y, ex_z=p_ex_z,
        ey_z=p_ey_z, ey_x=p_ey_x, ez_x=p_ez_x, ez_y=p_ez_y,
    )


def parity(n=48, steps=30, depth=8):
    ds = depth + 1
    dt = float(fd.courant_dt(1.0, 3))
    cpml, psi_full = fd.make_cpml_3d((n, n, n), dt, 1.0, depth=depth)
    rng = np.random.default_rng(0)
    mid = n // 2
    f = fd.init_3d(n)
    src = jnp.zeros((n, n, n)).at[mid-4:mid+4, mid-4:mid+4, mid-4:mid+4].set(
        jnp.asarray(rng.normal(size=(8, 8, 8)), jnp.float32))
    f = f._replace(ez=src)
    psi_slab = make_slab_psi((n, n, n), ds)

    f1, p1 = f, psi_full
    f2, p2 = f, psi_slab
    for _ in range(steps):
        f1, p1 = fd.step_3d(f1, dt, 1.0, cpml=cpml, psi=p1)
        f2, p2 = step_3d_slab(f2, dt, 1.0, cpml, p2, ds)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(f1, f2))
    scale = float(jnp.max(jnp.abs(f1.ez)))
    print("parity: max field diff", err, "scale", scale)
    assert err <= 1e-6 * max(scale, 1.0), err


def perf(n=128, steps=50, depth=8):
    ds = depth + 1
    dt = float(fd.courant_dt(1.0, 3))
    cpml, psi_full = fd.make_cpml_3d((n, n, n), dt, 1.0, depth=depth)
    f = fd.init_3d(n)
    psi_slab = make_slab_psi((n, n, n), ds)

    @jax.jit
    def run_full(f, p):
        def body(c, _):
            fld, pp = c
            return fd.step_3d(fld, dt, 1.0, cpml=cpml, psi=pp), None
        return jax.lax.scan(body, (f, p), None, length=steps)[0]

    @jax.jit
    def run_slab(f, p):
        def body(c, _):
            fld, pp = c
            return step_3d_slab(fld, dt, 1.0, cpml, pp, ds), None
        return jax.lax.scan(body, (f, p), None, length=steps)[0]

    for name, fn, p in (("full", run_full, psi_full),
                        ("slab", run_slab, psi_slab)):
        out = fn(f, p); jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(f, p)
            _ = float(out[0].ez.sum())
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "variant": name,
            "gcells_per_s": round(n**3 * steps / best / 1e9, 3),
        }), flush=True)


if __name__ == "__main__":
    parity()
    if jax.default_backend() == "tpu":
        perf()
