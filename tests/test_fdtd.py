"""FDTD core tests (toolkit/fdtd analog): cavity resonance vs analytic,
energy conservation, Pallas kernel vs jnp stencil."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eggshell_tpu.fem import fdtd


def test_cavity_resonance_frequency():
    """PEC square cavity: TM110 resonance at f = c/(sqrt 2 a) * ...;
    in normalised units omega = pi sqrt(2)/a."""
    n = 64
    dx = 1.0 / (n - 1)          # cavity side a = 1
    dt = float(fdtd.courant_dt(dx, 2, 0.5))
    f = fdtd.init_2d(n, n, jnp.float64)
    # initialise with the TM11 mode shape => oscillation at omega_11
    x = np.linspace(0, 1, n)
    ez0 = np.sin(np.pi * x)[:, None] * np.sin(np.pi * x)[None, :]
    f = f._replace(ez=jnp.asarray(ez0))
    steps = 4000
    _, trace = fdtd.simulate_2d(f, steps, dt, dx, probe_ij=(n // 3, n // 4))
    trace = np.asarray(trace)
    freqs = np.fft.rfftfreq(steps, dt)
    spec = np.abs(np.fft.rfft(trace * np.hanning(steps)))
    peak = freqs[np.argmax(spec)]
    want = np.sqrt(2) / 2  # omega/(2 pi) = sqrt(2)/2 for a=c=1
    assert abs(peak - want) / want < 0.02, (peak, want)


def test_energy_conservation_2d():
    n = 48
    dx = 1.0 / (n - 1)
    dt = float(fdtd.courant_dt(dx, 2, 0.7))
    rng = np.random.default_rng(0)
    f = fdtd.init_2d(n, n, jnp.float64)
    ez0 = np.zeros((n, n))
    ez0[10:38, 10:38] = rng.normal(size=(28, 28))
    f = f._replace(ez=jnp.asarray(ez0))
    # half H step offset means energy oscillates slightly; average drift
    # over many steps must be tiny
    f1, _ = fdtd.simulate_2d(f, 5, dt, dx)
    e_start = float(fdtd.energy_2d(f1, dx))
    f2, _ = fdtd.simulate_2d(f1, 2000, dt, dx)
    e_end = float(fdtd.energy_2d(f2, dx))
    assert abs(e_end - e_start) / e_start < 5e-2


def test_pec_mask_blocks_field():
    n = 64
    dx = 1.0 / (n - 1)
    dt = float(fdtd.courant_dt(dx, 2, 0.7))
    pec = np.zeros((n, n), bool)
    pec[:, n // 2] = True           # metal wall across the middle
    pec[n // 4 : n // 2, n // 2] = False  # with an aperture
    f = fdtd.init_2d(n, n, jnp.float64)

    def src(t):
        return jnp.exp(-((t - 20 * dt * 10) ** 2) / (2 * (5 * dt * 10) ** 2))

    fin, _ = fdtd.simulate_2d(
        f, 400, dt, dx, pec=jnp.asarray(pec),
        source_ij=(n // 4, n // 4), source_fn=src,
    )
    ez = np.asarray(fin.ez)
    assert np.abs(ez[:, n // 2][pec[:, n // 2]]).max() == 0.0
    # some field leaked through the aperture
    assert np.abs(ez[:, n // 2 + 2 :]).max() > 1e-8


def test_pallas_step_matches_jnp():
    n = 32
    dx = 1.0 / (n - 1)
    dt = float(fdtd.courant_dt(dx, 2, 0.7))
    rng = np.random.default_rng(1)
    ez = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    rim = np.ones((n, n), np.float32)
    rim[0] = rim[-1] = 0
    rim[:, 0] = rim[:, -1] = 0
    ez = ez * jnp.asarray(rim)
    f = fdtd.Field2D(ez=ez, hx=jnp.zeros((n, n - 1), jnp.float32),
                     hy=jnp.zeros((n - 1, n), jnp.float32))

    want = fdtd.step_2d(f, dt, dx)

    hxp = jnp.zeros((n, n), jnp.float32)
    hyp = jnp.zeros((n, n), jnp.float32)
    ez2, hxp2, hyp2 = fdtd.step_2d_pallas(
        ez, hxp, hyp, jnp.ones((n, n), jnp.float32), jnp.asarray(rim),
        dt, dx, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ez2), np.asarray(want.ez), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(hxp2[:, :-1]), np.asarray(want.hx), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hyp2[:-1, :]), np.asarray(want.hy), atol=1e-6
    )


def test_energy_conservation_3d():
    n = 16
    dx = 1.0 / (n - 1)
    dt = float(fdtd.courant_dt(dx, 3, 0.5))
    rng = np.random.default_rng(2)
    f = fdtd.init_3d(n, jnp.float64)
    ez0 = np.zeros((n, n, n))
    ez0[4:12, 4:12, 4:12] = rng.normal(size=(8, 8, 8))
    f = f._replace(ez=jnp.asarray(ez0))

    def run(f, k):
        for _ in range(k):
            f = fdtd.step_3d(f, dt, dx)
        return f

    f1 = run(f, 5)
    e0 = float(fdtd.energy_3d(f1, dx))
    f2 = run(f1, 300)
    e1 = float(fdtd.energy_3d(f2, dx))
    assert abs(e1 - e0) / e0 < 0.1
