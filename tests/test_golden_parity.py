"""Golden-trajectory parity against the COMPILED C++ REFERENCE.

tests/data/golden_{chain10,cairn4}.csv hold 1000-step trajectories
(dt=1e-3) produced by the reference's own headless dynamics core
(ensembles.cc + lcp.cc + collision.cc ... compiled and run by
tools/golden/build_golden.sh; scenario recipes in
tools/golden/gen_golden.cc mirror the reference app's simulation loop,
eggshell/model.cc:28-31,74-108).  These tests step eggshell_tpu from the
same initial state and assert the BASELINE bound — state within 1e-3 of
the C++ reference at the same horizon and timestep — closing the loop
the self-derived oracle gates (tests/test_bench_parity.py) cannot.

Semantics note: the gate runs with SimConfig.ref_app_bounds=True, which
reproduces the reference APP's effective contact bounds ([0, inf) on
every inequality row — its production Lcp::MixedConstraintsSolver
discards the +-1 box friction bounds, eggshell/lcp.cc:276-298).  The
measured agreement is ~1e-11 over the full 1000 steps, so the 1e-3
assertion has four orders of headroom.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.scene import State, make_scene
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig, SolverKind

DATA = os.path.join(os.path.dirname(__file__), "data")
BOUND = 1e-3  # BASELINE.md: control/state within 1e-3 of the C++ reference


def load_golden(name):
    d = np.loadtxt(os.path.join(DATA, name), delimiter=",")
    steps = int(d[:, 0].max()) + 1
    n = int(d[:, 1].max()) + 1
    return d[:, 2:].reshape(steps, n, 13)  # p(3) q(wxyz,4) v(3) w(3)


def golden_state(g, row=0):
    return State(
        p=jnp.asarray(g[row, :, 0:3]), q=jnp.asarray(g[row, :, 3:7]),
        v=jnp.asarray(g[row, :, 7:10]), w=jnp.asarray(g[row, :, 10:13]),
    )


def rollout(spec, state, cfg, steps):
    ps, vs = [np.asarray(state.p)], [np.asarray(state.v)]
    for _ in range(steps):
        state, _ = step_ode(spec, state, cfg)
        ps.append(np.asarray(state.p))
        vs.append(np.asarray(state.v))
    return np.stack(ps), np.stack(vs)


def ref_cfg(**kw):
    """The reference app's operating point: Murty DIRECT solve,
    conditional CFM (ensembles.cc:510-521), erp=0.2, dt=1e-3, and the
    app's effective [0, inf) contact bounds (lcp.cc:276-298)."""
    base = dict(solver=SolverKind.DIRECT, conditional_cfm=True,
                ref_app_bounds=True, contact_capacity=64)
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.parametrize("steps", [1000])
def test_chain10_matches_cpp_reference_1e3(steps):
    """Chain(10) at (2,2,1): joints for ~400 steps, then ground contact —
    both regimes must track the compiled reference within 1e-3."""
    g = load_golden("golden_chain10.csv")
    spec, _ = scenes.chain(10, collide=True)
    ps, vs = rollout(spec, golden_state(g), ref_cfg(), steps)
    dp = np.abs(g[: steps + 1, :, 0:3] - ps).max()
    dv = np.abs(g[: steps + 1, :, 7:10] - vs).max()
    assert dp < BOUND, f"chain position drift {dp:.3e} vs C++ reference"
    assert dv < BOUND, f"chain velocity drift {dv:.3e} vs C++ reference"


@pytest.mark.parametrize("steps", [1000])
def test_cairn4_matches_cpp_reference_1e3(steps):
    """Cairn(4) from the reference's own seeded random initial state
    (post-InitStabilize, recorded as CSV row 0): box-box + ground
    frictional contact for the full second."""
    g = load_golden("golden_cairn4.csv")
    n = g.shape[1]
    spec, _ = make_scene(
        g[0, :, 0:3], quats=g[0, :, 3:7],
        inertias=np.tile(0.1 * np.eye(3), (n, 1, 1)),  # ref ensembles.cc:720
        ground=True,
    )
    ps, vs = rollout(spec, golden_state(g), ref_cfg(), steps)
    dp = np.abs(g[: steps + 1, :, 0:3] - ps).max()
    dv = np.abs(g[: steps + 1, :, 7:10] - vs).max()
    assert dp < BOUND, f"cairn position drift {dp:.3e} vs C++ reference"
    assert dv < BOUND, f"cairn velocity drift {dv:.3e} vs C++ reference"


def test_bench_jacobi_config_matches_cpp_reference_1e3():
    """The bench solver configuration (fixed-sweep under-relaxed Jacobi —
    the JACOBI_KERNEL math on the XLA path, f64) must also track the C++
    reference on Cairn within the BASELINE bound over a 300-step horizon
    (the bench rollout horizon is 50)."""
    g = load_golden("golden_cairn4.csv")
    n = g.shape[1]
    spec, _ = make_scene(
        g[0, :, 0:3], quats=g[0, :, 3:7],
        inertias=np.tile(0.1 * np.eye(3), (n, 1, 1)),
        ground=True,
    )
    cfg = ref_cfg(
        solver=SolverKind.JACOBI, conditional_cfm=False, cfm_always=0.0,
        solver_iters=300, jacobi_omega=0.3, jacobi_beta=0.45,
    )
    steps = 300
    ps, vs = rollout(spec, golden_state(g), cfg, steps)
    dp = np.abs(g[: steps + 1, :, 0:3] - ps).max()
    dv = np.abs(g[: steps + 1, :, 7:10] - vs).max()
    assert dp < BOUND, f"bench-config position drift {dp:.3e}"
    assert dv < BOUND, f"bench-config velocity drift {dv:.3e}"
