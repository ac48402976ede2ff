"""Implicit-midpoint integrator tests — the integrator the reference
declares but never implements (Integrator::IMPLICIT_MIDPOINT Panics,
eggshell/ensembles.cc:404, :593-600; single-body LIM prototypes at
model.cc:178-266 check rotational kinetic energy)."""

import numpy as np

import jax
import jax.numpy as jnp

from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.physics.stepper import (
    step_implicit_midpoint,
    step_ode,
)
from eggshell_tpu.utils.config import SimConfig, SolverKind


def _free_body(dtype=jnp.float64):
    """One unit box, no gravity scene interactions (set g=0 in cfg)."""
    spec, state = scenes.box_stack(1, dtype=dtype)
    # lift it far off the ground and give it a spin about an unstable axis
    state = state._replace(
        p=state.p.at[0, 2].set(100.0),
        w=state.w.at[0].set(jnp.asarray([0.1, 3.0, 0.05], dtype)),
    )
    return spec, state


def _rot_ke(spec: SceneSpec, state: State) -> float:
    R = np.asarray(state.R())
    Ig = R @ np.asarray(spec.inertia_body) @ np.transpose(R, (0, 2, 1))
    w = np.asarray(state.w)
    return float(0.5 * np.sum(w * np.einsum("nij,nj->ni", Ig, w)))


def test_free_rotation_conserves_kinetic_energy():
    """Torque-free rigid rotation: rotational KE is an invariant
    (the LIM* test criterion, ref model.cc:178-266).  The midpoint
    scheme holds it to ~1e-6 over 500 steps."""
    cfg = SimConfig(
        solver=SolverKind.DIRECT, gravity=(0.0, 0.0, 0.0),
        contact_capacity=8, conditional_cfm=False, cfm_always=0.0,
    )
    spec, state = _free_body()
    ke0 = _rot_ke(spec, state)

    def body(st, _):
        st2, _ = step_implicit_midpoint(spec, st, cfg)
        return st2, None

    state_T, _ = jax.lax.scan(body, state, None, length=500)
    keT = _rot_ke(spec, state_T)
    assert abs(keT - ke0) / ke0 < 1e-5

    # quaternions stay unit
    assert np.allclose(np.linalg.norm(np.asarray(state_T.q), axis=1), 1.0,
                       atol=1e-9)


def test_pendulum_energy_drift_smaller_than_ode():
    """2-link ball-joint pendulum, no contacts: total mechanical energy
    drift over 300 steps is much smaller for implicit midpoint than for
    the dissipative ERP/ODE stepper."""
    cfg = SimConfig(
        solver=SolverKind.DIRECT, contact_capacity=8,
        conditional_cfm=False, cfm_always=0.0, erp=0.2,
    )
    spec, state = scenes.chain(2)

    def energy(st):
        m = 1.0 / np.asarray(spec.inv_mass)
        pe = float(np.sum(m * 9.8 * np.asarray(st.p)[:, 2]))
        ke = float(0.5 * np.sum(m[:, None] * np.asarray(st.v) ** 2))
        return pe + ke + _rot_ke(spec, st)

    e0 = energy(state)

    def roll(stepper):
        st = state
        for _ in range(300):
            st, _ = stepper(spec, st, cfg)
        return st

    st_mid = roll(step_implicit_midpoint)
    st_ode = roll(step_ode)
    drift_mid = abs(energy(st_mid) - e0)
    drift_ode = abs(energy(st_ode) - e0)
    assert drift_mid < 0.5 * drift_ode
    assert drift_mid < 0.05 * abs(e0)


def test_contact_step_midpoint_resting_box():
    """A resting box on the ground stays put under the midpoint stepper
    with contacts (LCP solved at the midpoint state)."""
    cfg = SimConfig(
        solver=SolverKind.PGS, solver_iters=60, contact_capacity=8,
        conditional_cfm=False, cfm_always=0.01,
    )
    spec, state = scenes.box_stack(1)
    st = state
    for _ in range(50):
        st, _ = step_implicit_midpoint(spec, st, cfg)
    assert abs(float(st.p[0, 2]) - float(state.p[0, 2])) < 2e-3
    assert float(jnp.max(jnp.abs(st.v))) < 0.05
