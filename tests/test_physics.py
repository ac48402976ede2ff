"""End-to-end stepper tests: analytic checks, trajectory parity vs the
NumPy oracle, and scenario-level behavior (the analog of the reference's
simulation-in-the-loop solver tests, eggshell/sparse_iterations.cc:584-668).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.oracle import sim_oracle
import eggshell_tpu.parallel.rollout as par
from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.contacts import make_contacts
from eggshell_tpu.physics.stepper import (
    init_stabilize,
    position_constraint_error,
    post_stabilize,
    step_ode,
)
from eggshell_tpu.utils.config import SimConfig, SolverKind

CFG_DIRECT = SimConfig(solver=SolverKind.DIRECT)
CFG_PGS = SimConfig(solver=SolverKind.PGS, solver_iters=200)


def to_oracle(spec, state):
    inv_m = np.asarray(spec.inv_mass)
    static = inv_m == 0
    mass = np.where(static, 1.0, 1.0 / np.where(static, 1.0, inv_m))
    joints = [
        (
            int(spec.joint_b0[j]),
            int(spec.joint_b1[j]),
            np.asarray(spec.joint_c0[j]),
            np.asarray(spec.joint_c1[j]),
        )
        for j in range(spec.num_joints)
    ]
    return sim_oracle.OracleScene(
        p=np.asarray(state.p),
        v=np.asarray(state.v),
        q=np.asarray(state.q),
        w=np.asarray(state.w),
        mass=mass,
        inertia_body=np.asarray(spec.inertia_body),
        static=static,
        joints=joints,
    )


def contacts_to_list(cs):
    out = []
    act = np.asarray(cs.active)
    for k in np.flatnonzero(act):
        out.append(
            (
                int(cs.b0[k]),
                int(cs.b1[k]),
                np.asarray(cs.position[k]),
                np.asarray(cs.normal[k]),
                float(cs.depth[k]),
            )
        )
    return out


def test_free_fall_matches_analytic():
    """A single box above the ground: ballistic trajectory + constant
    spin (no constraint rows active)."""
    spec, state = scenes.box_drop(height=5.0)
    state = state._replace(w=jnp.asarray([[1.0, 2.0, 3.0]]) * 0.0)
    cfg = CFG_DIRECT
    final, _ = par.rollout(spec, state, cfg, 100)
    t = 100 * cfg.dt
    # midpoint integration of constant acceleration is exact
    z = 5.0 - 0.5 * 9.8 * t**2
    np.testing.assert_allclose(float(final.p[0, 2]), z, atol=1e-12)
    np.testing.assert_allclose(float(final.v[0, 2]), -9.8 * t, atol=1e-12)


@pytest.mark.parametrize("cfg", [CFG_DIRECT], ids=["direct"])
def test_chain_trajectory_matches_oracle(cfg):
    """Swinging 5-link chain, 100 steps: JAX vs NumPy oracle state parity
    well inside the 1e-3 target (BASELINE.md)."""
    spec, state = scenes.chain(5)
    osc = to_oracle(spec, state)
    st = state
    for i in range(100):
        st, cs = step_ode(spec, st, cfg)
        sim_oracle.step_ode(osc, contacts_to_list(cs), conditional_cfm=True)
    np.testing.assert_allclose(np.asarray(st.p), osc.p, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.v), osc.v, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.q), osc.q, atol=1e-9)


@pytest.mark.xdist_group("heavy")
def test_chain_joint_error_stays_small():
    spec, state = scenes.chain(10)
    final, _ = par.rollout(spec, state, CFG_DIRECT, 300)
    err = position_constraint_error(spec, final, CFG_DIRECT)
    assert float(jnp.abs(err).max()) < 5e-3
    # chain actually swings (gravity acts)
    assert float(jnp.abs(final.v).max()) > 0.01


def test_box_drop_comes_to_rest():
    """BASELINE config #1: box dropped from 0.25 settles on the ground at
    z = half-extent."""
    spec, state = scenes.box_drop(height=0.25)
    final, _ = par.rollout(spec, state, CFG_PGS, 800)
    assert abs(float(final.p[0, 2]) - 0.15) < 5e-3
    assert float(jnp.abs(final.v).max()) < 1e-2
    assert float(jnp.abs(final.w).max()) < 1e-2


def test_box_drop_matches_oracle_through_impact():
    """Trajectory parity across the contact transition (40 steps around
    first impact), DIRECT solver both sides."""
    spec, state = scenes.box_drop(height=0.16)
    cfg = CFG_DIRECT
    osc = to_oracle(spec, state)
    st = state
    for i in range(60):
        st, cs = step_ode(spec, st, cfg)
        sim_oracle.step_ode(osc, contacts_to_list(cs))
    np.testing.assert_allclose(np.asarray(st.p), osc.p, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.v), osc.v, atol=1e-5)


def test_stack_stays_standing():
    """BASELINE config #3: a 4-box stack survives 500 steps with PGS."""
    spec, state = scenes.box_stack(4)
    final, _ = par.rollout(spec, state, CFG_PGS, 500)
    z = np.asarray(final.p[:, 2])
    np.testing.assert_allclose(
        z, 0.15 + 0.3 * np.arange(4), atol=2e-2
    )
    assert float(jnp.abs(final.v).max()) < 0.05


def test_cairn_settles_above_ground():
    """Random falling boxes end up at/above the ground with low speed
    (ref model.cc Cairn scenario)."""
    spec, state = scenes.cairn(3, z_bound=(0.5, 1.5), seed=2)
    cfg = CFG_PGS.replace(contact_capacity=48)
    # The reference pre-stabilizes the cairn before stepping
    # (model.cc:74-75) — random boxes may start interpenetrated.
    state = init_stabilize(spec, state, cfg)
    final, _ = par.rollout(spec, state, cfg, 2500)
    z = np.asarray(final.p[:, 2])
    assert np.isfinite(np.asarray(final.p)).all()
    assert (z > 0.05).all(), z
    # settled or slowly rolling — no energy blow-up
    assert float(jnp.abs(final.v).max()) < 0.5
    assert float(jnp.abs(final.p[:, :2]).max()) < 3.0


def test_init_stabilize_fixes_joint_error():
    """Perturbed chain is pulled back onto the constraint manifold
    (ref ensembles.cc:602-622)."""
    spec, state = scenes.chain(4)
    bad = state._replace(p=state.p.at[2, 1].add(0.05))
    err0 = position_constraint_error(spec, bad, CFG_DIRECT)
    st = init_stabilize(spec, bad, CFG_DIRECT)
    err1 = position_constraint_error(spec, st, CFG_DIRECT)
    assert float(err1 @ err1) < 1e-9
    assert float(err1 @ err1) < float(err0 @ err0)


def test_post_stabilize_reduces_error():
    spec, state = scenes.chain(4)
    bad = state._replace(p=state.p.at[1, 2].add(0.02))
    st = post_stabilize(spec, bad, CFG_DIRECT, max_steps=500)
    err = position_constraint_error(spec, st, CFG_DIRECT)
    assert float(err @ err) < 1e-9


def test_contact_dedupe():
    """Two coincident boxes produce deduplicated contacts: no two active
    same-pair contacts closer than the min distance
    (ref ensembles.cc:241-329)."""
    spec, state = scenes.box_stack(2)
    # shift box 1 down so the interface penetrates slightly
    state = state._replace(p=state.p.at[1, 2].add(-0.002))
    cs = make_contacts(spec, state, CFG_PGS)
    act = np.flatnonzero(np.asarray(cs.active))
    pos = np.asarray(cs.position)[act]
    pair = np.stack(
        [
            np.minimum(np.asarray(cs.b0)[act], np.asarray(cs.b1)[act]),
            np.maximum(np.asarray(cs.b0)[act], np.asarray(cs.b1)[act]),
        ],
        axis=1,
    )
    for a in range(len(act)):
        for b in range(a + 1, len(act)):
            if (pair[a] == pair[b]).all() and pair[a][0] >= 0:
                assert np.linalg.norm(pos[a] - pos[b]) >= 1e-6


def test_batched_rollout_matches_single():
    spec, state = scenes.box_drop(height=0.3)
    states = par.batch_states([state, state._replace(p=state.p + 0.01)])
    finals = par.rollout_batched(spec, states, CFG_PGS, 50)
    single0, _ = par.rollout(spec, state, CFG_PGS, 50)
    np.testing.assert_allclose(
        np.asarray(finals.p[0]), np.asarray(single0.p), atol=1e-12
    )


def test_living_room_loads_and_steps():
    """BASELINE config #4: clutter scene steps without NaNs; static
    furniture does not move."""
    spec, state = scenes.living_room()
    cfg = CFG_PGS.replace(contact_capacity=64, solver_iters=50)
    p_static0 = np.asarray(state.p[:4])
    # The MJCF places the lamp interpenetrating the dining table (MuJoCo's
    # soft solref absorbs this); stabilize onto the manifold first.
    state = init_stabilize(spec, state, cfg)
    np.testing.assert_allclose(np.asarray(state.p[:4]), p_static0, atol=0)
    final, _ = par.rollout(spec, state, cfg, 100)
    assert np.isfinite(np.asarray(final.p)).all()
    np.testing.assert_allclose(np.asarray(final.p[:4]), p_static0, atol=0)
    # free armchairs are falling toward the floor
    assert float(final.p[4, 2]) < float(state.p[4, 2])
    # nothing blew up
    assert float(jnp.abs(final.p).max()) < 10.0


def test_friction_models():
    """NO_FRICTION slides freely; BOX resists up to the bound; INFINITE
    pins the tangential motion (ref eggshell/contact.cc:80-116)."""
    from eggshell_tpu.mpc.sampling import rollout_controlled
    from eggshell_tpu.utils.config import FrictionModel

    spec, state = scenes.box_drop(height=0.15)
    H = 150
    push = jnp.zeros((H, 6)).at[:, 0].set(2.0)  # 2 N < 4-contact box bound

    def run(model):
        cfg = CFG_PGS.replace(
            friction_model=model, contact_capacity=16,
            conditional_cfm=False, cfm_always=0.01, solver_iters=60,
        )
        fin, _ = rollout_controlled(spec, state, cfg, push, 0)
        return float(fin.p[0, 0])

    x_none = run(FrictionModel.NO_FRICTION)
    x_box = run(FrictionModel.BOX)
    x_inf = run(FrictionModel.INFINITE)
    assert x_none > 0.015, x_none          # slides freely
    assert abs(x_box) < 1e-4, x_box        # static friction holds (2N < bound)
    assert abs(x_inf) < 1e-4, x_inf        # infinite friction pins

    # above the bound, BOX slides but slower than frictionless
    push2 = jnp.zeros((H, 6)).at[:, 0].set(25.0)
    cfg_box = CFG_PGS.replace(friction_model=FrictionModel.BOX,
                              contact_capacity=16, conditional_cfm=False,
                              cfm_always=0.01, solver_iters=60)
    cfg_none = cfg_box.replace(friction_model=FrictionModel.NO_FRICTION)
    fb, _ = rollout_controlled(spec, state, cfg_box, push2, 0)
    fn_, _ = rollout_controlled(spec, state, cfg_none, push2, 0)
    assert 0 < float(fb.p[0, 0]) < float(fn_.p[0, 0])


def test_checkpoint_resume_rollout(tmp_path):
    """Checkpoint mid-rollout, restore, continue: identical trajectory to
    an uninterrupted run (SURVEY §5.4 capability)."""
    from eggshell_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    spec, state = scenes.box_stack(3)
    cfg = CFG_PGS.replace(contact_capacity=24)
    mid, _ = par.rollout(spec, state, cfg, 40)
    save_checkpoint(str(tmp_path / "ck"), {"state": mid._asdict()})
    loaded = restore_checkpoint(str(tmp_path / "ck"))
    from eggshell_tpu.physics.scene import State

    resumed = State(**{k: jnp.asarray(v) for k, v in loaded["state"].items()})
    fin_resumed, _ = par.rollout(spec, resumed, cfg, 40)
    fin_straight, _ = par.rollout(spec, state, cfg, 80)
    np.testing.assert_allclose(
        np.asarray(fin_resumed.p), np.asarray(fin_straight.p), atol=1e-12
    )


def test_coulomb_pyramid_friction():
    """COULOMB_PYRAMID: tangential capacity scales with the normal load
    (the model the reference declares but never implements,
    eggshell/contact.cc:150-152).  A heavier box resists a lateral force
    that slides a light one."""
    from eggshell_tpu.mpc.sampling import rollout_controlled
    from eggshell_tpu.utils.config import FrictionModel

    H = 200
    push = jnp.zeros((H, 6)).at[:, 0].set(4.0)

    def final_x(mass, mu):
        from eggshell_tpu.physics.scene import make_scene

        spec, st = make_scene([[0.0, 0.0, 0.15]], masses=[mass], ground=True)
        cfg = SimConfig(
            solver=SolverKind.PGS, solver_iters=80,
            friction_model=FrictionModel.COULOMB_PYRAMID, friction_mu=mu,
            contact_capacity=16, conditional_cfm=False, cfm_always=0.01,
        )
        fin, _ = rollout_controlled(spec, st, cfg, push, 0)
        return float(fin.p[0, 0])

    # light box (mg=9.8N, mu=0.2 -> cap ~2N < 4N push): slides
    x_light = final_x(1.0, 0.2)
    # heavy box (mg=49N, mu=0.2 -> cap ~9.8N > 4N push): static friction holds
    x_heavy = final_x(5.0, 0.2)
    assert x_light > 5e-3, x_light
    assert abs(x_heavy) < 1e-4, x_heavy
    # higher mu also holds the light box
    x_grippy = final_x(1.0, 0.8)
    assert abs(x_grippy) < 1e-4, x_grippy


def test_step_diagnostics():
    """Structured metrics (SURVEY §5.5)."""
    from eggshell_tpu.physics.stepper import step_diagnostics

    spec, state = scenes.box_stack(3)
    d = step_diagnostics(spec, state, CFG_PGS.replace(contact_capacity=24))
    assert 4 <= int(d["num_contacts"]) <= 24
    assert float(d["max_penetration"]) >= 0
    assert float(d["kinetic_energy"]) == 0.0
    assert np.isfinite(float(d["solver_residual"]))


def test_power_cond_estimator_matches_exact_decision():
    """conditional_cfm with cond_estimator="power" reaches the same
    CFM decision (and near-identical step) as the exact eigvalsh check
    on the canonical scenes — the cheap estimator is a drop-in for the
    f64 oracle tier (ref CheckMatrixCondition, eggshell/utils.cc:256)."""
    import jax.numpy as jnp

    from eggshell_tpu.physics import scenes
    from eggshell_tpu.physics.stepper import step_ode
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    for mk in (lambda: scenes.box_stack(3), lambda: scenes.cairn(3, seed=7)):
        spec, st = mk()
        exact = SimConfig(solver=SolverKind.DIRECT, conditional_cfm=True,
                          cond_estimator="exact", contact_capacity=32)
        power = exact.replace(cond_estimator="power")
        se, sp = st, st
        for _ in range(10):
            se, _ = step_ode(spec, se, exact)
            sp, _ = step_ode(spec, sp, power)
        np.testing.assert_allclose(
            np.asarray(se.p), np.asarray(sp.p), atol=1e-9
        )
