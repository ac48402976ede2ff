"""MPC engine + device-mesh sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from eggshell_tpu.mpc.gradient import gradient_mpc_update
from eggshell_tpu.mpc.sampling import SamplingMPC, mppi_update, rollout_controlled
from eggshell_tpu.parallel import mesh as pmesh
from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.stepper import step_ode
from eggshell_tpu.utils.config import SimConfig, SolverKind

CFG = SimConfig(
    solver=SolverKind.PGS, solver_iters=40, conditional_cfm=False,
    cfm_always=0.01, contact_capacity=16,
)


def test_controlled_rollout_pushes_box():
    """A lateral force slides a resting box along +x (against box
    friction)."""
    spec, state = scenes.box_drop(height=0.15)
    H = 200
    push = jnp.zeros((H, 6)).at[:, 0].set(25.0)  # 25 N in +x
    final, _ = rollout_controlled(spec, state, CFG, push, 0)
    assert float(final.p[0, 0]) > 0.05
    free, _ = rollout_controlled(spec, state, CFG, jnp.zeros((H, 6)), 0)
    assert abs(float(free.p[0, 0])) < 1e-6


def test_mppi_reduces_cost():
    """MPPI on 'push the box to x=0.3' improves over the zero plan."""
    spec, state = scenes.box_drop(height=0.15)
    # Reachable target: ~30 N over a 60 ms horizon moves the box ~5 cm.
    target = jnp.asarray([0.05, 0.0, 0.15])

    def cost(final):
        return jnp.sum((final.p[0] - target) ** 2)

    H = 60
    mean = jnp.zeros((H, 6))
    zero_final, _ = rollout_controlled(spec, state, CFG, mean, 0)
    zero_cost = float(cost(zero_final))

    key = jax.random.PRNGKey(0)
    for i in range(4):
        mean, costs = mppi_update(
            spec, state, CFG, mean, jax.random.fold_in(key, i), cost,
            num_samples=64, noise_sigma=15.0, temperature=3e-4,
            noise_mode="constant",
        )
    new_final, _ = rollout_controlled(spec, state, CFG, mean, 0)
    assert float(cost(new_final)) < 0.5 * zero_cost


def test_gradient_mpc_matches_direction():
    """Gradient MPC on a frictionless-in-air box converges toward the
    target (pure differentiable dynamics, no contact)."""
    spec, state = scenes.box_drop(height=5.0)
    target = jnp.asarray([0.2, 0.0, 5.0 - 0.5 * 9.8 * (20 * CFG.dt) ** 2])

    def cost(final):
        return jnp.sum((final.p[0] - target) ** 2)

    # dx/dF ~ dt^2 (H-k) ~ 1e-5, so useful learning rates are ~1e6-1e8
    ctrl = jnp.zeros((20, 6))
    ctrl2, c2 = gradient_mpc_update(
        spec, state, CFG, ctrl, cost, learning_rate=1e7, steps=60
    )
    c0 = cost(rollout_controlled(spec, state, CFG, ctrl, 0)[0])
    assert float(c2) < 0.2 * float(c0)
    # learned force points along +x
    assert float(ctrl2[:, 0].mean()) > 0.0


def test_receding_horizon_driver():
    spec, state = scenes.box_drop(height=0.15)
    target = jnp.asarray([0.2, 0.0, 0.15])

    def cost(final):
        return jnp.sum((final.p[0] - target) ** 2)

    mpc = SamplingMPC(
        spec=spec, cfg=CFG, cost_fn=cost, horizon=20, num_samples=32,
        noise_sigma=20.0, temperature=0.2, iterations=1,
    )
    mean = jnp.zeros((mpc.horizon, 6))
    key = jax.random.PRNGKey(1)
    st = state
    for i in range(5):
        st, mean, best = mpc.control_step(st, mean, jax.random.fold_in(key, i))
    assert np.isfinite(np.asarray(st.p)).all()
    # box nudged toward +x
    assert float(st.p[0, 0]) > 0.0


def test_sharded_rollout_matches_local():
    """shard_map rollout over 8 devices == plain vmap rollout."""
    assert jax.device_count() >= 8
    spec, state = scenes.box_stack(2)
    B = 16
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
    )
    states = states._replace(
        p=states.p + jnp.linspace(0, 1e-3, B)[:, None, None]
    )
    mesh = pmesh.make_mesh(8)
    sharded = pmesh.sharded_rollout(spec, states, CFG, 20, mesh)

    def one(st):
        def body(s, _):
            s2, _ = step_ode(spec, s, CFG)
            return s2, None

        return jax.lax.scan(body, st, None, length=20)[0]

    local = jax.vmap(one)(states)
    np.testing.assert_allclose(
        np.asarray(sharded.p), np.asarray(local.p), atol=1e-12
    )


def test_sharded_mean_cost():
    mesh = pmesh.make_mesh(8)
    c = jnp.arange(64, dtype=jnp.float64)
    got = pmesh.sharded_mean_cost(c, mesh)
    np.testing.assert_allclose(float(got), float(c.mean()), atol=1e-12)


def test_dryrun_multichip_entry():
    """The driver-facing dry run must execute on a CPU mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_mppi_update_matches_local():
    """The distributed MPPI update (pmin/psum collectives over an
    8-device mesh) reproduces the single-device mppi_update exactly:
    same key, same noise tensor, same weights — only the reduction
    order differs (f64 -> ~1e-12)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggshell_tpu.mpc.sampling import mppi_update
    from eggshell_tpu.parallel import mesh as pmesh
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    cfg = SimConfig(
        solver=SolverKind.JACOBI, solver_iters=20, jacobi_omega=0.3,
        conditional_cfm=False, cfm_always=0.01, contact_capacity=16,
    )
    spec, state = scenes.box_stack(2, dtype=jnp.float64)
    H, S = 5, 16
    mc = jnp.zeros((H, 6))
    key = jax.random.PRNGKey(7)
    target = jnp.asarray([0.4, 0.0, 0.15])

    def cost_fn(final):
        return jnp.sum((final.p[0] - target) ** 2)

    local_mean, local_costs = mppi_update(
        spec, state, cfg, mc, key, cost_fn, num_samples=S,
        noise_sigma=0.5, temperature=0.7,
    )
    mesh = pmesh.make_mesh(8)
    shard_mean, shard_costs = pmesh.sharded_mppi_update(
        spec, state, cfg, mc, key, cost_fn, mesh, num_samples=S,
        noise_sigma=0.5, temperature=0.7,
    )
    np.testing.assert_allclose(
        np.asarray(shard_mean), np.asarray(local_mean), atol=1e-12
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(shard_costs)), np.sort(np.asarray(local_costs)),
        atol=1e-12,
    )


def test_multihost_launcher_two_processes(tmp_path):
    """2-process jax.distributed rollout == single-process rollout
    (the multi-host smoke artifact; gloo cross-process collectives)."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # workers set their own device count
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_launcher.py"),
         "--nprocs", "2", "--batch", "8", "--horizon", "10",
         "--out", str(tmp_path / "mh.json")],
        capture_output=True, text=True, timeout=560, env=env, cwd=root,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [l for l in proc.stdout.splitlines() if "max |dp|" in l][-1]
    rec = json.loads(line)
    assert rec["pass"] and rec["value"] < 1e-9


def test_rollout_divergence_monitor():
    """In-rollout divergence detection + masked degradation (SURVEY
    §5.3): scenarios seeded with absurd velocities are flagged and
    frozen at their last good state; healthy scenarios are bit-identical
    to the unmonitored rollout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eggshell_tpu.parallel.rollout import (
        rollout_batched,
        rollout_batched_monitored,
    )
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.utils.config import SimConfig, SolverKind

    cfg = SimConfig(
        solver=SolverKind.JACOBI, solver_iters=20, jacobi_omega=0.3,
        conditional_cfm=False, cfm_always=0.01, contact_capacity=20,
    )
    spec, state = scenes.box_stack(3, dtype=jnp.float64)
    B = 6
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
    )
    # poison scenarios 1 and 4 with enormous velocities
    bad = jnp.asarray([False, True, False, False, True, False])
    states = states._replace(
        v=jnp.where(bad[:, None, None], 1e9, states.v)
    )

    final, diags = rollout_batched_monitored(
        spec, states, cfg, 20, speed_limit=1e3
    )
    assert int(diags["diverged_count"]) == 2
    np.testing.assert_array_equal(np.asarray(diags["diverged"]),
                                  np.asarray(bad))
    # diverged scenarios flagged on the FIRST step and frozen finite
    fb = np.asarray(diags["first_bad_step"])
    assert (fb[np.asarray(bad)] == 0).all()
    assert (fb[~np.asarray(bad)] == 20).all()
    assert np.isfinite(np.asarray(final.p)).all()

    # healthy scenarios match the unmonitored rollout exactly
    plain = rollout_batched(spec, states, cfg, 20)
    ok = ~np.asarray(bad)
    np.testing.assert_array_equal(
        np.asarray(final.p)[ok], np.asarray(plain.p)[ok]
    )
