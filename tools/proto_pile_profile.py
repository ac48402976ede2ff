"""Prototype: phase-by-phase timing of the matrix-free pile512 step on
the live chip (round-5 scoping for VERDICT ask #3)."""

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

import jax.numpy as jnp

from eggshell_tpu.physics import scenes
from eggshell_tpu.physics.contacts import make_contacts_batched
from eggshell_tpu.physics.stepper import step_ode_batched
from eggshell_tpu.utils.config import SimConfig, SolverKind


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    nb, bl, cap, pc = 512, 2, 8192, 4096
    spec, st = scenes.box_pile(nb, dtype=dtype)
    cfg = SimConfig(
        solver=SolverKind.MATRIX_FREE,
        solver_iters=60,
        solver_tol=0.0,
        jacobi_omega=0.3,
        jacobi_beta=0.45,
        conditional_cfm=False,
        cfm_always=0.01,
        contact_capacity=cap,
        pair_capacity=pc,
        broadphase_margin=0.05,
        max_correcting_vel=2.0,
    )
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (bl,) + x.shape).copy(), st
    )

    # full step
    step = jax.jit(lambda s: step_ode_batched(spec, s, cfg))
    t_full = timeit(step, states)
    print(f"full step      : {t_full*1e3:8.2f} ms  "
          f"({bl*nb/t_full:,.0f} body-steps/s)")

    # contacts (broadphase + narrowphase + compact + dedupe)
    contacts = jax.jit(lambda s: make_contacts_batched(spec, s, cfg))
    t_c = timeit(contacts, states)
    print(f"contacts       : {t_c*1e3:8.2f} ms")

    # broadphase alone
    from eggshell_tpu.ops import broadphase

    def bp(states):
        def select(state_one):
            mask = broadphase.pair_overlap_mask(
                state_one.p, state_one.q, spec.half_extents,
                spec.pair_i, spec.pair_j, cfg.broadphase_margin,
            )
            return broadphase.select_pairs(
                mask, spec.pair_i, spec.pair_j, cfg.pair_capacity
            )
        return jax.vmap(select)(states)

    t_bp = timeit(jax.jit(bp), states)
    print(f"broadphase     : {t_bp*1e3:8.2f} ms   (num_pairs={spec.num_pairs})")

    # broadphase mask only (no compaction)
    def bp_mask(states):
        def select(state_one):
            return broadphase.pair_overlap_mask(
                state_one.p, state_one.q, spec.half_extents,
                spec.pair_i, spec.pair_j, cfg.broadphase_margin,
            )
        return jax.vmap(select)(states)

    t_bpm = timeit(jax.jit(bp_mask), states)
    print(f"bp mask only   : {t_bpm*1e3:8.2f} ms")

    # solve only: build blocks once, then time the matrix-free LCP
    from eggshell_tpu.ops import lcp_matrix_free as mf
    from eggshell_tpu.physics.constraints import build_compact_constraints
    from eggshell_tpu.physics import scene as scn

    css = contacts(states)

    @jax.jit
    def build_sys(states, css):
        return jax.vmap(
            lambda s, c: build_compact_constraints(spec, s, c, cfg)
        )(states, css)

    t_build = timeit(build_sys, states, css)
    sysc = build_sys(states, css)
    print(f"build blocks   : {t_build*1e3:8.2f} ms")

    @jax.jit
    def solve(states, sysc):
        def one(state, sy):
            Minv = scn.inv_mass_blocks(spec, state)
            rhs = -cfg.erp / cfg.dt / cfg.dt * sy.err
            return mf.solve_lcp_matrix_free(
                sy.blocks, sy.b0, sy.b1, Minv, rhs, sy.is_eq, sy.lo, sy.hi,
                iters=cfg.solver_iters, omega=cfg.jacobi_omega,
                beta=cfg.jacobi_beta, cfm=float(cfg.cfm_always),
            )
        return jax.vmap(one)(states, sysc)

    t_solve = timeit(solve, states, sysc)
    print(f"LCP solve (60) : {t_solve*1e3:8.2f} ms")
    print(f"unaccounted    : {(t_full - t_c - t_build - t_solve)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
