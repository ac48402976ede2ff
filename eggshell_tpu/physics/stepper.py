"""Constraint-based time steppers — the ODE-style velocity stepper.

TPU-native re-design of the reference's integrators
(eggshell/ensembles.cc:390-666):

  step_ode             ERP/CFM velocity stepping + mixed LCP + midpoint
                       position update (ref StepVelocities_ODE :563-575,
                       StepPositions_ODE :577-591)
  step_explicit_euler  equality-only path (ref :540-561); unlike the
                       reference — whose JDotV for joints is a Panic stub
                       (ensembles.cc:96-97) — the JdotV term is actually
                       implemented here (ref joints.cc:37-47 formulas)
  init_stabilize       position relaxation to the constraint manifold
                       (ref :602-622)
  post_stabilize       position+velocity relaxation (ref :624-657); this
                       build refreshes contact geometry every iteration
                       (the reference reuses the stale contact set)

All functions take one scene; batch with `jax.vmap`, roll out with
`jax.lax.scan`, distribute with `shard_map` (see parallel/).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from eggshell_tpu.ops import lcp, lcp_direct
from eggshell_tpu.ops import quaternion as quat
from eggshell_tpu.physics import scene as scn
from eggshell_tpu.physics.constraints import ConstraintSystem, build_constraints
from eggshell_tpu.physics.contacts import ContactSet, make_contacts
from eggshell_tpu.physics.scene import SceneSpec, State
from eggshell_tpu.utils.config import SimConfig, SolverKind


# ---------------------------------------------------------------------------
# System matrix


def _flat_J(sys: ConstraintSystem) -> jax.Array:
    m = sys.num_rows
    return sys.J.reshape(m, -1)


def system_matrix(
    spec: SceneSpec, state: State, sys: ConstraintSystem, cfg: SimConfig
) -> jax.Array:
    """A = J M^-1 J^T with CFM and masked-lane unit diagonal.

    Inactive rows have zero J, so they decouple; their diagonal is set to
    the max active diagonal, which keeps cond(A) equal to the active
    block's condition number (max diag <= max eig and >= min eig for PSD).

    CFM policy (ref ensembles.cc:510-521): with `conditional_cfm`, add
    cfg.cfm * I on active rows only when the estimated condition number
    exceeds cfg.good_condition_number; otherwise add cfg.cfm_always
    unconditionally (TPU fast path).
    """
    Minv = scn.inv_mass_blocks(spec, state)
    JM = jnp.einsum("mnk,nkl->mnl", sys.J, Minv)
    A = jnp.einsum("mnl,onl->mo", JM, sys.J)

    diag_scale = jnp.max(
        jnp.where(sys.row_active, jnp.diagonal(A), 0.0)
    )
    diag_scale = jnp.where(diag_scale > 0, diag_scale, 1.0)
    A = A + jnp.diag(jnp.where(sys.row_active, 0.0, diag_scale))

    if cfg.conditional_cfm:
        if cfg.cond_estimator == "exact":
            # Exact spectrum — matches the reference's SVD-based
            # CheckMatrixCondition decision bit-for-bit (utils.cc:256-261),
            # required by the golden-parity gate.
            eigs = jnp.linalg.eigvalsh(A)
            lam_max = eigs[-1]
            lam_min = eigs[0]
        else:
            # Cheap estimate (ref's check is advisory, ensembles.cc:514):
            # lambda_max by power iteration, lambda_min by inverse
            # iteration through one Cholesky factor — ~5x cheaper than a
            # full eigendecomposition at these sizes, same O(m^3) solve
            # the DIRECT path performs anyway.
            m = A.shape[0]
            v = jnp.full((m,), 1.0 / jnp.sqrt(m), A.dtype)

            def pow_it(v, _):
                w = A @ v
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-300), None

            v, _ = jax.lax.scan(pow_it, v, None, length=12)
            lam_max = v @ (A @ v)
            L = jnp.linalg.cholesky(A)

            def inv_it(v, _):
                w = jax.scipy.linalg.cho_solve((L, True), v)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-300), None

            u, _ = jax.lax.scan(inv_it, v, None, length=12)
            lam_min = u @ (A @ u)
            # a failed factorization (singular A) must read as "bad"
            lam_min = jnp.where(jnp.isfinite(lam_min), lam_min, 0.0)
        bad = (lam_min <= 0) | (
            lam_max / jnp.maximum(lam_min, 1e-300)
            > cfg.good_condition_number
        )
        cfm = jnp.where(bad, cfg.cfm, 0.0)
    else:
        cfm = jnp.asarray(cfg.cfm_always, A.dtype)
    return A + jnp.diag(jnp.where(sys.row_active, cfm, 0.0))


def _solve_lambda(A, rhs, sys: ConstraintSystem, cfg: SimConfig):
    if cfg.solver == SolverKind.DIRECT:
        # IFT-VJP wrapper: the pivot loop itself is a while_loop (not
        # reverse-differentiable), but the solution's active set gives
        # the exact adjoint — jax.grad works through the oracle path
        # too (ops/lcp_direct.mixed_constraints_solver_implicit).
        return lcp_direct.mixed_constraints_solver_implicit(
            A, rhs, sys.is_eq, sys.lo, sys.hi
        )
    method = {
        SolverKind.PGS: "pgs",
        SolverKind.JACOBI: "jacobi",
        SolverKind.SOR: "sor",
    }[cfg.solver]
    check_tol = cfg.solver_tol if cfg.solver_tol > 0 else None
    from eggshell_tpu.utils.config import FrictionModel

    coulomb = cfg.friction_model == FrictionModel.COULOMB_PYRAMID
    return lcp.solve_lcp(
        A, rhs, sys.is_eq, sys.lo, sys.hi,
        iters=cfg.solver_iters, method=method, check_tol=check_tol,
        omega=cfg.sor_omega, jacobi_omega=cfg.jacobi_omega,
        jacobi_beta=cfg.jacobi_beta,
        couple=sys.couple if coulomb else None,
        mu=cfg.friction_mu if coulomb else 0.0,
        jacobi_block=bool(cfg.jacobi_block),
    )


# ---------------------------------------------------------------------------
# ODE-style step


def _pre_solve(spec, state, cfg, ext_force):
    """Everything up to the lambda solve: contacts, constraints, rhs, A."""
    dt = cfg.dt
    cs = make_contacts(spec, state, cfg)
    sys = build_constraints(spec, state, cs, cfg)

    u = scn.pack_velocity(state)                 # (n, 6)
    Minv = scn.inv_mass_blocks(spec, state)
    F = scn.external_forces(spec, state, cfg.gravity)
    if ext_force is not None:
        F = F + ext_force
    MinvF = jnp.einsum("nij,nj->ni", Minv, F)

    # rhs = -erp/dt^2 err - J (v/dt + Minv F)   (ref :563-571)
    rhs = -cfg.erp / dt / dt * sys.err - jnp.einsum(
        "mnk,nk->m", sys.J, u / dt + MinvF
    )
    A = system_matrix(spec, state, sys, cfg)
    return cs, sys, A, rhs, u, Minv, F


def _post_solve(state, cfg, sys, lam, u, Minv, F):
    """v_dot = Minv (F + J^T lambda); midpoint position update
    (ref :498-538, :577-591)."""
    dt = cfg.dt
    JTlam = jnp.einsum("mnk,m->nk", sys.J, lam)
    vdot = jnp.einsum("nij,nj->ni", Minv, F + JTlam)
    u_new = u + dt * vdot

    u_mid = 0.5 * (u + u_new)
    p_new = state.p + dt * u_mid[:, :3]
    q_new = quat.integrate_quat(state.q, u_mid[:, 3:], dt)
    return State(p=p_new, v=u_new[:, :3], q=q_new, w=u_new[:, 3:])


def _step_matrix_free(spec, state, cfg, ext_force, cs=None):
    """ODE step for ONE LARGE scene: compact two-body constraint blocks +
    matrix-free projected Jacobi — O(n + K) memory, JMJ^T never formed
    (ref sparse_iterations_utils.cc:624-695 CalculateSparseJMJtX, the
    reference's answer to exactly this scaling problem).  `cs` injects a
    precomputed contact set (the batched path detects contacts for all
    scenes with the lane-major Pallas narrowphase first)."""
    from eggshell_tpu.ops import lcp_matrix_free as mf
    from eggshell_tpu.physics.constraints import build_compact_constraints

    dt = cfg.dt
    n = spec.num_bodies
    if cs is None:
        cs = make_contacts(spec, state, cfg)
    sysc = build_compact_constraints(spec, state, cs, cfg)

    u = scn.pack_velocity(state)
    Minv = scn.inv_mass_blocks(spec, state)
    F = scn.external_forces(spec, state, cfg.gravity)
    if ext_force is not None:
        F = F + ext_force
    MinvF = jnp.einsum("nij,nj->ni", Minv, F)

    rhs = -cfg.erp / dt / dt * sysc.err - mf.j_v(
        sysc.blocks, sysc.b0, sysc.b1, u / dt + MinvF
    )
    lam = mf.solve_lcp_matrix_free(
        sysc.blocks, sysc.b0, sysc.b1, Minv, rhs, sysc.is_eq,
        sysc.lo, sysc.hi,
        iters=cfg.solver_iters, omega=cfg.jacobi_omega,
        beta=cfg.jacobi_beta, cfm=float(cfg.cfm_always),
    )
    JTlam = mf.jt_x(sysc.blocks, sysc.b0, sysc.b1, lam, n)
    vdot = jnp.einsum("nij,nj->ni", Minv, F + JTlam)
    u_new = u + dt * vdot
    u_mid = 0.5 * (u + u_new)
    p_new = state.p + dt * u_mid[:, :3]
    q_new = quat.integrate_quat(state.q, u_mid[:, 3:], dt)
    return State(p=p_new, v=u_new[:, :3], q=q_new, w=u_new[:, 3:]), cs


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_ode(
    spec: SceneSpec,
    state: State,
    cfg: SimConfig,
    ext_force: Optional[jax.Array] = None,
) -> Tuple[State, ContactSet]:
    """One OPEN_DYNAMICS_ENGINE step (ref Ensemble::Step, ensembles.cc:390-427
    with g = OPEN_DYNAMICS_ENGINE).  Returns (new_state, contact_set).

    `ext_force` (n, 6) adds control wrenches [force; torque] per body on
    top of gravity + gyroscopic terms — the MPC control input (a new
    capability; the reference has no actuation).

    With cfg.solver == SolverKind.MATRIX_FREE the step never forms the
    dense Jacobian or JMJ^T — the large-single-scene path (hundreds to
    thousands of bodies, see `_step_matrix_free`)."""
    if cfg.solver == SolverKind.MATRIX_FREE:
        return _step_matrix_free(spec, state, cfg, ext_force)
    cs, sys, A, rhs, u, Minv, F = _pre_solve(spec, state, cfg, ext_force)
    lam = _solve_lambda(A, rhs, sys, cfg)
    return _post_solve(state, cfg, sys, lam, u, Minv, F), cs


def _fused_step_packed(spec, states, cfg, css, ext_forces,
                       return_lam: bool = False):
    """All-kernel batched step: narrowphase contacts (already in `css`)
    -> J-assembly kernel -> A-formation kernel -> packed momentum-Jacobi
    LCP -> integrate kernel.  The compact J blocks, system matrix, and
    impulses all stay in the packed (8x128 scenarios) tile layout — no
    XLA einsums or relayouts between kernels (SURVEY §2.8 item 3: the
    whole contact solve is the kernel fast path).

    Ball joints ride the same pipeline as always-active equality lanes
    prepended before the contact lanes (matching the XLA row order,
    physics/constraints.build_constraints): slot anchors a0/a1, identity
    frame, unclamped bounds (ref joints.cc:13-35)."""
    from eggshell_tpu.ops.amat_kernel import contact_system_matrix_packed
    from eggshell_tpu.ops.integrate_kernel import integrate_step
    from eggshell_tpu.ops.jassembly_kernel import (
        _pack,
        contact_jacobian_blocks,
    )
    from eggshell_tpu.ops.pgs_kernel import solve_lcp_jacobi_packed
    from eggshell_tpu.ops.prep_kernel import prep_packed

    B = states.p.shape[0]
    n = spec.num_bodies
    K = css.b0.shape[1]
    Jn = spec.num_joints
    dtype = states.p.dtype
    interpret = jax.default_backend() != "tpu"

    from eggshell_tpu.physics.contacts import effective_depth

    css = css._replace(depth=effective_depth(css.depth, cfg))

    # Body prep (R, world inertia, forces, uhat) as one packed kernel —
    # the vmapped XLA equivalent ran at 3/128 lane occupancy.
    ext_b = None
    if ext_forces is not None:
        ext_b = jnp.broadcast_to(ext_forces, (B, n, 6)) \
            if ext_forces.ndim == 2 else ext_forces
    uhat_p, invig_p, f_p = prep_packed(
        states.q, states.v, states.w, spec.inv_mass,
        spec.inertia_body, spec.inv_inertia_body,
        dt=float(cfg.dt), gravity=tuple(cfg.gravity),
        interpret=interpret, ext_forces=ext_b,
    )

    if Jn > 0:
        a0, a1 = jax.vmap(lambda st: _joint_anchors(spec, st))(states)
        jb0 = jnp.broadcast_to(spec.joint_b0, (B, Jn)).astype(jnp.int32)
        jb1 = jnp.broadcast_to(spec.joint_b1, (B, Jn)).astype(jnp.int32)
        zhat = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype), (B, Jn, 3)
        )
        b0 = jnp.concatenate([jb0, css.b0], axis=1)
        b1 = jnp.concatenate([jb1, css.b1], axis=1)
        pos = jnp.concatenate([a0, css.position], axis=1)
        pos1 = jnp.concatenate([a1, css.position], axis=1)
        nrm = jnp.concatenate([zhat, css.normal], axis=1)
        dep = jnp.concatenate([jnp.zeros((B, Jn), dtype), css.depth], axis=1)
        act = jnp.concatenate(
            [jnp.ones((B, Jn), bool), css.active], axis=1
        )
        eq = jnp.concatenate(
            [jnp.ones((B, Jn), dtype), jnp.zeros((B, K), dtype)], axis=1
        )
        Kx = Jn + K
    else:
        b0, b1, pos, pos1 = css.b0, css.b1, css.position, css.position
        nrm, dep, act = css.normal, css.depth, css.active
        eq = None
        Kx = K

    _, _, packed = contact_jacobian_blocks(
        b0, b1, pos, nrm, dep, act,
        states.p, None, erp_dt2=float(cfg.erp / cfg.dt / cfg.dt),
        interpret=interpret, also_packed=True,
        position1=pos1, is_eq=eq, uhat_packed=uhat_p,
    )

    invm = jnp.broadcast_to(spec.inv_mass.astype(dtype), (B, n))
    invm_packed, _, _, _ = _pack(invm, n)

    A_packed, diag_packed = contact_system_matrix_packed(
        packed["jc"], packed["b0"], packed["b1"], packed["act"],
        invm_packed, invig_p, K=Kx, n=n,
        cfm=float(cfg.cfm_always), interpret=interpret,
    )
    lam_packed = solve_lcp_jacobi_packed(
        A_packed, packed["rhs"], packed["act"], K=Kx,
        mu=float(cfg.friction_bound), iters=cfg.solver_iters,
        omega=float(cfg.jacobi_omega), beta=float(cfg.jacobi_beta),
        interpret=interpret, eq_packed=packed["eq"],
        block=bool(cfg.jacobi_block), diag_packed=diag_packed,
        pyramid_mu=_pyramid_mu(cfg),
    )
    pn, qn, vn, wn = integrate_step(
        None, None, b0, b1, states.p, states.q, states.v,
        states.w, None, None, dt=float(cfg.dt), interpret=interpret,
        jc_packed=packed["jc"], lam_packed=lam_packed,
        invig_packed=invig_p, f_packed=f_p,
        inv_mass=spec.inv_mass.astype(dtype),
    )
    out = State(p=pn, v=vn, q=qn, w=wn)
    if return_lam:
        return out, _unpack_lam(lam_packed, B, 3 * Kx)
    return out


def _unpack_lam(lam_packed, B, m):
    """(nt, mp, 8, 128) packed impulses -> (B, m) row-major lambda."""
    nt, mp = lam_packed.shape[0], lam_packed.shape[1]
    from eggshell_tpu.ops.jassembly_kernel import TILE

    flat = lam_packed.transpose(0, 2, 3, 1).reshape(nt * TILE, mp)
    return flat[:B, :m]


def _pyramid_mu(cfg) -> float:
    """Static Coulomb-pyramid coefficient for the packed LCP kernel
    (0.0 = box friction; the reference declares COULOMB_PYRAMID but
    leaves it unimplemented, eggshell/contact.cc:150-152)."""
    from eggshell_tpu.utils.config import FrictionModel

    return (
        float(cfg.friction_mu)
        if cfg.friction_model == FrictionModel.COULOMB_PYRAMID else 0.0
    )


def _joint_anchors(spec, state):
    """World anchor points of the ball joints: a0 on body 0, a1 on body
    1 (the fixed world anchor joint_c1 when b1 = -1).  (Jn, 3) each."""
    R = quat.quat_to_mat(state.q)
    a0 = state.p[spec.joint_b0] + jnp.einsum(
        "jik,jk->ji", R[spec.joint_b0], spec.joint_c0
    )
    anchored = spec.joint_b1 < 0
    jb1 = jnp.where(anchored, 0, spec.joint_b1)
    a1 = jnp.where(
        anchored[:, None],
        spec.joint_c1,
        state.p[jb1] + jnp.einsum("jik,jk->ji", R[jb1], spec.joint_c1),
    )
    return a0, a1


def _all_kernel_eligible(spec, states, cfg) -> bool:
    """The fully kernel-chained step covers TILE-aligned batch sizes
    with the kernel narrowphase enabled.  Jointed scenes ride it too:
    joint lanes are prepended to the compact kernel's contact lanes in
    the packed layout, with the joint-contact dedupe applied packed
    (see `_fused_step_all_kernel`)."""
    from eggshell_tpu.ops.compact_kernel import TILE

    use_kernel = cfg.contact_kernel
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    return use_kernel and states.p.shape[0] % TILE == 0


def _fused_step_all_kernel(spec, states, cfg, ext_forces,
                           return_lam: bool = False):
    """Fully kernel-chained batched step: narrowphase -> compaction +
    dedupe (ops/compact_kernel) -> J-assembly -> A-formation -> packed
    LCP -> integrate, with every intermediate staying in the packed
    scene-on-lanes tile layout — no XLA compaction matmuls, cumsums, or
    pack/unpack relayouts anywhere in the chain.  Round-4 on-chip
    profiling showed that XLA glue costing more than all five kernels
    combined (~1 ms of the 1.7 ms step at B=4096)."""
    import math

    from eggshell_tpu.ops import compact_kernel as ck
    from eggshell_tpu.ops.amat_kernel import contact_system_matrix_packed
    from eggshell_tpu.ops.collision_kernel import collide_boxes_lanes_packed
    from eggshell_tpu.ops.integrate_kernel import integrate_step
    from eggshell_tpu.ops.jassembly_kernel import (
        _pack,
        contact_jacobian_blocks_from_packed,
    )
    from eggshell_tpu.ops.pgs_kernel import solve_lcp_jacobi_packed
    from eggshell_tpu.ops.prep_kernel import prep_packed

    B = states.p.shape[0]
    n = spec.num_bodies
    K = cfg.contact_capacity
    dtype = states.p.dtype
    interpret = jax.default_backend() != "tpu"
    nt = B // ck.TILE

    # body prep (R, world inertia, forces, uhat) — one packed kernel
    ext_b = None
    if ext_forces is not None:
        ext_b = jnp.broadcast_to(ext_forces, (B, n, 6)) \
            if ext_forces.ndim == 2 else ext_forces
    uhat_p, invig_p, f_p = prep_packed(
        states.q, states.v, states.w, spec.inv_mass,
        spec.inertia_body, spec.inv_inertia_body,
        dt=float(cfg.dt), gravity=tuple(cfg.gravity),
        interpret=interpret, ext_forces=ext_b,
    )

    # scene-layout state packs (the only layout changes in the chain;
    # broadcast spec constants hoist out of any scan)
    pt, _, _, _ = _pack(states.p, 3 * n)
    qt, _, _, _ = _pack(states.q, 4 * n)
    hs_b = jnp.broadcast_to(
        spec.half_extents.astype(dtype).reshape(1, 3 * n), (B, 3 * n)
    )
    hst, _, _, _ = _pack(hs_b, 3 * n)
    gen_b = jnp.broadcast_to(
        spec.ground_enabled.astype(dtype).reshape(1, n), (B, n)
    )
    gent, _, _, _ = _pack(gen_b, n)

    # pair selection (static all-pairs, or per-scene broadphase subset)
    P = spec.num_pairs
    if P == 0:
        # ground-only scenes (box_drop): no narrowphase at all
        pp_pos = pp_nrm = pp_dep = pp_act = pb0 = pb1 = None
        Pk = 0
    R = quat.quat_to_mat(states.q) if P > 0 else None
    if P == 0:
        pass
    elif 0 < cfg.pair_capacity < P:
        from eggshell_tpu.ops import broadphase

        def select(state_one):
            return broadphase.select_scene_pairs(spec, state_one, cfg)

        pi, pj, gate = jax.vmap(select)(states)        # (B, pc)
        Pk = cfg.pair_capacity
        gate_f = gate.astype(dtype)
        bidx = jnp.arange(B)[:, None]
        p_i, R_i = states.p[bidx, pi], R[bidx, pi]
        p_j, R_j = states.p[bidx, pj], R[bidx, pj]
        he_i, he_j = spec.half_extents[pi], spec.half_extents[pj]
    else:
        Pk = P
        pi = jnp.broadcast_to(spec.pair_i, (B, P))
        pj = jnp.broadcast_to(spec.pair_j, (B, P))
        gate_f = jnp.ones((B, P), dtype)
        p_i, R_i = states.p[:, spec.pair_i], R[:, spec.pair_i]
        p_j, R_j = states.p[:, spec.pair_j], R[:, spec.pair_j]
        he_i = jnp.broadcast_to(spec.half_extents[spec.pair_i], (B, Pk, 3))
        he_j = jnp.broadcast_to(spec.half_extents[spec.pair_j], (B, Pk, 3))

    if P > 0:
        ngroups = -(-Pk // ck.GROUP)
        Pkp = ngroups * ck.GROUP

        def flat_pairs(x):
            """(B, Pk, ...) -> scene-tile-major flat (nt*Pkp*TILE, ...):
            entry ((t*Pkp + pk)*TILE + s) = scene (t*TILE + s), pair pk
            — so the narrowphase pack puts pair pk of scene-tile t at
            row t*Pkp + pk with scenes on (sublane, lane)."""
            trail = x.shape[2:]
            c = 1
            for d in trail:
                c *= d
            xp = x.reshape(B, Pk, c)
            if Pkp != Pk:
                xp = jnp.pad(xp, ((0, 0), (0, Pkp - Pk), (0, 0)))
            out = xp.reshape(nt, ck.TILE, Pkp, c).transpose(0, 2, 1, 3)
            return out.reshape((nt * Pkp * ck.TILE,) + trail)

        pp_pos, pp_nrm, pp_dep, pp_act = collide_boxes_lanes_packed(
            flat_pairs(p_i), flat_pairs(R_i), flat_pairs(he_i),
            flat_pairs(p_j), flat_pairs(R_j), flat_pairs(he_j),
            interpret=interpret,
        )
        gate_p = ck.pack_pairs(gate_f[:, :, None], nt, Pkp)
        pp_act = pp_act * gate_p                  # same layout: fused
        pb0 = ck.pack_pairs(pi.astype(dtype)[:, :, None], nt, Pkp)
        pb1 = ck.pack_pairs(pj.astype(dtype)[:, :, None], nt, Pkp)

    cap = None
    if not math.isinf(cfg.max_correcting_vel):
        cap = float(
            cfg.max_correcting_vel * cfg.dt / max(cfg.erp, 1e-12)
        )
    b0t, b1t, post, nrmt, dept, actt = ck.compact_contacts_packed(
        pt, qt, hst, gent, pp_pos, pp_nrm, pp_dep, pp_act, pb0, pb1,
        K=K, n=n, Pk=Pk, nt=nt,
        eps2=float(cfg.min_constraint_distance**2),
        depth_cap=cap, interpret=interpret,
    )
    eqt = jnp.zeros_like(actt)
    pos1t = post
    Jn = spec.num_joints
    Kx = K
    if Jn > 0:
        # Joints ride the same packed pipeline as always-active equality
        # lanes PREPENDED to the contact lanes (matching the XLA twin's
        # row order, ref joints.cc:13-35).  Anchor math is O(B*Jn) XLA;
        # everything stays in the scene-on-lanes layout.
        a0, a1 = jax.vmap(lambda st: _joint_anchors(spec, st))(states)
        jb0 = jnp.broadcast_to(
            spec.joint_b0.astype(dtype), (B, Jn)
        )
        jb1 = jnp.broadcast_to(spec.joint_b1.astype(dtype), (B, Jn))
        jb0t, _, _, _ = _pack(jb0, Jn)                 # (nt, Jn, 8, 128)
        jb1t, _, _, _ = _pack(jb1, Jn)
        ja0t, _, _, _ = _pack(a0.astype(dtype), 3 * Jn)
        ja1t, _, _, _ = _pack(a1.astype(dtype), 3 * Jn)
        anchored = spec.joint_b1 < 0
        jpos = jnp.where(anchored[None, :, None], a0, 0.5 * (a0 + a1))
        jpt, _, _, _ = _pack(jpos.astype(dtype), 3 * Jn)

        # Joint-contact dedupe in the packed layout (ref
        # ensembles.cc:291-300 via contacts._dedupe drop_jc): a contact
        # between the same body pair closer than eps to the joint point
        # is dropped (active cleared, ids kept — XLA convention).
        lo_c = jnp.minimum(b0t, b1t)                   # (nt, K, 8, 128)
        hi_c = jnp.maximum(b0t, b1t)
        pair_ok = lo_c >= 0
        jlo = jnp.minimum(jb0t, jb1t)                  # (nt, Jn, 8, 128)
        jhi = jnp.maximum(jb0t, jb1t)
        j_ok = jlo >= 0
        eps2 = float(cfg.min_constraint_distance**2)
        cx, cy, cz = post[:, 0::3], post[:, 1::3], post[:, 2::3]
        jx, jy, jz = jpt[:, 0::3], jpt[:, 1::3], jpt[:, 2::3]
        d2 = (
            (cx[:, :, None] - jx[:, None, :]) ** 2
            + (cy[:, :, None] - jy[:, None, :]) ** 2
            + (cz[:, :, None] - jz[:, None, :]) ** 2
        )                                              # (nt, K, Jn, 8, 128)
        same = (
            (lo_c[:, :, None] == jlo[:, None, :])
            & (hi_c[:, :, None] == jhi[:, None, :])
            & j_ok[:, None, :]
            & pair_ok[:, :, None]
        )
        drop = jnp.any(same & (d2 < eps2), axis=2).astype(dtype)
        actt = actt * (1.0 - drop)

        zhat = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype), (B, Jn, 3)
        )
        jnrm, _, _, _ = _pack(zhat, 3 * Jn)
        ones_j = jnp.ones_like(jb0t)
        b0t = jnp.concatenate([jb0t, b0t], axis=1)
        b1t = jnp.concatenate([jb1t, b1t], axis=1)
        pos1t = jnp.concatenate([ja1t, post], axis=1)
        post = jnp.concatenate([ja0t, post], axis=1)
        nrmt = jnp.concatenate([jnrm, nrmt], axis=1)
        dept = jnp.concatenate([jnp.zeros_like(jb0t), dept], axis=1)
        actt = jnp.concatenate([ones_j, actt], axis=1)
        eqt = jnp.concatenate([ones_j, eqt], axis=1)
        Kx = Jn + K

    packed = contact_jacobian_blocks_from_packed(
        b0t, b1t, post, pos1t, nrmt, dept, actt, eqt, pt, uhat_p,
        K=Kx, n=n, nt=nt, erp_dt2=float(cfg.erp / cfg.dt / cfg.dt),
        interpret=interpret,
    )

    invm = jnp.broadcast_to(spec.inv_mass.astype(dtype), (B, n))
    invm_packed, _, _, _ = _pack(invm, n)
    A_packed, diag_packed = contact_system_matrix_packed(
        packed["jc"], packed["b0"], packed["b1"], packed["act"],
        invm_packed, invig_p, K=Kx, n=n,
        cfm=float(cfg.cfm_always), interpret=interpret,
    )
    lam_packed = solve_lcp_jacobi_packed(
        A_packed, packed["rhs"], packed["act"], K=Kx,
        mu=float(cfg.friction_bound), iters=cfg.solver_iters,
        omega=float(cfg.jacobi_omega), beta=float(cfg.jacobi_beta),
        interpret=interpret, eq_packed=packed["eq"],
        block=bool(cfg.jacobi_block), diag_packed=diag_packed,
        pyramid_mu=_pyramid_mu(cfg),
    )
    pn, qn, vn, wn = integrate_step(
        None, None, None, None, states.p, states.q, states.v,
        states.w, None, None, dt=float(cfg.dt), interpret=interpret,
        jc_packed=packed["jc"], lam_packed=lam_packed,
        invig_packed=invig_p, f_packed=f_p,
        inv_mass=spec.inv_mass.astype(dtype),
        b0_packed=b0t, b1_packed=b1t, K=Kx,
    )
    out = State(p=pn, v=vn, q=qn, w=wn)
    if return_lam:
        return out, _unpack_lam(lam_packed, B, 3 * Kx)
    return out


def _step_xla_twin(spec, states, cfg, ext_forces, lam_saved=None):
    """Differentiable XLA twin of `_fused_step_packed`: identical math
    (joints as equality lanes + box-bound contacts, cfm_always, the same
    heavy-ball/block Jacobi sweep rule) but built from vmapped XLA ops
    with an implicit-function-theorem LCP (ops.lcp.solve_lcp_implicit) —
    the backward pass of the kernel hot path.  Gradients through the
    solve cost ONE adjoint linear solve instead of reverse-unrolling
    cfg.solver_iters sweeps (the reference's my_jet.h threads derivatives
    through its production FEM pipeline; this is the dynamics analog).

    `lam_saved` (B, m): impulses already computed by the Pallas forward
    (lane-for-lane parity with this twin's row order) — the LCP sweeps
    are skipped entirely and the saved solution is adopted with the same
    IFT adjoint (ops.lcp.adopt_lcp_solution)."""
    from eggshell_tpu.physics.contacts import make_contacts_batched

    # default (None) narrowphase: the Pallas kernel on TPU with its
    # differentiable custom VJP (ops/collision_kernel
    # .collide_boxes_lanes_diff) — the twin's forward recompute inside
    # the fused step's backward pass was paying the slow XLA
    # narrowphase for no gradient benefit (kernel-vs-XLA narrowphase
    # gradients are pinned equal by tests/test_diff_kernel.py).
    css = make_contacts_batched(spec, states, cfg)
    in_axes = (0, 0, 0 if ext_forces is not None else None)

    def pre(state, cs_one, ext):
        sys = build_constraints(spec, state, cs_one, cfg)
        u = scn.pack_velocity(state)
        Minv = scn.inv_mass_blocks(spec, state)
        F = scn.external_forces(spec, state, cfg.gravity)
        if ext is not None:
            F = F + ext
        MinvF = jnp.einsum("nij,nj->ni", Minv, F)
        rhs = -cfg.erp / cfg.dt / cfg.dt * sys.err - jnp.einsum(
            "mnk,nk->m", sys.J, u / cfg.dt + MinvF
        )
        A = system_matrix(spec, state, sys, cfg)
        return sys, A, rhs, u, Minv, F

    sys, A, rhs, u, Minv, F = jax.vmap(pre, in_axes=in_axes)(
        states, css, ext_forces
    )
    from eggshell_tpu.utils.config import FrictionModel as _FM2

    pyramid = cfg.friction_model == _FM2.COULOMB_PYRAMID
    if lam_saved is not None:
        lo_t, hi_t = sys.lo, sys.hi
        if pyramid:
            # effective bounds at the saved solution (+-mu lambda_n),
            # so the IFT active-set classification sees the same caps
            # the coupled sweeps enforced
            lo_t, hi_t = jax.vmap(
                lambda x, l, h, c: lcp._bounds(
                    x, l, h, c, float(cfg.friction_mu)
                )
            )(lam_saved, sys.lo, sys.hi, sys.couple)
        lam = jax.vmap(lcp.adopt_lcp_solution)(
            A, rhs, sys.is_eq, lo_t, hi_t, lam_saved
        )
    else:
        lam = jax.vmap(
            lambda a, r, e, l, h: lcp.solve_lcp_implicit(
                a, r, e, l, h, cfg.solver_iters, "jacobi",
                cfg.jacobi_omega, 1e-8, cfg.jacobi_beta,
                bool(cfg.jacobi_block),
            )
        )(A, rhs, sys.is_eq, sys.lo, sys.hi)
    return jax.vmap(
        lambda st, s, l, uu, mi, ff: _post_solve(st, cfg, s, l, uu, mi, ff)
    )(states, sys, lam, u, Minv, F)


@functools.lru_cache(maxsize=None)
def _fused_step_diff(cfg: SimConfig):
    """custom_vjp wrapper making the fused Pallas step differentiable:
    forward = the five-kernel packed pipeline (`_fused_step_packed`, the
    bench hot path); backward = jax.vjp of the XLA twin with the IFT LCP
    adjoint (`_step_xla_twin`).  The twin recomputes the forward pieces
    it needs (standard rematerialisation), so nothing is saved but the
    primal inputs.  Cached per SimConfig (hashable, static)."""

    def _primal(spec, states, ext_forces, return_lam=False):
        from eggshell_tpu.physics.contacts import make_contacts_batched

        if _all_kernel_eligible(spec, states, cfg):
            return _fused_step_all_kernel(spec, states, cfg, ext_forces,
                                          return_lam=return_lam)
        css = make_contacts_batched(spec, states, cfg)
        return _fused_step_packed(spec, states, cfg, css, ext_forces,
                                  return_lam=return_lam)

    @jax.custom_vjp
    def step(spec, states, ext_forces):
        return _primal(spec, states, ext_forces)

    def fwd(spec, states, ext_forces):
        # Save the kernel forward's own impulses: the backward twin
        # adopts them (IFT adjoint) instead of re-running the LCP
        # sweeps inside the VJP recompute — the recompute is contacts +
        # assembly + integrate only (round-4 VERDICT weak #1).
        out, lam = _primal(spec, states, ext_forces, return_lam=True)
        return out, (spec, states, ext_forces, lam)

    def bwd(res, bar_out):
        spec, states, ext_forces, lam = res
        _, vjp = jax.vjp(
            lambda sp, st, ex: _step_xla_twin(sp, st, cfg, ex,
                                              lam_saved=lam),
            spec, states, ext_forces,
        )
        return vjp(bar_out)

    step.defvjp(fwd, bwd)
    return step


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_ode_batched(
    spec: SceneSpec,
    states: State,
    cfg: SimConfig,
    ext_forces: Optional[jax.Array] = None,
) -> State:
    """Batched step over a leading scenario axis.  With
    SolverKind.JACOBI_KERNEL the per-scenario QPs are solved by ONE fused
    Pallas kernel call (batch mapped onto TPU lanes, all sweeps in VMEM)
    instead of a vmapped per-scenario solve — the hot path of the
    rollouts/s north star.  The fused path is differentiable: jax.grad
    flows through a custom VJP whose backward is the XLA twin with an
    implicit-function-theorem LCP adjoint (see `_fused_step_diff`)."""
    from eggshell_tpu.physics.contacts import make_contacts_batched
    from eggshell_tpu.utils.config import FrictionModel as _FM

    use_fused_pre = (
        cfg.solver == SolverKind.JACOBI_KERNEL
        and cfg.friction_model in (_FM.BOX, _FM.COULOMB_PYRAMID)
        and not cfg.conditional_cfm
    )
    if use_fused_pre:
        return _fused_step_diff(cfg)(spec, states, ext_forces)

    if cfg.solver == SolverKind.MATRIX_FREE:
        # Batched large-scene tier: contacts for ALL scenes via the
        # lane-major Pallas narrowphase (one kernel call), then vmap the
        # O(K)-memory compact-block step (ref
        # sparse_iterations_utils.cc:624-695) — a batch of piles never
        # forms any (3K)^2 matrix.
        css = make_contacts_batched(spec, states, cfg)
        if ext_forces is None:
            return jax.vmap(
                lambda st, cs: _step_matrix_free(spec, st, cfg, None,
                                                 cs=cs)[0]
            )(states, css)
        ext_b = (
            jnp.broadcast_to(ext_forces, states.p.shape[:1] + ext_forces.shape)
            if ext_forces.ndim == 2 else ext_forces
        )
        return jax.vmap(
            lambda st, cs, ex: _step_matrix_free(spec, st, cfg, ex,
                                                 cs=cs)[0]
        )(states, css, ext_b)

    css = make_contacts_batched(spec, states, cfg)

    in_axes = (0, 0, 0 if ext_forces is not None else None)

    def pre(state, cs_one, ext):
        sys = build_constraints(spec, state, cs_one, cfg)
        u = scn.pack_velocity(state)
        Minv = scn.inv_mass_blocks(spec, state)
        F = scn.external_forces(spec, state, cfg.gravity)
        if ext is not None:
            F = F + ext
        MinvF = jnp.einsum("nij,nj->ni", Minv, F)
        rhs = -cfg.erp / cfg.dt / cfg.dt * sys.err - jnp.einsum(
            "mnk,nk->m", sys.J, u / cfg.dt + MinvF
        )
        A = system_matrix(spec, state, sys, cfg)
        return sys, A, rhs, u, Minv, F

    sys, A, rhs, u, Minv, F = jax.vmap(pre, in_axes=in_axes)(
        states, css, ext_forces
    )

    from eggshell_tpu.utils.config import FrictionModel

    use_kernel_solver = cfg.solver == SolverKind.JACOBI_KERNEL and (
        cfg.friction_model != FrictionModel.COULOMB_PYRAMID
    )  # the fused kernel does not implement normal-coupled bounds yet
    if use_kernel_solver:
        from eggshell_tpu.ops.pgs_kernel import solve_lcp_jacobi_pallas

        interpret = jax.default_backend() != "tpu"
        lam = solve_lcp_jacobi_pallas(
            A, rhs, sys.is_eq, sys.lo, sys.hi,
            iters=cfg.solver_iters, omega=cfg.jacobi_omega,
            interpret=interpret, beta=cfg.jacobi_beta,
        )
    else:
        solve_cfg = cfg
        if cfg.solver == SolverKind.JACOBI_KERNEL:
            solve_cfg = cfg.replace(solver=SolverKind.JACOBI)
        lam = jax.vmap(lambda a, r, s: _solve_lambda(a, r, s, solve_cfg))(
            A, rhs, sys
        )

    return jax.vmap(
        lambda st, s, l, uu, mi, ff: _post_solve(st, cfg, s, l, uu, mi, ff)
    )(states, sys, lam, u, Minv, F)


@functools.partial(jax.jit, static_argnames=("cfg", "fixed_point_iters"))
def step_implicit_midpoint(
    spec: SceneSpec,
    state: State,
    cfg: SimConfig,
    ext_force: Optional[jax.Array] = None,
    fixed_point_iters: int = 4,
) -> Tuple[State, ContactSet]:
    """Implicit-midpoint step — IMPLEMENTED, unlike the reference whose
    Integrator::IMPLICIT_MIDPOINT is a Panic stub (ensembles.cc:404,
    :593-600; single-body LIM prototypes only, model.cc:178-266).

    Scheme: u_{n+1} = u_n + dt f(x_mid, u_mid), x_{n+1} advanced with
    u_mid, where x_mid = x_n advanced by dt/2 u_mid and
    u_mid = (u_n + u_{n+1})/2.  Solved by fixed-point iteration (the
    contact LCP is re-solved at the midpoint state each sweep) —
    compiler-friendly: a `lax.fori_loop` of fixed trip count, no Newton
    linearization needed at these step sizes.  Contacts are detected once
    at the start state (consistent with the reference's per-step
    UpdateContacts placement, ensembles.cc:407-410)."""
    dt = cfg.dt
    cs = make_contacts(spec, state, cfg)
    u0 = scn.pack_velocity(state)

    def solve_at(st_mid, u_mid):
        sys = build_constraints(spec, st_mid, cs, cfg)
        Minv = scn.inv_mass_blocks(spec, st_mid)
        F = scn.external_forces(spec, st_mid, cfg.gravity)
        if ext_force is not None:
            F = F + ext_force
        MinvF = jnp.einsum("nij,nj->ni", Minv, F)
        rhs = -cfg.erp / dt / dt * sys.err - jnp.einsum(
            "mnk,nk->m", sys.J, u_mid / dt + MinvF
        )
        A = system_matrix(spec, st_mid, sys, cfg)
        lam = _solve_lambda(A, rhs, sys, cfg)
        JTlam = jnp.einsum("mnk,m->nk", sys.J, lam)
        return jnp.einsum("nij,nj->ni", Minv, F + JTlam)

    def sweep(_, u_mid):
        st_mid = state._replace(
            p=state.p + 0.5 * dt * u_mid[:, :3],
            q=quat.integrate_quat(state.q, u_mid[:, 3:], 0.5 * dt),
            v=u_mid[:, :3],
            w=u_mid[:, 3:],
        )
        vdot = solve_at(st_mid, u_mid)
        u_new = u0 + dt * vdot
        return 0.5 * (u0 + u_new)

    u_mid = jax.lax.fori_loop(0, fixed_point_iters, sweep, u0)
    u_new = 2.0 * u_mid - u0
    new_state = State(
        p=state.p + dt * u_mid[:, :3],
        v=u_new[:, :3],
        q=quat.integrate_quat(state.q, u_mid[:, 3:], dt),
        w=u_new[:, 3:],
    )
    return new_state, cs


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_explicit_euler(spec: SceneSpec, state: State, cfg: SimConfig) -> State:
    """Equality-only explicit Euler (ref :540-561): joints only; contacts
    are not supported by this integrator (ref :397-400 CHECKs)."""
    dt = cfg.dt
    # Empty contact set: all lanes inactive.
    K = cfg.contact_capacity
    dtype = state.p.dtype
    cs = ContactSet(
        b0=jnp.full((K,), -1, jnp.int32), b1=jnp.full((K,), -1, jnp.int32),
        position=jnp.zeros((K, 3), dtype), normal=jnp.zeros((K, 3), dtype),
        depth=jnp.zeros((K,), dtype), active=jnp.zeros((K,), bool),
    )
    sys = build_constraints(spec, state, cs, cfg)
    u = scn.pack_velocity(state)
    Minv = scn.inv_mass_blocks(spec, state)
    F = scn.external_forces(spec, state, cfg.gravity)
    MinvF = jnp.einsum("nij,nj->ni", Minv, F)

    jdotv = jnp.concatenate(
        [_joint_jdotv(spec, state), jnp.zeros((3 * K,), dtype)]
    )
    rhs = -jnp.einsum("mnk,nk->m", sys.J, MinvF) - jdotv
    A = system_matrix(spec, state, sys, cfg)
    lam = jnp.linalg.solve(A, rhs)               # equality-only LDLT analog
    JTlam = jnp.einsum("mnk,m->nk", sys.J, lam)
    vdot = jnp.einsum("nij,nj->ni", Minv, F + JTlam)
    u_new = u + dt * vdot

    p_new = state.p + dt * u[:, :3]              # old velocity (ref :553-560)
    q_new = quat.integrate_quat(state.q, u[:, 3:], dt)
    return State(p=p_new, v=u_new[:, :3], q=q_new, w=u_new[:, 3:])


def _joint_jdotv(spec: SceneSpec, state: State) -> jax.Array:
    """JdotV for ball joints (formula of ref joints.cc:37-47):
    Jdot_b0 = [0, -cross(w0 x (R0 c0))], Jdot_b1 = [0, cross(w1 x (R1 c1))].
    Padded with zeros for the (empty) contact rows."""
    Jn = spec.num_joints
    dtype = state.p.dtype
    if Jn == 0:
        joints_part = jnp.zeros((0,), dtype)
    else:
        R = state.R()
        r0c0 = jnp.einsum("jik,jk->ji", R[spec.joint_b0], spec.joint_c0)
        jb1 = jnp.where(spec.joint_b1 >= 0, spec.joint_b1, 0)
        r1c1 = jnp.einsum("jik,jk->ji", R[jb1], spec.joint_c1)
        w0 = state.w[spec.joint_b0]
        w1 = jnp.where(
            (spec.joint_b1 >= 0)[:, None], state.w[jb1], 0.0
        )
        # Jdot_w0 @ w0 = -(w0 x r0) x w0 = +w0 x (w0 x r0); b1 negated.
        term0 = jnp.cross(w0, jnp.cross(w0, r0c0))
        term1 = jnp.where(
            (spec.joint_b1 >= 0)[:, None],
            -jnp.cross(w1, jnp.cross(w1, r1c1)),
            0.0,
        )
        joints_part = (term0 + term1).reshape(-1)
    return joints_part


# ---------------------------------------------------------------------------
# Stabilization


def position_constraint_error(
    spec: SceneSpec, state: State, cfg: SimConfig, cs: Optional[ContactSet] = None
) -> jax.Array:
    """Stacked joint + contact position errors (ref ensembles.cc:156-171)."""
    if cs is None:
        cs = make_contacts(spec, state, cfg)
    sys = build_constraints(spec, state, cs, cfg)
    return sys.err


def _velocity_relaxation(
    spec: SceneSpec, state: State, sys: ConstraintSystem, scale
) -> jax.Array:
    """vc = -scale J^T (J J^T)^-1 err (ref :659-666), with a tiny Tikhonov
    term since redundant contacts make J J^T singular (the reference feeds
    the singular matrix to LDLT).  Returns (n, 6)."""
    Jf = _flat_J(sys)
    m = sys.num_rows
    JJt = Jf @ Jf.T
    JJt = JJt + jnp.diag(
        jnp.where(sys.row_active, 1e-10, 1.0).astype(Jf.dtype)
    )
    lam = jnp.linalg.solve(JJt, sys.err)
    vc = (-scale * (Jf.T @ lam)).reshape(spec.num_bodies, 6)
    # Static bodies must not be relaxed (no reference analog: the
    # reference has no infinite-mass bodies).
    return jnp.where((spec.inv_mass > 0)[:, None], vc, 0.0)


def _advance_positions(state: State, vc: jax.Array, dt) -> State:
    """StepPositions_ExplicitEuler with a velocity-correction field
    (ref :553-560, 647-650)."""
    return state._replace(
        p=state.p + dt * vc[:, :3],
        q=quat.integrate_quat(state.q, vc[:, 3:], dt),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def init_stabilize(
    spec: SceneSpec, state: State, cfg: SimConfig, max_steps: int = 100
) -> State:
    """Pre-run position relaxation (ref InitStabilize, ensembles.cc:602-622):
    up to `max_steps` relaxation steps with dt = 500 dt_sim, scale 0.2,
    re-detecting contacts each iteration, until err^2 <= 1e-9."""
    tol = 1e-9

    def err2_of(st):
        e = position_constraint_error(spec, st, cfg)
        return e @ e

    def cond(carry):
        st, e2, i = carry
        return (e2 > tol) & (i < max_steps)

    def body(carry):
        st, _, i = carry
        cs = make_contacts(spec, st, cfg)
        sys = build_constraints(spec, st, cs, cfg)
        vc = _velocity_relaxation(spec, st, sys, 0.2)
        st = _advance_positions(st, vc, cfg.dt * 500)
        return st, err2_of(st), i + 1

    state, _, _ = jax.lax.while_loop(cond, body, (state, err2_of(state), 0))
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def post_stabilize(
    spec: SceneSpec, state: State, cfg: SimConfig, max_steps: int = 500
) -> State:
    """Post-step stabilization (ref PostStabilize, ensembles.cc:624-657):
    velocity relaxation applied to both positions (dt = 100 dt_sim) and
    velocities, scale 0.2, until err^2 <= 1e-9.  Deviation from the
    reference: contact geometry is refreshed each iteration instead of
    reusing the pre-step contact set."""
    tol = 1e-9

    def err2_of(st):
        e = position_constraint_error(spec, st, cfg)
        return e @ e

    def cond(carry):
        st, e2, i = carry
        return (e2 > tol) & (i < max_steps)

    def body(carry):
        st, _, i = carry
        cs = make_contacts(spec, st, cfg)
        sys = build_constraints(spec, st, cs, cfg)
        vc = _velocity_relaxation(spec, st, sys, 0.2)
        st = _advance_positions(st, vc, cfg.dt * 100)
        u = scn.pack_velocity(st) + vc
        st = scn.unpack_velocity(st, u)
        return st, err2_of(st), i + 1

    state, _, _ = jax.lax.while_loop(cond, body, (state, err2_of(state), 0))
    return state


# ---------------------------------------------------------------------------
# Diagnostics (SURVEY §5.5 — structured per-step metrics)


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_diagnostics(
    spec: SceneSpec, state: State, cfg: SimConfig,
    ext_force: Optional[jax.Array] = None,
):
    """Structured metrics for one step without advancing the state:
    contact count, max penetration depth, constraint-error norm, solver
    complementarity residual, kinetic energy.  The build's analog of the
    reference's inline solver diagnostics (condition numbers / iteration
    counts, eggshell/sparse_iterations.cc:117-223) — reduce these across
    a mesh with psum for fleet monitoring."""
    from eggshell_tpu.physics.contacts import count_dropped_contacts

    cs, sys, A, rhs, u, Minv, F = _pre_solve(spec, state, cfg, ext_force)
    if cfg.solver == SolverKind.DIRECT:
        lam, _, solver_info = lcp_direct.mixed_constraints_solver(
            A, rhs, sys.is_eq, sys.lo, sys.hi, return_info=True
        )
    else:
        lam = _solve_lambda(A, rhs, sys, cfg)
        solver_info = None
    residual = lcp.residual_error(A, rhs, lam, sys.is_eq, sys.lo, sys.hi)
    mass = jnp.where(spec.inv_mass > 0,
                     1.0 / jnp.where(spec.inv_mass > 0, spec.inv_mass, 1.0),
                     0.0)
    R = state.R()
    Ig = R @ spec.inertia_body @ jnp.swapaxes(R, -1, -2)
    ke = 0.5 * jnp.sum(mass[:, None] * state.v**2) + 0.5 * jnp.sum(
        state.w * jnp.einsum("nij,nj->ni", Ig, state.w)
    )
    out = {
        "num_contacts": jnp.sum(cs.active),
        "dropped_contacts": count_dropped_contacts(spec, state, cfg),
        "max_penetration": jnp.max(jnp.where(cs.active, cs.depth, 0.0)),
        "constraint_error_norm": jnp.linalg.norm(sys.err),
        "solver_residual": residual,
        "kinetic_energy": ke,
        "max_impulse": jnp.max(jnp.abs(lam)),
    }
    if solver_info is not None:
        # Structured solver-failure record (ref eggshell/lcp.cc:233-268
        # lcp_debug.log: iteration count, violation, fallback used).
        out["solver_converged"] = solver_info.converged
        out["solver_iterations"] = solver_info.iterations
        out["solver_goodness"] = solver_info.goodness
        out["solver_fallback_used"] = solver_info.fallback_used
    return out
