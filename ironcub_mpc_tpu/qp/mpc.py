"""The unified multi-rate MPC pipeline as pure functions.

Equivalent of the reference's ``VariableSamplingMPC`` + ``IMPCProblem``
orchestration (variableSamplingMPC.cpp, IMPCProblem.cpp), re-designed for
XLA: ``configure`` builds the constant Hessian, the initial reference
window, the Ruiz scaling and the initial carry; ``mpc_tick`` is one 200 Hz
controller step — reference-window shift, linearisation, constraint assembly,
warm-started ADMM solve, command extraction — as a single jittable pure
function ``(carry, snapshot) -> (carry', output)``.

Multi-rate counters, the RPY unwrap state, trajectory cursors and the ADMM
warm start are all explicit in :class:`~ironcub_mpc_tpu.core.types.MPCCarry`,
so closed-loop rollouts are a `lax.scan` and Monte-Carlo sweeps are a `vmap`
over carries.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.config import MPCConfig
from ..core.types import DebugInfo, MPCCarry, MPCOutput, RobotSnapshot
from ..horizon.schedule import HorizonSchedule
from ..ops import admm
from ..ops import jet_model as jm
from ..ops.so3 import euler_rate_matrix, matrix_to_rpy, unwrap_rpy
from . import assembly
from . import condensed
from .blocks import LambdaInit, LinearizedDynamics, linearize


class MPCProblem(NamedTuple):
    """Arrays fixed at configure time (pytree; pairs with static cfg/sched)."""

    H: jnp.ndarray                   # [n_var, n_var] constant Hessian
    H_u: jnp.ndarray                 # [nU, nU] constant input-space Hessian
    Q: jnp.ndarray                   # [26, 26] state weight block
    lambda_init: LambdaInit
    joint_pos_ref_ctrl: jnp.ndarray  # [n_ctrl] initial posture of controlled joints
    com_pos_init: jnp.ndarray        # [3] CoM at configure (trajectory offset)
    rpy_init: jnp.ndarray            # [3] RPY at configure (trajectory offset)
    traj_pos: jnp.ndarray            # [T, 3] positionCoM channel @ large-step fps
    traj_vel: jnp.ndarray            # [T, 3] velocityCoM
    traj_rpy: jnp.ndarray            # [T, 3] RPY
    traj_rpydot: jnp.ndarray         # [T, 3] RPYDot
    alpha_traj: jnp.ndarray          # [Ta] alphaGravity upsampled to MPC fps
    scaling: admm.Scaling            # fixed equilibration (OSQP setup-time)
    # frozen condensed-space equilibration (None for the full-space solver)
    cond_scaling: condensed.CondensedScaling = None


# ---------------------------------------------------------------------------
# reference window helpers (ReferenceTrackingCost, costsVSMPC.cpp:74-286)
# ---------------------------------------------------------------------------


def _window_column(problem: MPCProblem, snap: RobotSnapshot, idx):
    """One new reference column at trajectory cursor ``idx``.

    pos = c₀ + p_ref;  h_lin = Rᵀ m v_ref;  rpy = φ₀ + φ_ref;
    h_ang = I_lock W(φ) φ̇_ref — R, I, W from the *current* measured state
    (costsVSMPC.cpp:103-117,126-149,266-286).
    """
    i = jnp.clip(idx, 0, problem.traj_pos.shape[0] - 1)
    p = problem.com_pos_init + jnp.take(problem.traj_pos, i, axis=0)
    lin = snap.w_R_b.T @ (snap.total_mass * jnp.take(problem.traj_vel, i, axis=0))
    rpy_col = problem.rpy_init + jnp.take(problem.traj_rpy, i, axis=0)
    rpy_now = matrix_to_rpy(snap.w_R_b)
    W = euler_rate_matrix(rpy_now)
    ang = snap.inertia_locked @ (W @ jnp.take(problem.traj_rpydot, i, axis=0))
    return p, lin, rpy_col, ang


def _shift_window(win, new_col):
    return jnp.concatenate([win[:, 1:], new_col[:, None]], axis=1)


def _advance_ref(cfg: MPCConfig, problem: MPCProblem, carry: MPCCarry,
                 snap: RobotSnapshot):
    """Every ratio-th tick: advance the trajectory cursor, shift the rolling
    window and refresh the 'current reference' published to the QP input
    (costsVSMPC.cpp:121-165)."""
    shift = carry.ref_counter == (cfg.ratio_small_large - 1)

    idx_next = jnp.minimum(carry.pos_traj_idx + 1, problem.traj_pos.shape[0] - 1)
    p, lin, rpy_col, ang = _window_column(problem, snap, idx_next)

    pos_w = jnp.where(shift, _shift_window(carry.pos_com_ref, p), carry.pos_com_ref)
    lin_w = jnp.where(shift, _shift_window(carry.lin_mom_ref, lin), carry.lin_mom_ref)
    rpy_w = jnp.where(shift, _shift_window(carry.rpy_ref, rpy_col), carry.rpy_ref)
    ang_w = jnp.where(shift, _shift_window(carry.ang_mom_ref, ang), carry.ang_mom_ref)

    pos_now = jnp.where(shift, pos_w[:, 0], carry.pos_com_ref_now)
    rpy_now = jnp.where(shift, rpy_w[:, 0], carry.rpy_ref_now)
    mom_now = jnp.where(
        shift, jnp.concatenate([lin_w[:, 0], ang_w[:, 0]]), carry.mom_ref_now)

    return carry._replace(
        pos_com_ref=pos_w, lin_mom_ref=lin_w, rpy_ref=rpy_w, ang_mom_ref=ang_w,
        pos_com_ref_now=pos_now, rpy_ref_now=rpy_now, mom_ref_now=mom_now,
        pos_traj_idx=jnp.where(shift, idx_next, carry.pos_traj_idx),
        ref_counter=jnp.where(shift, 0, carry.ref_counter + 1),
    )


# ---------------------------------------------------------------------------
# initial state (ConstraintInitialState, constraintsVSMPC.cpp:206-247)
# ---------------------------------------------------------------------------


def _initial_state(cfg: MPCConfig, carry: MPCCarry, snap: RobotSnapshot,
                   est_thrust_dot):
    rpy_raw = matrix_to_rpy(snap.w_R_b)
    rpy_unwrapped, n_turns = unwrap_rpy(rpy_raw, carry.rpy_old, carry.n_turns)
    x0 = jnp.zeros((cfg.n_states,), snap.com_pos.dtype)
    x0 = x0.at[C.COM_POS].set(snap.com_pos)
    x0 = x0.at[C.LIN_MOM].set(snap.momentum_body[:3])
    x0 = x0.at[C.RPY].set(rpy_unwrapped)
    x0 = x0.at[C.ANG_MOM].set(snap.momentum_body[3:])
    if cfg.use_estimated_thrust:
        x0 = x0.at[C.THRUST].set(snap.jet_thrusts)
        x0 = x0.at[C.THRUST_DOT].set(est_thrust_dot)
    else:
        x0 = x0.at[C.THRUST].set(carry.thrust_des)
        x0 = x0.at[C.THRUST_DOT].set(carry.thrust_dot_des)
    x0 = x0.at[C.POS_ERR].set(snap.com_pos - carry.pos_com_ref_now)
    x0 = x0.at[C.RPY_ERR].set(rpy_unwrapped - carry.rpy_ref_now)
    return x0, rpy_raw, n_turns


# ---------------------------------------------------------------------------
# configure
# ---------------------------------------------------------------------------


def configure(cfg: MPCConfig, sched: HorizonSchedule, joint_sel: Tuple[int, ...],
              snap0: RobotSnapshot, traj_channels: dict, alpha_traj,
              settings: admm.ADMMSettings = admm.ADMMSettings(),
              est_thrust_dot=None, initial_throttle=None,
              dtype=jnp.float32) -> Tuple[MPCProblem, MPCCarry]:
    """Build problem constants and the initial carry.

    Mirrors ``IMPCProblem::configure`` (IMPCProblem.cpp:3-148): each block's
    first compute runs here, which advances the reference window once (the
    tracking-cost counter starts saturated, costsVSMPC.cpp:118) and the
    alphaGravity cursor once, and computes the equilibration from the first
    assembled QP (OSQP scales at setup only).
    """
    f = lambda a: jnp.asarray(a, dtype)
    est_thrust_dot = f(jnp.zeros(4)) if est_thrust_dot is None else f(est_thrust_dot)
    initial_throttle = f(jnp.zeros(4)) if initial_throttle is None else f(initial_throttle)

    rpy0 = matrix_to_rpy(snap0.w_R_b)
    lam_init = LambdaInit(
        rel_jac_lin=f(snap0.rel_jac_lin),
        rel_jac_ang=f(snap0.rel_jac_ang),
        jet_axes_world=f(snap0.jet_axes_world),
        jet_arms_world=f(snap0.jet_arms_world),
        rpy_init=f(rpy0),
    )

    problem = MPCProblem(
        H=f(assembly.build_hessian(cfg)),
        H_u=f(condensed.build_hu(cfg)),
        Q=f(assembly.state_weight_matrix(cfg)),
        lambda_init=lam_init,
        joint_pos_ref_ctrl=f(snap0.joint_pos[jnp.asarray(joint_sel)]),
        com_pos_init=f(snap0.com_pos),
        rpy_init=f(rpy0),
        traj_pos=f(traj_channels["positionCoM"]),
        traj_vel=f(traj_channels["velocityCoM"]),
        traj_rpy=f(traj_channels["RPY"]),
        traj_rpydot=f(traj_channels["RPYDot"]),
        alpha_traj=f(alpha_traj),
        scaling=admm.Scaling(jnp.ones(cfg.n_var, dtype),
                             jnp.ones(cfg.n_constraints, dtype),
                             jnp.asarray(1.0, dtype)),
    )

    # initial window: every column = first trajectory sample
    # (costsVSMPC.cpp:103-117)
    p0, lin0, rpyc0, ang0 = _window_column(problem, snap0, jnp.asarray(0))
    n_ref = cfg.n_reference_knots
    carry = MPCCarry(
        rpy_old=f(rpy0), n_turns=jnp.zeros(3, jnp.int32),
        # both counters start saturated so the configure-time first compute
        # leaves them at 0 (constraintsVSMPC.cpp:335, costsVSMPC.cpp:118)
        throttle_counter=jnp.asarray(cfg.ratio_small_large - 1, jnp.int32),
        ref_counter=jnp.asarray(cfg.ratio_small_large - 1, jnp.int32),
        pos_com_ref=jnp.tile(p0[:, None], (1, n_ref)),
        lin_mom_ref=jnp.tile(lin0[:, None], (1, n_ref)),
        rpy_ref=jnp.tile(rpyc0[:, None], (1, n_ref)),
        ang_mom_ref=jnp.tile(ang0[:, None], (1, n_ref)),
        pos_com_ref_now=f(p0), rpy_ref_now=f(rpyc0),
        mom_ref_now=jnp.concatenate([lin0, ang0]),
        pos_traj_idx=jnp.asarray(0, jnp.int32),
        alpha_traj_idx=jnp.asarray(0, jnp.int32),
        alpha_gravity=f(problem.alpha_traj[0]),
        thrust_des=f(snap0.jet_thrusts),
        thrust_dot_des=f(jnp.zeros(4)),
        throttle_cmd=initial_throttle,
        joints_pos_ref=f(snap0.joint_pos),
        warm_x=jnp.zeros(
            condensed.n_inputs(cfg) if cfg.qp_solver == "condensed"
            else cfg.n_var, dtype),
        warm_y=jnp.zeros(
            condensed.n_box(cfg) if cfg.qp_solver == "condensed"
            else cfg.n_constraints, dtype),
    )

    # --- replicate the configure-time first compute --------------------------
    # (shifts the window once, advances alphaGravity once, computes the
    # equilibration from the first assembled QP — OSQP scales at setup only)
    if cfg.qp_solver == "condensed":
        carry, prep = _tick_prep(cfg, joint_sel, problem, carry, snap0,
                                 est_thrust_dot)
        sel = jnp.asarray(joint_sel)
        q_diag = jnp.diagonal(problem.Q)
        joint_reg_grad = cfg.weight_regularization_joint_pos * (
            carry.joints_pos_ref[sel] - problem.joint_pos_ref_ctrl)
        throttle_init_grad = (-cfg.weight_initial_throttle
                              * jm.throttle_to_v(carry.throttle_cmd))
        qp0 = condensed.condense(
            cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag,
            problem.H_u, joint_reg_grad, throttle_init_grad, prep.pin,
            carry.throttle_cmd, joint_pos_ctrl=carry.joints_pos_ref[sel])
        cond_scaling, kinv0, rho_vec0, rho_scalar0 = condensed.setup(
            cfg, qp0, settings)
        problem = problem._replace(cond_scaling=cond_scaling)
        if settings.kinv_carry:
            carry = carry._replace(kinv=kinv0, rho_vec=rho_vec0,
                                   rho_scalar=rho_scalar0)
    else:
        g, A, lb, ub, carry, _ = _assemble(cfg, sched, joint_sel, problem,
                                           carry, snap0, est_thrust_dot)
        P, q, Asc, lsc, usc, scaling = admm.ruiz_equilibration(
            problem.H, g, A, lb, ub, settings.scaling_iters)
        problem = problem._replace(scaling=scaling)
    return problem, carry


# ---------------------------------------------------------------------------
# debug-log mode (IMPCProblem.cpp:300-408: per-block ½xᵀHx+gᵀx and
# lb ≤ Ax ≤ ub triples, zeroed on non-solved ticks)
# ---------------------------------------------------------------------------


def _block_costs(cfg: MPCConfig, q_diag, states, state_ref, u,
                 joint_reg_grad, throttle_init_grad):
    """Per-cost-block ½xᵀH_b x + g_bᵀx values, registration order
    (variableSamplingMPC.cpp:70-76). ``states`` [nIter, 26] are knots
    1..nIter, ``state_ref`` [26, nIter]."""
    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    r = state_ref.T
    tracking = jnp.sum((0.5 * states - r) * q_diag[None, :] * states)
    dq = u[:nj * ch].reshape(ch, nj)
    wj = jnp.asarray(cfg.weight_delta_joint, u.dtype)
    reg = 0.5 * jnp.sum(dq * dq * wj[None, :])
    v = u[nj * ch:].reshape(-1, nt)
    dv = v[1:] - v[:-1]
    reg = reg + 0.5 * cfg.weight_throttle * jnp.sum(dv * dv)
    thr0 = (0.5 * cfg.weight_initial_throttle * jnp.sum(v[0] * v[0])
            + jnp.sum(throttle_init_grad * v[0]))
    jreg = (0.5 * cfg.weight_regularization_joint_pos * jnp.sum(dq * dq)
            + jnp.sum(joint_reg_grad[None, :] * dq))
    return jnp.stack([tracking, reg, thr0, jreg])


def _debug_condensed(cfg: MPCConfig, sched, prep, qp, csol, q_diag,
                     joint_reg_grad, throttle_init_grad) -> DebugInfo:
    """Triples for the condensed path without re-assembling A: dynamics and
    initial-state equalities hold exactly by construction of the
    elimination, so their Ax equals the bound; box rows carry the true
    iterate. Row order/padding matches the reference stack
    (IMPCProblem.cpp:83-134, constraintsVSMPC.cpp:283 zero-row quirk)."""
    nt = cfg.n_jets
    dt_ = csol.u.dtype
    solved = (csol.status == admm.SOLVED) | (csol.status
                                             == admm.SOLVED_INACCURATE)
    b_dyn = (-jnp.asarray(np.asarray(sched.dts), dt_)[:, None]
             * prep.lin.c[None, :]).reshape(-1)
    n_tk = nt * cfg.n_throttle_knots
    pad = cfg.n_throttle_constraints - n_tk
    v_all = csol.u[-n_tk:]
    lb_t = jnp.concatenate([qp.lb[-n_tk:], jnp.zeros(pad, dt_)])
    ub_t = jnp.concatenate([qp.ub[-n_tk:], jnp.zeros(pad, dt_)])
    ax_t = jnp.concatenate([v_all, jnp.zeros(pad, dt_)])
    lbs = [b_dyn, prep.x0, lb_t]
    ubs = [b_dyn, prep.x0, ub_t]
    axs = [b_dyn, prep.x0, ax_t]
    if cfg.use_joint_position_constraint:
        njc = cfg.n_ctrl_joints * cfg.control_horizon
        padj = cfg.n_joint_position_constraints - njc
        lbs.append(jnp.concatenate([qp.lb[:njc], jnp.zeros(padj, dt_)]))
        ubs.append(jnp.concatenate([qp.ub[:njc], jnp.zeros(padj, dt_)]))
        axs.append(jnp.concatenate([csol.u[:njc], jnp.zeros(padj, dt_)]))
    costs = _block_costs(cfg, q_diag, csol.states, prep.state_ref, csol.u,
                         joint_reg_grad, throttle_init_grad)
    costs = jnp.where(solved, costs, 0.0)
    ax = jnp.where(solved, jnp.concatenate(axs), 0.0)
    return DebugInfo(total_cost=jnp.sum(costs), block_costs=costs,
                     constraint_lb=jnp.concatenate(lbs), constraint_ax=ax,
                     constraint_ub=jnp.concatenate(ubs))


def _debug_full(cfg: MPCConfig, problem, prep, x, A, lb, ub, status,
                joint_reg_grad, throttle_init_grad) -> DebugInfo:
    ns = cfg.n_states
    solved = (status == admm.SOLVED) | (status == admm.SOLVED_INACCURATE)
    states = x[ns:ns * (cfg.n_iter + 1)].reshape(cfg.n_iter, ns)
    u = x[cfg.joints_offset:]
    costs = _block_costs(cfg, jnp.diagonal(problem.Q), states,
                         prep.state_ref, u, joint_reg_grad,
                         throttle_init_grad)
    costs = jnp.where(solved, costs, 0.0)
    ax = jnp.where(solved, A @ x, 0.0)
    return DebugInfo(total_cost=jnp.sum(costs), block_costs=costs,
                     constraint_lb=lb, constraint_ax=ax, constraint_ub=ub)


# ---------------------------------------------------------------------------
# one tick
# ---------------------------------------------------------------------------


class TickPrep(NamedTuple):
    state_ref: jnp.ndarray
    lin: LinearizedDynamics
    x0: jnp.ndarray
    pin: jnp.ndarray


def _tick_prep(cfg, joint_sel, problem: MPCProblem, carry: MPCCarry,
               snap: RobotSnapshot, est_thrust_dot):
    """Shared per-tick work: reference shift, linearisation, initial state,
    multi-rate counters — updates carry in place of the reference's hidden
    per-block state (IMPCProblem::update call order, IMPCProblem.cpp:150-194:
    costs first — they refresh the published references — then constraints)."""
    carry = _advance_ref(cfg, problem, carry, snap)
    state_ref = assembly.build_state_reference(
        cfg, carry.pos_com_ref, carry.lin_mom_ref, carry.rpy_ref,
        carry.ang_mom_ref)

    # alphaGravity: read-then-advance each linearisation
    # (systemDynamicsVSMPC.cpp:263-272,308-311)
    alpha = jnp.take(problem.alpha_traj, carry.alpha_traj_idx)
    alpha_idx = jnp.minimum(carry.alpha_traj_idx + 1,
                            problem.alpha_traj.shape[0] - 1)

    lin = linearize(
        cfg, snap, problem.lambda_init, joint_sel,
        alpha_gravity=alpha, pos_com_ref_now=carry.pos_com_ref_now,
        est_thrust_dot=est_thrust_dot, thrust_des=carry.thrust_des,
        thrust_dot_des=carry.thrust_dot_des, throttle_cmd=carry.throttle_cmd)

    x0, rpy_raw, n_turns = _initial_state(cfg, carry, snap, est_thrust_dot)

    # throttle pin & counter (constraintsVSMPC.cpp:338-374)
    pin = carry.throttle_counter != (cfg.ratio_small_large - 1)
    throttle_counter = jnp.where(
        carry.throttle_counter == cfg.ratio_small_large - 1, 0,
        carry.throttle_counter + 1)

    carry = carry._replace(
        rpy_old=rpy_raw, n_turns=n_turns, alpha_traj_idx=alpha_idx,
        alpha_gravity=alpha, throttle_counter=throttle_counter)
    return carry, TickPrep(state_ref=state_ref, lin=lin, x0=x0, pin=pin)


def condense_from_prep(cfg: MPCConfig, sched, joint_sel,
                       problem: MPCProblem, carry: MPCCarry, prep: TickPrep):
    """Stage 2 of the condensed tick: per-tick gradients + exact state
    elimination. Split out so the pipeline-parallel runner
    (parallel/pp_pipeline.py) can run it as its own stage."""
    sel = jnp.asarray(joint_sel)
    q_diag = jnp.diagonal(problem.Q)
    joint_reg_grad = cfg.weight_regularization_joint_pos * (
        carry.joints_pos_ref[sel] - problem.joint_pos_ref_ctrl)
    throttle_init_grad = (-cfg.weight_initial_throttle
                          * jm.throttle_to_v(carry.throttle_cmd))
    qp = condensed.condense(
        cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag,
        problem.H_u, joint_reg_grad, throttle_init_grad, prep.pin,
        carry.throttle_cmd, joint_pos_ctrl=carry.joints_pos_ref[sel])
    return qp, q_diag, joint_reg_grad, throttle_init_grad


def solve_condensed(cfg: MPCConfig, settings: admm.ADMMSettings,
                    problem: MPCProblem, carry: MPCCarry,
                    qp: condensed.CondensedQP) -> condensed.CondensedSolution:
    """Stage 3 of the condensed tick: the warm-started box-QP solve."""
    use_carry = settings.kinv_carry and not settings.kinv_reset
    return condensed.solve(
        cfg, qp, settings, warm_u=carry.warm_x, warm_y=carry.warm_y,
        scaling=problem.cond_scaling,
        kinv_prev=carry.kinv if use_carry else None,
        rho_prev=carry.rho_vec if use_carry else None,
        rho_scalar_prev=(carry.rho_scalar if use_carry else None))


def _assemble(cfg, sched, joint_sel, problem: MPCProblem, carry: MPCCarry,
              snap: RobotSnapshot, est_thrust_dot):
    """Full-space gradient + constraint stack for the current tick."""
    carry, prep = _tick_prep(cfg, joint_sel, problem, carry, snap,
                             est_thrust_dot)
    sel = jnp.asarray(joint_sel)
    g = assembly.build_gradient(
        cfg, problem.Q, prep.state_ref, carry.joints_pos_ref[sel],
        problem.joint_pos_ref_ctrl, carry.throttle_cmd)
    A, lb, ub = assembly.assemble_constraints(
        cfg, sched, prep.lin, prep.x0, prep.pin, carry.throttle_cmd,
        joint_pos_ctrl=carry.joints_pos_ref[sel])
    return g, A, lb, ub, carry, prep


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def mpc_tick(cfg: MPCConfig, sched: HorizonSchedule, joint_sel: Tuple[int, ...],
             settings: admm.ADMMSettings, problem: MPCProblem,
             carry: MPCCarry, snap: RobotSnapshot,
             est_thrust_dot) -> Tuple[MPCCarry, MPCOutput]:
    """One 200 Hz multi-rate MPC step: update + solve + extract.

    Solve strategy per ``cfg.qp_solver``: "condensed" eliminates the states
    exactly into a 120-var box QP (the TPU fast path); "full" solves the
    sparse 588x512 form like the reference's OSQP setup.
    """
    nj, nt = cfg.n_ctrl_joints, cfg.n_jets
    sel = jnp.asarray(joint_sel)

    if cfg.qp_solver == "condensed":
        carry, prep = _tick_prep(cfg, joint_sel, problem, carry, snap,
                                 est_thrust_dot)
        qp, q_diag, joint_reg_grad, throttle_init_grad = condense_from_prep(
            cfg, sched, joint_sel, problem, carry, prep)
        csol = solve_condensed(cfg, settings, problem, carry, qp)
        if settings.kinv_carry:
            carry = carry._replace(kinv=csol.kinv, rho_vec=csol.rho_vec,
                                   rho_scalar=csol.rho_scalar)
        status, pri_res, dua_res = csol.status, csol.pri_res, csol.dua_res
        guard_fired = csol.guard_fired
        delta_joints = csol.u[:nj]
        throttle_v = csol.u[nj * cfg.control_horizon:
                            nj * cfg.control_horizon + nt]
        thrust_des = csol.states[0, C.THRUST]
        thrust_dot_des = csol.states[0, C.THRUST_DOT]
        final_state = csol.states[-1]
        warm_x, warm_y = csol.u, csol.y
        debug = (_debug_condensed(cfg, sched, prep, qp, csol, q_diag,
                                  joint_reg_grad, throttle_init_grad)
                 if cfg.enable_debug_log_mode else None)
    else:
        g, A, lb, ub, carry, prep = _assemble(
            cfg, sched, joint_sel, problem, carry, snap, est_thrust_dot)
        data = admm.prepare(problem.H, g, A, lb, ub, settings,
                            scaling=problem.scaling)
        sol = admm.solve_prepared(data, settings, x0=carry.warm_x,
                                  y0=carry.warm_y)
        status, pri_res, dua_res = sol.status, sol.pri_res, sol.dua_res
        guard_fired = jnp.asarray(False)
        ns = cfg.n_states
        # extraction (variableSamplingMPC.cpp:88-112)
        delta_joints = sol.x[cfg.joints_offset:cfg.joints_offset + nj]
        throttle_v = sol.x[cfg.throttle_offset:cfg.throttle_offset + nt]
        thrust_des = sol.x[ns + C.THRUST0: ns + C.THRUST0 + 4]
        thrust_dot_des = sol.x[ns + C.THRUST_DOT0: ns + C.THRUST_DOT0 + 4]
        final_state = sol.x[ns * cfg.n_iter: ns * (cfg.n_iter + 1)]
        warm_x, warm_y = sol.x, sol.y
        if cfg.enable_debug_log_mode:
            jrg = cfg.weight_regularization_joint_pos * (
                carry.joints_pos_ref[sel] - problem.joint_pos_ref_ctrl)
            tig = (-cfg.weight_initial_throttle
                   * jm.throttle_to_v(carry.throttle_cmd))
            debug = _debug_full(cfg, problem, prep, sol.x, A, lb, ub,
                                status, jrg, tig)
        else:
            debug = None

    return _finish_tick(cfg, sel, carry, delta_joints, throttle_v,
                        thrust_des, thrust_dot_des, final_state, status,
                        pri_res, dua_res, warm_x, warm_y, debug,
                        guard_fired)


def _finish_tick(cfg, sel, carry: MPCCarry, delta_joints, throttle_v,
                 thrust_des, thrust_dot_des, final_state, status, pri_res,
                 dua_res, warm_x, warm_y, debug,
                 guard_fired=None):
    """Command integration + output assembly (variableSamplingMPC.cpp:88-112:
    joint deltas integrate into the absolute reference, throttle
    destandardizes; non-solved ticks keep the previous commands)."""
    solved = status == admm.SOLVED
    joints_new = carry.joints_pos_ref.at[sel].add(delta_joints)
    throttle_new = jm.destandardize_throttle(throttle_v)

    pick = lambda new, old: jnp.where(solved, new, old)
    carry = carry._replace(
        joints_pos_ref=pick(joints_new, carry.joints_pos_ref),
        throttle_cmd=pick(throttle_new, carry.throttle_cmd),
        thrust_des=pick(thrust_des, carry.thrust_des),
        thrust_dot_des=pick(thrust_dot_des, carry.thrust_dot_des),
        warm_x=warm_x, warm_y=warm_y,
    )

    out = MPCOutput(
        joints_pos_ref=carry.joints_pos_ref,
        throttle=carry.throttle_cmd,
        thrust_des=carry.thrust_des,
        thrust_dot_des=carry.thrust_dot_des,
        final_state=final_state,
        status=status, pri_res=pri_res, dua_res=dua_res,
        alpha_gravity=carry.alpha_gravity,
        pos_com_ref=carry.pos_com_ref_now,
        rpy_ref=carry.rpy_ref_now,
        mom_ref=carry.mom_ref_now,
        guard_fired=(jnp.asarray(False) if guard_fired is None
                     else guard_fired),
        debug=debug,
    )
    return carry, out


def extract_condensed(cfg: MPCConfig, joint_sel, carry: MPCCarry,
                      csol: condensed.CondensedSolution,
                      settings: admm.ADMMSettings,
                      problem: MPCProblem = None,
                      sched: HorizonSchedule = None, prep: "TickPrep" = None,
                      qp: condensed.CondensedQP = None):
    """Stage 4 of the condensed tick: solution slicing + command
    integration (the mpc_tick tail, for the pipeline-parallel runner).

    When ``enable_debug_log_mode`` is on, pass ``problem``/``sched``/
    ``prep``/``qp`` so the per-block DebugInfo is emitted exactly like the
    monolithic tick; otherwise ``out.debug`` is None."""
    nj, nt = cfg.n_ctrl_joints, cfg.n_jets
    sel = jnp.asarray(joint_sel)
    debug = None
    if cfg.enable_debug_log_mode and qp is not None:
        # same gradient formulas as condense_from_prep, evaluated on the
        # pre-update carry (the state the QP was assembled from)
        joint_reg_grad = cfg.weight_regularization_joint_pos * (
            carry.joints_pos_ref[sel] - problem.joint_pos_ref_ctrl)
        throttle_init_grad = (-cfg.weight_initial_throttle
                              * jm.throttle_to_v(carry.throttle_cmd))
        debug = _debug_condensed(cfg, sched, prep, qp, csol,
                                 jnp.diagonal(problem.Q), joint_reg_grad,
                                 throttle_init_grad)
    if settings.kinv_carry:
        carry = carry._replace(kinv=csol.kinv, rho_vec=csol.rho_vec,
                               rho_scalar=csol.rho_scalar)
    delta_joints = csol.u[:nj]
    throttle_v = csol.u[nj * cfg.control_horizon:
                        nj * cfg.control_horizon + nt]
    return _finish_tick(
        cfg, sel, carry, delta_joints, throttle_v,
        csol.states[0, C.THRUST], csol.states[0, C.THRUST_DOT],
        csol.states[-1], csol.status, csol.pri_res, csol.dua_res,
        csol.u, csol.y, debug, csol.guard_fired)
