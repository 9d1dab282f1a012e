"""Block-structured assembly of the multi-rate MPC QP.

Decision vector (588 for the shipped config; variableSamplingMPC.cpp:44-45):
``[x_0..x_nIter | Δq_0..Δq_{ch-1} | v_0..v_{ch-ns}]`` with 26-dim states,
8-dim joint deltas and 4-dim standardised-throttle knots.

Constraint rows, stacked in registration order (IMPCProblem.cpp:83-134):
``[dynamics (26·nIter) | initial state (26) | throttle (4·(nIter-ns+1))]``.

Contrast with the reference: there every cost owns a full 588×588 dense
Hessian that the problem engine sums each configure (IMPCProblem.cpp:48-80).
Here the Hessian is assembled **once** from its block structure, the per-tick
gradient touches only the blocks that change, and the constraint matrix
updates only its dynamics rows — the static rows (initial state, throttle
identity) are written at trace time with static indices, so XLA compiles the
whole assembly to fused vector code with no scatter in the hot path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core import constants as C
from ..core.config import MPCConfig
from ..horizon.schedule import HorizonSchedule
from ..ops import jet_model as jm
from .blocks import LinearizedDynamics


# ---------------------------------------------------------------------------
# Hessian (constant; built once at configure like IMPCProblem.cpp:152-175)
# ---------------------------------------------------------------------------


def state_weight_matrix(cfg: MPCConfig) -> np.ndarray:
    """Block-diagonal per-knot state weight Q (costsVSMPC.cpp:74-93)."""
    Q = np.zeros((cfg.n_states, cfg.n_states))
    Q[C.COM_POS, C.COM_POS] = np.diag(cfg.weight_com_pos)
    Q[C.LIN_MOM, C.LIN_MOM] = np.diag(cfg.weight_lin_mom)
    Q[C.RPY, C.RPY] = np.diag(cfg.weight_rpy)
    Q[C.ANG_MOM, C.ANG_MOM] = np.diag(cfg.weight_ang_mom)
    Q[C.POS_ERR, C.POS_ERR] = np.diag(cfg.weight_com_pos_error)
    Q[C.RPY_ERR, C.RPY_ERR] = np.diag(cfg.weight_rpy_error)
    return Q


def build_hessian(cfg: MPCConfig) -> np.ndarray:
    """Constant QP Hessian: tracking Q per state knot 1..nIter
    (costsVSMPC.cpp:166-174), joint-delta regularisation per control knot
    (:375-382), tridiagonal throttle-rate penalty (:383-409), initial-throttle
    weight (:470-477), joint-position regularisation (:560-573)."""
    n = cfg.n_var
    ns, ni, ch = cfg.n_states, cfg.n_iter, cfg.control_horizon
    nj, nt = cfg.n_ctrl_joints, cfg.n_jets
    H = np.zeros((n, n))
    Q = state_weight_matrix(cfg)
    for i in range(1, ni + 1):
        H[i * ns:(i + 1) * ns, i * ns:(i + 1) * ns] += Q
    jo = cfg.joints_offset
    wj = np.diag(cfg.weight_delta_joint) + (
        cfg.weight_regularization_joint_pos * np.eye(nj))
    for i in range(ch):
        H[jo + i * nj:jo + (i + 1) * nj, jo + i * nj:jo + (i + 1) * nj] += wj
    to = cfg.throttle_offset
    wt = cfg.weight_throttle * np.eye(nt)
    for i in range(ch - cfg.n_iter_small):
        a = to + i * nt
        b = to + (i + 1) * nt
        H[a:a + nt, a:a + nt] += wt
        H[b:b + nt, b:b + nt] += wt
        H[a:a + nt, b:b + nt] -= wt
        H[b:b + nt, a:a + nt] -= wt
    H[to:to + nt, to:to + nt] += cfg.weight_initial_throttle * np.eye(nt)
    return H


# ---------------------------------------------------------------------------
# Gradient (per tick)
# ---------------------------------------------------------------------------


def build_state_reference(cfg: MPCConfig, pos_ref, lin_ref, rpy_ref, ang_ref):
    """Expand the rolling 11-column window into per-knot references [26, nIter].

    Small-step knots all track window column 0; large-step knot i tracks
    column i - nIterSmall (costsVSMPC.cpp:191-263 — note the last window
    column is never indexed directly; it enters as the window shifts).
    """
    cols = [0 if i < cfg.n_iter_small else i - cfg.n_iter_small
            for i in range(cfg.n_iter)]
    cols = jnp.asarray(cols)
    ref = jnp.zeros((cfg.n_states, cfg.n_iter), pos_ref.dtype)
    ref = ref.at[C.COM_POS, :].set(pos_ref[:, cols])
    ref = ref.at[C.LIN_MOM, :].set(lin_ref[:, cols])
    ref = ref.at[C.RPY, :].set(rpy_ref[:, cols])
    ref = ref.at[C.ANG_MOM, :].set(ang_ref[:, cols])
    return ref


def build_gradient(cfg: MPCConfig, Q, state_reference, joint_pos_ctrl,
                   joint_pos_ref_ctrl, throttle_cmd):
    """Per-tick gradient.

    - tracking: g(knot i) = −Q x_ref(i−1) for i = 1..nIter (costsVSMPC.cpp:175-178)
    - joint-position regularisation: w (q_out − q_init) per control knot
      (costsVSMPC.cpp:574-591)
    - initial-throttle pull: −w v(ū_applied) on throttle knot 0
      (costsVSMPC.cpp:479-486)
    """
    dt_ = state_reference.dtype
    g = jnp.zeros((cfg.n_var,), dt_)
    track = -(Q @ state_reference)                       # [26, nIter]
    g = g.at[cfg.n_states:cfg.n_states * (cfg.n_iter + 1)].set(
        track.T.reshape(-1))
    jreg = cfg.weight_regularization_joint_pos * (
        joint_pos_ctrl - joint_pos_ref_ctrl)             # [n_ctrl]
    g = g.at[cfg.joints_offset:cfg.throttle_offset].set(
        jnp.tile(jreg, cfg.control_horizon))
    v_applied = jm.throttle_to_v(throttle_cmd)
    g = g.at[cfg.throttle_offset:cfg.throttle_offset + cfg.n_jets].set(
        -cfg.weight_initial_throttle * v_applied)
    return g


# ---------------------------------------------------------------------------
# Constraints (per tick)
# ---------------------------------------------------------------------------


def build_dynamics_rows(cfg: MPCConfig, sched: HorizonSchedule,
                        lin: LinearizedDynamics):
    """Forward-Euler multiple-shooting equalities, [26·nIter, n_var] + bounds.

    Row block i:  (I + Δtᵢ Ac) x_i − x_{i+1} + Δtᵢ BJ Δq_{jk(i)} + Δtᵢ BT v_{tk(i)}
    = −Δtᵢ c   (constraintsVSMPC.cpp:76-131). All placement indices are
    trace-time constants from the schedule.
    """
    ns = cfg.n_states
    dt_ = lin.Ac.dtype
    A = jnp.zeros((cfg.n_dynamics_constraints, cfg.n_var), dt_)
    eye = jnp.eye(ns, dtype=dt_)
    bvec = jnp.zeros((cfg.n_dynamics_constraints,), dt_)
    for i in range(cfg.n_iter):
        dt_i = sched.dts[i]
        r = i * ns
        A = A.at[r:r + ns, i * ns:(i + 1) * ns].set(eye + dt_i * lin.Ac)
        A = A.at[r:r + ns, (i + 1) * ns:(i + 2) * ns].set(-eye)
        jk = sched.joint_knot_of_step[i]
        col = cfg.joints_offset + jk * cfg.n_ctrl_joints
        A = A.at[r:r + ns, col:col + cfg.n_ctrl_joints].add(dt_i * lin.BJ)
        tk = sched.throttle_knot_of_step[i]
        col = cfg.throttle_offset + tk * cfg.n_jets
        A = A.at[r:r + ns, col:col + cfg.n_jets].add(dt_i * lin.BT)
        bvec = bvec.at[r:r + ns].set(-dt_i * lin.c)
    return A, bvec, bvec


def build_initial_state_rows(cfg: MPCConfig, x0):
    """x_0 = x̂ equality block (IQPUtilsMPC.cpp:71-92)."""
    dt_ = x0.dtype
    A = jnp.zeros((cfg.n_states, cfg.n_var), dt_)
    A = A.at[:, :cfg.n_states].set(jnp.eye(cfg.n_states, dtype=dt_))
    return A, x0, x0


def build_throttle_rows(cfg: MPCConfig, pin_first_knot, throttle_cmd, dtype):
    """Throttle box/pin rows [4·(nIter-ns+1), n_var] + bounds.

    Identity blocks on the 6 throttle knots with [v(u_min), v(u_max)] bounds;
    when ``pin_first_knot`` the first knot is clamped by equality to the
    currently applied throttle — the multi-rate hold
    (constraintsVSMPC.cpp:338-374). The remaining declared rows are zero rows
    with 0 ≤ 0 ≤ 0, exactly as in the reference sizing quirk
    (constraintsVSMPC.cpp:283 vs. :343).
    """
    nrows = cfg.n_throttle_constraints
    nt = cfg.n_jets
    A = jnp.zeros((nrows, cfg.n_var), dtype)
    lb = jnp.zeros((nrows,), dtype)
    ub = jnp.zeros((nrows,), dtype)
    v_min = jm.throttle_to_v(jnp.asarray(cfg.throttle_min, dtype))
    v_max = jm.throttle_to_v(jnp.asarray(cfg.throttle_max, dtype))
    v_applied = jm.throttle_to_v(throttle_cmd)
    for i in range(cfg.n_throttle_knots):
        r = i * nt
        col = cfg.throttle_offset + i * nt
        A = A.at[r:r + nt, col:col + nt].set(jnp.eye(nt, dtype=dtype))
        if i == 0:
            lo = jnp.where(pin_first_knot, v_applied, jnp.full((nt,), v_min, dtype))
            hi = jnp.where(pin_first_knot, v_applied, jnp.full((nt,), v_max, dtype))
        else:
            lo = jnp.full((nt,), v_min, dtype)
            hi = jnp.full((nt,), v_max, dtype)
        lb = lb.at[r:r + nt].set(lo)
        ub = ub.at[r:r + nt].set(hi)
    return A, lb, ub


def build_joint_position_rows(cfg: MPCConfig, joint_pos_ctrl, dtype):
    """Joint-position box rows [nJoints·nIter, n_var] + bounds.

    Per-knot identity on the joint-delta inputs bounded by the remaining
    range to the configured deg limits, measured from the current integrated
    joint position reference (constraintsVSMPC.cpp:434-456; nJoints·nIter
    rows are declared, rows past controlHorizon·nJoints stay 0 ≤ 0 ≤ 0).

    Deliberate deviation: the reference flips ``m_firstIteriation`` *inside*
    the knot loop (constraintsVSMPC.cpp:440-448), so only knot 0's identity
    block is ever written — knots 1..ch-1 get bounds but all-zero matrix
    rows, i.e. they are unconstrained. That flag placement looks like an
    upstream bug (the flag exists to skip rebuilding the constant matrix
    across ticks, not across knots); we constrain every control knot, which
    is strictly tighter and matches the constraint's evident intent. The
    test oracle (tests/golden_oracle.py) mirrors this choice so fidelity
    tests compare like against like.
    """
    nj = cfg.n_ctrl_joints
    nrows = cfg.n_joint_position_constraints
    A = jnp.zeros((nrows, cfg.n_var), dtype)
    lb = jnp.zeros((nrows,), dtype)
    ub = jnp.zeros((nrows,), dtype)
    q_min = jnp.asarray(np.deg2rad(cfg.joint_pos_min_deg), dtype)
    q_max = jnp.asarray(np.deg2rad(cfg.joint_pos_max_deg), dtype)
    for i in range(cfg.control_horizon):
        r = i * nj
        col = cfg.joints_offset + i * nj
        A = A.at[r:r + nj, col:col + nj].set(jnp.eye(nj, dtype=dtype))
        lb = lb.at[r:r + nj].set(q_min - joint_pos_ctrl)
        ub = ub.at[r:r + nj].set(q_max - joint_pos_ctrl)
    return A, lb, ub


def assemble_constraints(cfg: MPCConfig, sched: HorizonSchedule,
                         lin: LinearizedDynamics, x0, pin_first_knot,
                         throttle_cmd, joint_pos_ctrl=None):
    """Full [512, 588] constraint stack + bounds, reference row order."""
    A_dyn, l_dyn, u_dyn = build_dynamics_rows(cfg, sched, lin)
    A_init, l_init, u_init = build_initial_state_rows(cfg, x0)
    A_thr, l_thr, u_thr = build_throttle_rows(
        cfg, pin_first_knot, throttle_cmd, x0.dtype)
    As = [A_dyn, A_init, A_thr]
    ls = [l_dyn, l_init, l_thr]
    us = [u_dyn, u_init, u_thr]
    if cfg.use_joint_position_constraint:
        A_j, l_j, u_j = build_joint_position_rows(
            cfg, joint_pos_ctrl, x0.dtype)
        As.append(A_j)
        ls.append(l_j)
        us.append(u_j)
    A = jnp.concatenate(As, axis=0)
    lb = jnp.concatenate(ls)
    ub = jnp.concatenate(us)
    return A, lb, ub
