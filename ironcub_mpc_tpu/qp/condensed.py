"""Condensed multi-rate MPC solve — the TPU-native fast path.

The full-space QP (588 vars / 512 rows, qp/assembly.py) has *only* equality
rows (dynamics + initial state) plus box rows on the 24 throttle knots.
Eliminating the states through the dynamics is therefore **exact**: the
condensed problem

    min_u  ½ uᵀ H_c u + q_cᵀ u    s.t.  lb ≤ u_throttle ≤ ub

over u = [Δq_0..Δq_{ch-1} | v_0..v_{nk-1}] (120 vars for the stock config)
has the same minimiser as the sparse form — verified in tests against the
full-space solver. Per-solve cost drops from ~600 MFLOP (dense KKT
formation + 1100-row polish) to ~10 MFLOP, all of it MXU-friendly batched
matmuls, which is what makes thousands of solves/s per chip possible.

Solver: the same OSQP scheme as :mod:`ironcub_mpc_tpu.ops.admm`, specialised
to a variable-selector constraint matrix — AᵀρA is a diagonal update, Ax is a
gather — plus Schur-complement polish on the active box rows. All matmuls are
forced to ``highest`` precision (TPU f32 defaults to bf16-grade passes that a
QP cannot tolerate).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.config import MPCConfig
from ..horizon.schedule import HorizonSchedule
from ..ops import admm
from ..ops import jet_model as jm
from ..ops import pallas_solve
from .blocks import LinearizedDynamics


class CondensedQP(NamedTuple):
    H: jnp.ndarray        # [nU, nU]
    q: jnp.ndarray        # [nU]
    lb: jnp.ndarray       # [n_box] bounds on the throttle tail of u
    ub: jnp.ndarray       # [n_box]
    F: jnp.ndarray        # [nIter, 26, nU] state-from-input map
    f: jnp.ndarray        # [nIter, 26] affine state response


class CondensedSolution(NamedTuple):
    u: jnp.ndarray        # [nU]
    y: jnp.ndarray        # [n_box] box duals
    states: jnp.ndarray   # [nIter, 26] predicted states x_1..x_nIter
    status: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    # cross-tick solver state (scaled space; carried when kinv_carry is on)
    kinv: jnp.ndarray = None         # [nU, nU] (K(ρ))⁻¹ pre-polish
    rho_vec: jnp.ndarray = None      # [n_box]
    rho_scalar: jnp.ndarray = None   # []
    # [] bool: the kinv_guard recovery branch re-factorised this solve
    # (failure forensics, SURVEY §5; always a concrete scalar, False when
    # the guard is off or there was no carried inverse)
    guard_fired: jnp.ndarray = None


class CondensedScaling(NamedTuple):
    """Frozen setup-time equilibration for the condensed QP (OSQP scales at
    setup only; per-tick re-scaling would shift the basis the carried K⁻¹
    lives in)."""

    D: jnp.ndarray        # [nU] symmetric diagonal scaling of H
    c: jnp.ndarray        # [] cost scaling


def equilibrate(H, q, box0, iters, dt_):
    """Modified-Ruiz equilibration of the condensed KKT (see solve())."""
    nU = H.shape[0]
    D = jnp.ones((nU,), dt_)
    c_s = jnp.asarray(1.0, dt_)
    for _ in range(iters):
        d = admm._safe_inv_sqrt(jnp.max(jnp.abs(H), axis=0))
        # selector columns also carry a 1 in the stacked KKT matrix
        d = d.at[box0:].set(
            admm._safe_inv_sqrt(jnp.maximum(
                jnp.max(jnp.abs(H[:, box0:]), axis=0), 1.0)))
        H = d[:, None] * H * d[None, :]
        q = d * q
        D = D * d
        g = 1.0 / jnp.clip(jnp.maximum(jnp.mean(jnp.max(jnp.abs(H), 0)),
                                       jnp.max(jnp.abs(q))), 1e-8, 1e8)
        H, q, c_s = g * H, g * q, c_s * g
    return H, q, CondensedScaling(D=D, c=c_s)


def _gj_inverse(M):
    """Explicit inverse of a small [n, n] matrix by unrolled Gauss-Jordan.

    Batched LU (`jnp.linalg.solve`) on tiny matrices is sequential-dispatch
    bound on TPU (~4.7 ms for [512, 24, 24]); an unrolled pivot loop compiles
    to n fused vector steps (~0.2 ms). No pivoting: the Woodbury capacitance
    I + ΔρᵢⱼKᵢⱼ is generically well-pivoted after equilibration, and the
    Newton–Schulz polish downstream squares away any pivot noise.
    """
    n = M.shape[-1]
    A = jnp.concatenate([M, jnp.eye(n, dtype=M.dtype)], axis=-1)
    for i in range(n):
        piv = A[i, i]
        piv = jnp.where(jnp.abs(piv) < 1e-12,
                        jnp.where(piv < 0, -1e-12, 1e-12), piv)
        row = A[i] / piv
        A = A - A[:, i:i + 1] * row[None, :]
        A = A.at[i].set(row)
    return A[:, n:]


def n_inputs(cfg: MPCConfig) -> int:
    return (cfg.n_ctrl_joints * cfg.control_horizon
            + cfg.n_jets * cfg.n_throttle_knots)


def weighted_state_indices(cfg: MPCConfig):
    """Static indices of states with a nonzero tracking weight (trace-time
    constant from the config; the per-knot Q is diagonal,
    costsVSMPC.cpp:74-93)."""
    diag = np.zeros(cfg.n_states)
    diag[C.COM_POS] = cfg.weight_com_pos
    diag[C.LIN_MOM] = cfg.weight_lin_mom
    diag[C.RPY] = cfg.weight_rpy
    diag[C.ANG_MOM] = cfg.weight_ang_mom
    diag[C.POS_ERR] = cfg.weight_com_pos_error
    diag[C.RPY_ERR] = cfg.weight_rpy_error
    return tuple(int(i) for i in np.nonzero(diag)[0])


def n_box(cfg: MPCConfig) -> int:
    """Number of box-constrained inputs: the throttle tail, plus every
    joint-delta knot when the joint-position constraint is enabled (the box
    then covers all of u and the selector offset is 0)."""
    nb = cfg.n_jets * cfg.n_throttle_knots
    if cfg.use_joint_position_constraint:
        nb += cfg.n_ctrl_joints * cfg.control_horizon
    return nb


def build_hu(cfg: MPCConfig) -> np.ndarray:
    """Constant input-space Hessian: joint-delta + joint-position
    regularisation per control knot, throttle-rate tridiagonal, initial
    throttle pull (costsVSMPC.cpp:369-413,468-477,558-573)."""
    nU = n_inputs(cfg)
    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    H = np.zeros((nU, nU))
    wj = np.diag(cfg.weight_delta_joint) + (
        cfg.weight_regularization_joint_pos * np.eye(nj))
    for i in range(ch):
        H[i * nj:(i + 1) * nj, i * nj:(i + 1) * nj] += wj
    to = nj * ch
    wt = cfg.weight_throttle * np.eye(nt)
    for i in range(ch - cfg.n_iter_small):
        a, b = to + i * nt, to + (i + 1) * nt
        H[a:a + nt, a:a + nt] += wt
        H[b:b + nt, b:b + nt] += wt
        H[a:a + nt, b:b + nt] -= wt
        H[b:b + nt, a:a + nt] -= wt
    H[to:to + nt, to:to + nt] += cfg.weight_initial_throttle * np.eye(nt)
    return H


def _mat3(M, X):
    """[3,3] @ [3,W] written as broadcast-multiply + 3-term reduce so XLA
    keeps it on the VPU fused with neighbours (a padded 3x3 MXU matmul would
    waste >90% of the tile)."""
    return (M[:, :, None] * X[None, :, :]).sum(axis=1)


def _structured_chain(cfg: MPCConfig, sched: HorizonSchedule,
                      lin: LinearizedDynamics, x0):
    """Exact state propagation exploiting Ac's block structure.

    The 26-state transition matrix the dense chain multiplies 17 times
    (``sequential`` mode) is ~85% structural zeros (qp/blocks.py:105-169):
    the only genuinely recursive states are the two momenta (3-dim each,
    coupled to themselves by −S(ω)) and the per-jet (T, Ṫ) pairs (decoupled
    2-dim diagonal systems). Everything else is an *integrator* of those:
    CoM integrates R/m·h_lin, RPY integrates W⁻¹I⁻¹·h_ω, and the error
    states integrate CoM/RPY — prefix sums, not chains. So the sequential
    work shrinks from 17 dense [26,26]@[26,nU] matmuls to 17 elementwise
    updates on [3, nU+1] / [4, nU+1] panels (VPU, fully fused), with every
    coupling and every prefix sum computed in parallel outside the scan.
    Produces bit-near-identical (F, f) to the dense chain.

    The affine response f rides as column nU of each panel (free here:
    nU+1 = 121 pads to the same 128-lane tile; the measured "augmented
    column is slower" result applied to the dense-matmul layout only).
    """
    assert cfg.use_jet_dynamic, "structured condensing needs the jet chain"
    ns = cfg.n_states
    nU = n_inputs(cfg)
    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    dt_ = lin.Ac.dtype
    N = cfg.n_iter
    W = nU + 1                                 # + affine column
    dts = jnp.asarray(np.asarray(sched.dts), dt_)          # [N]

    # static one-hot placement tensors (input blocking maps)
    oh_j = np.zeros((N, nj, W), np.float32)    # joint-delta columns
    oh_t = np.zeros((N, nt, W), np.float32)    # throttle columns
    for k in range(N):
        jc = sched.joint_knot_of_step[k] * nj
        oh_j[k, :, jc:jc + nj] = np.eye(nj)
        tc = nj * ch + sched.throttle_knot_of_step[k] * nt
        oh_t[k, :, tc:tc + nt] = np.eye(nt)
    oh_j = jnp.asarray(oh_j, dt_)
    oh_t = jnp.asarray(oh_t, dt_)
    aff = jnp.zeros((W,), dt_).at[nU].set(1.0)  # affine-column selector

    def init_panel(rows):
        return jnp.zeros((rows.stop - rows.start, W), dt_) \
            .at[:, nU].set(x0[rows])

    # --- jet subchain: per-jet (T, Ṫ) pairs, all elementwise ---------------
    d1 = jnp.diagonal(lin.Ac[C.THRUST_DOT, C.THRUST])       # [4]
    d2 = jnp.diagonal(lin.Ac[C.THRUST_DOT, C.THRUST_DOT])   # [4]
    g_eff = jnp.diagonal(lin.BT[C.THRUST_DOT])              # [4]
    c_td = lin.c[C.THRUST_DOT]                              # [4]
    U_T = g_eff[None, :, None] * oh_t + c_td[None, :, None] * aff  # [N,4,W]
    T0, Td0 = init_panel(C.THRUST), init_panel(C.THRUST_DOT)

    def jet_step(carry, inp):
        T, Td = carry
        dtk, u = inp
        T_n = T + dtk * Td
        Td_n = Td + dtk * (d1[:, None] * T + d2[:, None] * Td + u)
        return (T_n, Td_n), (T_n, Td_n)

    _, (T_seq, Td_seq) = jax.lax.scan(jet_step, (T0, Td0), (dts, U_T))
    T_pre = jnp.concatenate([T0[None], T_seq[:-1]], axis=0)   # [N,4,W]

    # --- momentum subchains: 3-dim, coupled to themselves by −S(ω) ---------
    S_lm = lin.Ac[C.LIN_MOM, C.LIN_MOM]
    S_am = lin.Ac[C.ANG_MOM, C.ANG_MOM]
    A_lin = lin.Ac[C.LIN_MOM, C.THRUST]        # [3,4]
    A_ang = lin.Ac[C.ANG_MOM, C.THRUST]
    # thrust coupling + joint-input + affine terms, for every step at once
    V_lm = (jnp.einsum("ij,kjw->kiw", A_lin, T_pre)
            + jnp.einsum("ij,kjw->kiw", lin.BJ[C.LIN_MOM], oh_j)
            + lin.c[C.LIN_MOM][None, :, None] * aff)          # [N,3,W]
    V_am = (jnp.einsum("ij,kjw->kiw", A_ang, T_pre)
            + jnp.einsum("ij,kjw->kiw", lin.BJ[C.ANG_MOM], oh_j)
            + lin.c[C.ANG_MOM][None, :, None] * aff)
    lm0, am0 = init_panel(C.LIN_MOM), init_panel(C.ANG_MOM)

    def mom_step(carry, inp):
        lm, am = carry
        dtk, v_lm, v_am = inp
        lm_n = lm + dtk * (_mat3(S_lm, lm) + v_lm)
        am_n = am + dtk * (_mat3(S_am, am) + v_am)
        return (lm_n, am_n), (lm_n, am_n)

    _, (lm_seq, am_seq) = jax.lax.scan(mom_step, (lm0, am0),
                                       (dts, V_lm, V_am))
    lm_pre = jnp.concatenate([lm0[None], lm_seq[:-1]], axis=0)
    am_pre = jnp.concatenate([am0[None], am_seq[:-1]], axis=0)

    # --- integrator states: parallel prefix sums over the horizon ----------
    Rm = lin.Ac[C.COM_POS, C.LIN_MOM]          # R/m
    WI = lin.Ac[C.RPY, C.ANG_MOM]              # W⁻¹ I⁻¹
    d = dts[:, None, None]

    def integrate(gain, src_pre, c_rows, x0_rows):
        inc = d * (jnp.einsum("ij,kjw->kiw", gain, src_pre)
                   + c_rows[None, :, None] * aff)
        return jnp.cumsum(inc, axis=0) + init_panel(x0_rows)[None]

    com_seq = integrate(Rm, lm_pre, lin.c[C.COM_POS], C.COM_POS)
    rpy_seq = integrate(WI, am_pre, lin.c[C.RPY], C.RPY)
    eye3 = jnp.eye(3, dtype=dt_)
    com_pre = jnp.concatenate([init_panel(C.COM_POS)[None], com_seq[:-1]])
    rpy_pre = jnp.concatenate([init_panel(C.RPY)[None], rpy_seq[:-1]])
    pe_seq = integrate(eye3, com_pre, lin.c[C.POS_ERR], C.POS_ERR)
    re_seq = integrate(eye3, rpy_pre, lin.c[C.RPY_ERR], C.RPY_ERR)

    panels = jnp.concatenate(
        [com_seq, lm_seq, rpy_seq, am_seq, T_seq, Td_seq, pe_seq, re_seq],
        axis=1)                                # [N, 26, W]
    assert panels.shape == (N, ns, W)
    return panels[:, :, :nU], panels[:, :, nU]


def _paired_chain(cfg: MPCConfig, sched: HorizonSchedule,
                  lin: LinearizedDynamics, x0):
    """Exact chain with HALF the sequential depth: consecutive steps share
    the same Ac, so their transitions commute and a pair collapses to one
    matrix — Ad_{k+1}·Ad_k = I + (dt_k+dt_{k+1})Ac + dt_k·dt_{k+1}·Ac²
    (one tiny Ac² setup matmul; no cancellation risk at depth 2). The
    chain then runs ⌈N/2⌉ sequential [26,·]@[·,nU+1] matmuls over the even
    knots, and every odd/final knot is recovered afterwards in ONE batched
    einsum — sequential latency halves while the recovered half runs at
    batched-matmul utilisation. f rides as the affine column."""
    ns = cfg.n_states
    nU = n_inputs(cfg)
    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    dt_ = lin.Ac.dtype
    N = cfg.n_iter
    W = nU + 1
    eye = jnp.eye(ns, dtype=dt_)

    # dense per-step input panels M̃_k = [M_k | dt_k c]
    Mts = []
    for k in range(N):
        dtk = sched.dts[k]
        Mk = jnp.zeros((ns, W), dt_)
        jc = sched.joint_knot_of_step[k] * nj
        Mk = Mk.at[:, jc:jc + nj].add(dtk * lin.BJ)
        tc = nj * ch + sched.throttle_knot_of_step[k] * nt
        Mk = Mk.at[:, tc:tc + nt].add(dtk * lin.BT)
        Mk = Mk.at[:, nU].add(dtk * lin.c)
        Mts.append(Mk)
    Mt = jnp.stack(Mts)                                  # [N, 26, W]

    n_pairs = N // 2
    a = jnp.asarray(np.asarray(sched.dts)[0:2 * n_pairs:2], dt_)
    b = jnp.asarray(np.asarray(sched.dts)[1:2 * n_pairs:2], dt_)
    Ac2 = lin.Ac @ lin.Ac
    Ad2 = (eye[None] + (a + b)[:, None, None] * lin.Ac[None]
           + (a * b)[:, None, None] * Ac2[None])         # [P, 26, 26]
    Ad_odd = eye[None] + b[:, None, None] * lin.Ac[None]
    M2 = jnp.einsum("pij,pjw->piw", Ad_odd, Mt[0:2 * n_pairs:2]) \
        + Mt[1:2 * n_pairs:2]

    Ft = jnp.zeros((ns, W), dt_).at[:, nU].set(x0)       # F̃_(0)
    evens = []
    for p in range(n_pairs):
        Ft = Ad2[p] @ Ft + M2[p]                         # F̃_(2p+2)
        evens.append(Ft)

    # recover odd knots (and the final knot when N is odd) in one batch:
    # F̃_(2p+1) = Ad_(2p) F̃_(2p) + M̃_(2p); F̃_(N) = Ad_(N-1) F̃_(N-1) + M̃_(N-1)
    prev = jnp.stack([jnp.zeros((ns, W), dt_).at[:, nU].set(x0)]
                     + evens[:-1])                       # F̃_(2p), p=0..P-1
    rec_dts = list(np.asarray(sched.dts)[0:2 * n_pairs:2])
    rec_M = [Mt[2 * p] for p in range(n_pairs)]
    rec_prev = [prev[p] for p in range(n_pairs)]
    if N % 2 == 1:                                       # trailing odd step
        rec_dts.append(float(sched.dts[N - 1]))
        rec_M.append(Mt[N - 1])
        rec_prev.append(evens[-1])
    rd = jnp.asarray(np.asarray(rec_dts), dt_)
    Ad_rec = eye[None] + rd[:, None, None] * lin.Ac[None]
    rec = jnp.einsum("pij,pjw->piw", Ad_rec, jnp.stack(rec_prev)) \
        + jnp.stack(rec_M)                               # odd knots (+final)

    # interleave into knot order F̃_(1) .. F̃_(N)
    panels = []
    for p in range(n_pairs):
        panels.append(rec[p])                            # F̃_(2p+1)
        panels.append(evens[p])                          # F̃_(2p+2)
    if N % 2 == 1:
        panels.append(rec[n_pairs])                      # F̃_(N)
    stacked = jnp.stack(panels)                          # [N, 26, W]
    return stacked[:, :, :nU], stacked[:, :, nU]


def condense(cfg: MPCConfig, sched: HorizonSchedule, lin: LinearizedDynamics,
             x0, state_reference, q_diag, H_u, joint_reg_grad,
             throttle_init_grad, pin_first_knot, throttle_cmd,
             joint_pos_ctrl=None) -> CondensedQP:
    """Propagate the discrete dynamics and fold the tracking cost into u.

    x_{k+1} = (I + Δt_k Ac) x_k + Δt_k (BJ Δq_{jk(k)} + BT v_{tk(k)} + c)
    with the static blocking maps from the schedule; then
    H_c = Σ F_kᵀ Q F_k + H_u,  q_c = Σ F_kᵀ Q (f_k − r_k) + q_u.
    """
    ns = cfg.n_states
    nU = n_inputs(cfg)
    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    dt_ = lin.Ac.dtype
    with jax.default_matmul_precision("highest"):
        eye = jnp.eye(ns, dtype=dt_)
        if cfg.condense_mode == "assoc":
            # Horizon-parallel condensing (SURVEY §5/§7.4): the per-knot
            # affine maps x_{k+1} = Ad_k x_k + (M_k u + Δt_k c) compose
            # associatively — (A2,B2)∘(A1,B1) = (A2A1, A2B1+B2) — so the
            # 17-step propagation collapses to ⌈log₂ nIter⌉ levels of
            # batched [26,26]×[26,nU+1] matmuls on the MXU instead of a
            # sequential chain.
            sel_j = np.zeros((cfg.n_iter, nj, nU))
            sel_t = np.zeros((cfg.n_iter, nt, nU))
            for k in range(cfg.n_iter):
                jc = sched.joint_knot_of_step[k] * nj
                sel_j[k, :, jc:jc + nj] = np.eye(nj)
                tc = nj * ch + sched.throttle_knot_of_step[k] * nt
                sel_t[k, :, tc:tc + nt] = np.eye(nt)
            dts = jnp.asarray(np.asarray(sched.dts), dt_)    # [nIter]
            Ads = eye + dts[:, None, None] * lin.Ac
            M = dts[:, None, None] * (lin.BJ @ jnp.asarray(sel_j, dt_)
                                      + lin.BT @ jnp.asarray(sel_t, dt_))
            b = dts[:, None] * lin.c                          # [nIter, 26]
            Baug = jnp.concatenate([M, b[:, :, None]], axis=2)

            def comb(f_map, g_map):
                A1, B1 = f_map
                A2, B2 = g_map
                return A2 @ A1, A2 @ B1 + B2

            A_cum, B_cum = jax.lax.associative_scan(comb, (Ads, Baug))
            F_all = B_cum[:, :, :nU]                   # [nIter, 26, nU]
            f_all = (jnp.einsum("kab,b->ka", A_cum, x0)
                     + B_cum[:, :, nU])                # [nIter, 26]
        elif cfg.condense_mode == "structured" and cfg.use_jet_dynamic:
            F_all, f_all = _structured_chain(cfg, sched, lin, x0)
        elif cfg.condense_mode == "paired":
            F_all, f_all = _paired_chain(cfg, sched, lin, x0)
        elif cfg.condense_mode in ("sequential", "structured"):
            # NOTE: an augmented-column variant (f riding as column nU of
            # F, one [26, nU+1] matmul per step) measured SLOWER on chip
            # (4.57 vs 3.78 ms at batch 512) — the separate matvec fuses
            # better than the wider stacked layout. Keep the plain chain.
            Fs, fs = [], []
            F = jnp.zeros((ns, nU), dt_)
            f = x0
            for k in range(cfg.n_iter):
                dtk = sched.dts[k]
                Ad = eye + dtk * lin.Ac
                Mk = jnp.zeros((ns, nU), dt_)
                jc = sched.joint_knot_of_step[k] * nj
                Mk = Mk.at[:, jc:jc + nj].add(dtk * lin.BJ)
                tc = nj * ch + sched.throttle_knot_of_step[k] * nt
                Mk = Mk.at[:, tc:tc + nt].add(dtk * lin.BT)
                F = Ad @ F + Mk
                f = Ad @ f + dtk * lin.c
                Fs.append(F)
                fs.append(f)
            F_all = jnp.stack(Fs)                      # [nIter, 26, nU]
            f_all = jnp.stack(fs)                      # [nIter, 26]
        else:
            raise ValueError(
                f"unknown condense_mode {cfg.condense_mode!r}; "
                "expected 'assoc', 'sequential', 'structured' or 'paired'")
        r = state_reference.T                      # [nIter, 26]
        # contract only over weighted states (thrust/thrustDot rows carry no
        # tracking cost — 18 of 26 rows for the stock weights): static
        # gather, ~30% off the dominant H_c MXU contraction
        w_idx = weighted_state_indices(cfg)
        if len(w_idx) < ns:
            sel_w = jnp.asarray(w_idx)
            Fw = F_all[:, sel_w, :]
            qw = q_diag[sel_w]
            H = jnp.einsum("kan,a,kam->nm", Fw, qw, Fw) + H_u
            q = jnp.einsum("kan,a,ka->n", Fw, qw,
                           (f_all - r)[:, sel_w])
        else:
            H = jnp.einsum("kan,a,kam->nm", F_all, q_diag, F_all) + H_u
            q = jnp.einsum("kan,a,ka->n", F_all, q_diag, f_all - r)
        q = q.at[:nj * ch].add(jnp.tile(joint_reg_grad, ch))
        q = q.at[nj * ch:nj * ch + nt].add(throttle_init_grad)

    v_min = jm.throttle_to_v(jnp.asarray(cfg.throttle_min, dt_))
    v_max = jm.throttle_to_v(jnp.asarray(cfg.throttle_max, dt_))
    v_applied = jm.throttle_to_v(throttle_cmd)
    nbt = nt * cfg.n_throttle_knots
    lb_t = jnp.full((nbt,), v_min, dt_)
    ub_t = jnp.full((nbt,), v_max, dt_)
    lo0 = jnp.where(pin_first_knot, v_applied, lb_t[:nt])
    hi0 = jnp.where(pin_first_knot, v_applied, ub_t[:nt])
    lb_t = lb_t.at[:nt].set(lo0)
    ub_t = ub_t.at[:nt].set(hi0)
    if cfg.use_joint_position_constraint:
        # joint-delta box per knot: remaining range to the deg limits from
        # the current integrated position (constraintsVSMPC.cpp:434-456)
        q_min = jnp.asarray(np.deg2rad(cfg.joint_pos_min_deg), dt_)
        q_max = jnp.asarray(np.deg2rad(cfg.joint_pos_max_deg), dt_)
        lb_j = jnp.tile(q_min - joint_pos_ctrl, ch)
        ub_j = jnp.tile(q_max - joint_pos_ctrl, ch)
        lb = jnp.concatenate([lb_j, lb_t])
        ub = jnp.concatenate([ub_j, ub_t])
    else:
        lb, ub = lb_t, ub_t
    return CondensedQP(H=H, q=q, lb=lb, ub=ub, F=F_all, f=f_all)


def setup(cfg: MPCConfig, qp: CondensedQP, settings: admm.ADMMSettings):
    """One-time solver setup from the configure-time QP: frozen equilibration
    plus the only exact factorisation of the run (OSQP's setup phase,
    IMPCProblem.cpp:140-145,221-236). Returns ``(scaling, kinv0, rho_vec0,
    rho_scalar0)`` to seed the cross-tick carry."""
    nU = qp.H.shape[0]
    n_box = qp.lb.shape[0]
    box0 = nU - n_box
    dt_ = qp.H.dtype
    with jax.default_matmul_precision("highest"):
        H, q, scaling = equilibrate(qp.H, qp.q, box0,
                                    settings.scaling_iters, dt_)
        E = 1.0 / scaling.D[box0:]
        lb, ub = E * qp.lb, E * qp.ub
        eq = (ub - lb) < settings.eq_tol
        rho_scalar = jnp.asarray(settings.rho, dt_)
        rho_vec = jnp.where(eq, rho_scalar * settings.rho_eq_scale,
                            rho_scalar)
        K = H + settings.sigma * jnp.eye(nU, dtype=dt_)
        K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(rho_vec)
        chol = jnp.linalg.cholesky(K)
        kinv = jax.lax.linalg.triangular_solve(
            chol,
            jax.lax.linalg.triangular_solve(
                chol, jnp.eye(nU, dtype=dt_), left_side=True, lower=True),
            left_side=True, lower=True, transpose_a=True)
    return scaling, kinv, rho_vec, rho_scalar


def solve(cfg: MPCConfig, qp: CondensedQP,
          settings: admm.ADMMSettings, warm_u=None, warm_y=None,
          scaling: CondensedScaling = None, kinv_prev=None, rho_prev=None,
          rho_scalar_prev=None) -> CondensedSolution:
    """Box-constrained ADMM with selector structure + Schur polish.

    With ``kinv_prev``/``rho_prev`` (and a frozen ``scaling``), the one
    expensive batched Cholesky disappears from the tick entirely: the carried
    (K(ρ))⁻¹ from the previous 5 ms tick is refreshed against the current H
    by a rank-n_box Woodbury + Newton–Schulz pass — the 200 Hz relinearisation
    drift is tiny, so two NS steps recover factorisation-grade accuracy
    (quadratic convergence). This is the cross-tick extension of the
    reference's constant-Hessian/one-setup OSQP exploitation
    (IMPCProblem.cpp:152-175).
    """
    nU = qp.H.shape[0]
    n_box = qp.lb.shape[0]
    box0 = nU - n_box                       # throttle tail offset
    dt_ = qp.H.dtype

    with jax.default_matmul_precision("highest"):
        # --- Ruiz equilibration on [[H, Sᵀ],[S, 0]]; S is a selector, so its
        # row/col norms are 1 after the first pass — equilibrate H + cost.
        # Frozen setup-time scaling when provided (OSQP semantics).
        if scaling is None:
            H, q, scaling = equilibrate(qp.H, qp.q, box0,
                                        settings.scaling_iters, dt_)
        else:
            H = scaling.c * (scaling.D[:, None] * qp.H * scaling.D[None, :])
            q = scaling.c * (scaling.D * qp.q)
        D, c_s = scaling.D, scaling.c
        E = 1.0 / D[box0:]                 # row scaling of S D = diag(D_box)
        lb, ub = E * qp.lb, E * qp.ub

        eq = (ub - lb) < settings.eq_tol
        rho_scalar0 = (jnp.asarray(settings.rho, dt_)
                       if rho_scalar_prev is None else rho_scalar_prev)
        # a non-solved tick may carry non-finite solver state; never let it
        # poison the next 5 ms tick (the reference gets this for free by
        # re-setup, variableSamplingMPC.cpp:91)
        rho_scalar0 = jnp.where(
            jnp.isfinite(rho_scalar0) & (rho_scalar0 > 0),
            rho_scalar0, jnp.asarray(settings.rho, dt_))
        rho0 = jnp.where(eq, rho_scalar0 * settings.rho_eq_scale, rho_scalar0)

        def factor(rho_vec):
            K = H + settings.sigma * jnp.eye(nU, dtype=dt_)
            K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(rho_vec)
            chol = jnp.linalg.cholesky(K)
            # explicit inverse: iterations become pure matmuls on the MXU
            return jax.lax.linalg.triangular_solve(
                chol,
                jax.lax.linalg.triangular_solve(
                    chol, jnp.eye(nU, dtype=dt_), left_side=True, lower=True),
                left_side=True, lower=True, transpose_a=True)

        def woodbury(Kinv, rho_old, rho_new, n_ns=settings.ns_steps):
            """(K(ρ_new))⁻¹ from (K(ρ_old))⁻¹ — ρ only perturbs the n_box
            diagonal entries of K, so the one setup-time Cholesky is the
            *only* factorisation per solve: a rank-n_box update (two
            120×n_box matmuls + one n_box×n_box solve) plus
            ``settings.ns_steps`` Newton–Schulz steps replaces what the
            reference does with a fresh OSQP setup. All matmuls — no sequential Cholesky /
            triangular solves, which dominate the batched solve on TPU.

            The Newton refinement matters: adaptive ρ can walk to ρ_min
            where K is nearly singular (λ_min(H) ~ 1e-7 after
            equilibration) and the raw f32 Woodbury correction stalls the
            dual-residual descent; X ← X(2I − KX) squares the inverse
            residual back to Cholesky-grade accuracy.
            """
            d = rho_new - rho_old
            M = jnp.eye(n_box, dtype=dt_) + d[:, None] * Kinv[box0:, box0:]
            B = d[:, None] * Kinv[box0:, :]
            if n_box <= 32:
                X = _gj_inverse(M) @ B
            else:
                X = jnp.linalg.solve(M, B)
            Knew = Kinv - Kinv[:, box0:] @ X
            return ns_polish(Knew, rho_new, n_ns)

        def ns_polish(Kinv_l, rho_new, n_ns):
            """Newton–Schulz against K built from the *current* H — the
            drift-absorbing half of the refresh, also used standalone when
            ρ is unchanged and the rank-update half can be skipped."""
            K = H + settings.sigma * jnp.eye(nU, dtype=dt_)
            K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(rho_new)
            for _ in range(n_ns):
                Kinv_l = Kinv_l @ (2.0 * jnp.eye(nU, dtype=dt_) - K @ Kinv_l)
            return 0.5 * (Kinv_l + Kinv_l.T)

        x = jnp.zeros((nU,), dt_) if warm_u is None else warm_u / D
        y = jnp.zeros((n_box,), dt_) if warm_y is None else warm_y * c_s / E
        # warm starts come from the previous tick's iterate even on
        # non-solved ticks — sanitize so one failed solve cannot cascade
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        y = jnp.where(jnp.isfinite(y), y, 0.0)
        z = jnp.clip(x[box0:], lb, ub)

        def run_segment(Kinv, rho_vec, x, z, y, length):
            def body(carry, _):
                x, z, y = carry
                rhs = settings.sigma * x - q
                rhs = rhs.at[box0:].add(rho_vec * z - y)
                x_t = Kinv @ rhs
                z_t = x_t[box0:]
                x_n = settings.alpha * x_t + (1 - settings.alpha) * x
                z_rel = settings.alpha * z_t + (1 - settings.alpha) * z
                z_un = z_rel + y / rho_vec
                z_n = jnp.clip(z_un, lb, ub)
                y_n = rho_vec * (z_un - z_n)
                return (x_n, z_n, y_n), None
            (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=length)
            return x, z, y

        # --- fused Pallas path for the hot primitives (ops/pallas_solve) --
        # The segment kernel keeps K⁻¹ resident in VMEM across iterations
        # (the lax.scan form re-reads it from HBM every iteration); the
        # Woodbury kernel fuses the rank-n_box update, the n_box×n_box
        # Gauss-Jordan inverse and the Newton–Schulz polish.
        use_pl = admm.pallas_enabled(settings)
        if use_pl:
            P = pallas_solve._pad_to(nU)

            def lift(A):                       # [nU, nU] → lane-padded
                return jnp.pad(A, ((0, P - nU), (0, P - nU)))

            def lower(Ap):
                return Ap[:nU, :nU]

            def to_full(vb):                   # box layout → full layout
                return jnp.zeros((nU,), dt_).at[box0:].set(vb)

            def pv(v):                         # [nU] → [1, P]
                return jnp.pad(v, (0, P - nU))[None, :]

            H_p = lift(H)
            q_f = pv(q)
            big = jnp.asarray(settings.inf_bound, dt_)
            lb_f = pv(jnp.full((nU,), -big, dt_).at[box0:].set(lb))
            ub_f = pv(jnp.full((nU,), big, dt_).at[box0:].set(ub))

            # fused for any box width: the kernel's GJ buffer spans
            # ceil(2·n_box/128) lane tiles, so the joint-limits config
            # (n_box=120, box0=0) keeps the fused latency path too
            def woodbury_k(Kinv_p, rho_old, rho_new,
                           n_ns=settings.ns_steps):
                d_col = jnp.pad(to_full(rho_new - rho_old),
                                (0, P - nU))[:, None]
                r_col = jnp.pad(to_full(rho_new), (0, P - nU))[:, None]
                return pallas_solve.woodbury_ns(
                    Kinv_p, H_p, d_col, r_col, box0=box0, n_box=n_box,
                    sigma=settings.sigma, n_ns=n_ns)

            def run_segment_k(Kinv_p, rho_vec, x, z, y, length):
                rho_f = pv(to_full(rho_vec))
                rhoi_f = pv(to_full(1.0 / rho_vec))
                xf, zf, yf = pallas_solve.admm_segment(
                    Kinv_p, q_f, lb_f, ub_f, rho_f, rhoi_f,
                    pv(x), pv(to_full(z)), pv(to_full(y)),
                    sigma=settings.sigma, alpha=settings.alpha,
                    length=length)
                return xf[0, :nU], zf[0, box0:nU], yf[0, box0:nU]
        else:
            lift = lower = lambda A: A
            woodbury_k, run_segment_k = woodbury, run_segment

        def residuals(x, z, y):
            pri = jnp.max(jnp.abs((x[box0:] - z) / E))
            grad = H @ x + q
            grad = grad.at[box0:].add(y)
            dua = jnp.max(jnp.abs(grad / D)) / c_s
            pri_s = jnp.maximum(jnp.max(jnp.abs(x[box0:] / E)),
                                jnp.max(jnp.abs(z / E)))
            dua_s = jnp.max(jnp.abs((H @ x) / D)) / c_s
            return pri, dua, pri_s, dua_s

        def k_apply(v, rho_v):
            """K(ρ)·v without materialising K."""
            Kv = H @ v + settings.sigma * v
            return Kv.at[box0:].add(rho_v * v[box0:])

        def kinv_probe_resid(Kinv_l, rho_v):
            """Inverse-quality residual via three probe matvecs.

            The guard exists to catch carried inverses that left the
            Newton–Schulz contraction basin (big inter-tick state jump /
            NaN carry) — a blown inverse is wrong in every direction, so
            ‖K·(X v) − v‖∞ on fixed probes detects it at matvec cost
            instead of the [nU,nU] ‖I − K·X‖ matmul (measured ~1.2 ms per
            batched tick at 512 lanes, ~10% of the whole tick, spent
            re-verifying good inverses). NOTE this is a LOWER bound on the
            true inverse residual — error concentrated in directions near
            the probes' joint null space can pass. The third probe has its
            support entirely on the box coordinates (where ρ perturbs K's
            diagonal), so a ρ-jump-concentrated error cannot hide from it;
            residual directions the probes still miss only cost extra ADMM
            iterations (status comes from true residuals against H, and
            kinv_guard re-factorises above 0.1)."""
            v1 = jnp.ones((nU,), dt_).at[1::2].set(-1.0)
            v2 = jnp.linspace(-1.0, 1.0, nU, dtype=dt_)
            v3 = jnp.zeros((nU,), dt_).at[box0:].set(
                jnp.ones((n_box,), dt_).at[1::2].set(-1.0))
            r1 = jnp.max(jnp.abs(k_apply(Kinv_l @ v1, rho_v) - v1))
            r2 = jnp.max(jnp.abs(k_apply(Kinv_l @ v2, rho_v) - v2))
            r3 = jnp.max(jnp.abs(k_apply(Kinv_l @ v3, rho_v) - v3))
            return jnp.maximum(jnp.maximum(r1, r2), r3)

        marks = [i for i in settings.rho_update_iters if i < settings.max_iter]
        bounds = [0] + marks + [settings.max_iter]
        rho_scalar = rho_scalar0
        rho_vec = rho0
        guard_fired = jnp.asarray(False)
        if kinv_prev is None:
            Kinv = lift(factor(rho_vec))
        else:
            # refresh the carried inverse: exact rank-n_box correction for
            # the ρ pattern change (pin toggle / carried adaptive ρ) and NS
            # polish against K built from the *current* H — one pass absorbs
            # both the ρ jump and the 5 ms relinearisation drift.
            kp = jnp.where(jnp.isfinite(kinv_prev), kinv_prev, 0.0)
            rp = jnp.where(jnp.isfinite(rho_prev) & (rho_prev > 0),
                           rho_prev, rho_vec)

            def with_resid(k_p):
                # recovery-guard residual of a refreshed inverse, computed
                # INSIDE the refresh branches so the skip path can reuse its
                # gate residual instead of re-probing the untouched carry
                if settings.kinv_guard:
                    return k_p, kinv_probe_resid(lower(k_p), rho_vec)
                return k_p, jnp.asarray(0.0, dt_)

            resid = None
            # ns_skip_tol > 0: probe the carried inverse against the
            # CURRENT K(H, ρ) first — the probe sees both the 5 ms
            # relinearisation drift and any ρ jump, so a fresh-enough
            # inverse skips the refresh work entirely (see the
            # ADMMSettings.ns_skip_tol docstring for the residual bound).
            if settings.guard_axis is None:
                if settings.ns_skip_tol > 0:
                    r0 = kinv_probe_resid(kp, rho_vec)
                    stale = ~jnp.isfinite(r0) | (r0 > settings.ns_skip_tol)
                    Kinv, resid = jax.lax.cond(
                        stale,
                        lambda k: with_resid(woodbury_k(lift(k), rp,
                                                        rho_vec)),
                        lambda k: (lift(k), r0), kp)
                else:
                    Kinv = woodbury_k(lift(kp), rp, rho_vec)
            else:
                # batched-guarded path: ρ differs from the carry only when
                # the 20-tick pin pattern toggled (~5% of ticks), so the
                # rank-n_box correction is skipped — via a REAL branch,
                # psum-reduced over the batch axis — whenever no lane's ρ
                # moved; the NS polish against the current H (the part
                # that absorbs relinearisation drift) runs unless every
                # lane's probe residual is already inside ns_skip_tol.
                d_any = jax.lax.psum(
                    jnp.any(jnp.abs(rho_vec - rp) > 0).astype(jnp.int32),
                    settings.guard_axis)
                if settings.ns_skip_tol > 0:
                    # r0/n_stale are dead when d_any > 0 (the Woodbury
                    # branch re-probes), but ρ only moves on ~5% of ticks
                    # (pin toggles) — on the 95% common path they ARE the
                    # gate, and hoisting the psum inside the cond branch
                    # would trade that sliver for a collective-inside-
                    # vmapped-cond composition risk. Kept unconditional.
                    r0 = kinv_probe_resid(kp, rho_vec)
                    n_stale = jax.lax.psum(
                        (~jnp.isfinite(r0)
                         | (r0 > settings.ns_skip_tol)).astype(jnp.int32),
                        settings.guard_axis)

                    def polish_fn(k):
                        return jax.lax.cond(
                            n_stale > 0,
                            lambda kk: with_resid(lift(ns_polish(
                                lower(kk), rho_vec, settings.ns_steps))),
                            lambda kk: (kk, r0), k)
                else:
                    def polish_fn(k):
                        return with_resid(lift(ns_polish(
                            lower(k), rho_vec, settings.ns_steps)))
                Kinv, resid = jax.lax.cond(
                    d_any > 0,
                    lambda k: with_resid(woodbury_k(k, rp, rho_vec)),
                    polish_fn,
                    lift(kp))
            if settings.kinv_guard:
                # Newton–Schulz only contracts from ‖I − K·X‖ < 1: a large
                # inter-tick state jump (gust, contact, reset) can push the
                # carried inverse outside the basin and the refresh
                # diverges. Verify the inverse residual and re-factorise on
                # failure — lax.cond, so the real-time batch-1 path pays
                # the Cholesky only on the (rare) bad tick.
                if resid is None:
                    resid = kinv_probe_resid(lower(Kinv), rho_vec)
                bad = ~jnp.isfinite(resid) | (resid > 0.1)
                guard_fired = bad
                if settings.guard_axis is not None:
                    # Batch-level guard: under vmap(axis_name=guard_axis)
                    # a plain lax.cond on the per-lane flag lowers to
                    # select-with-both-branches and every tick pays the
                    # fallback Cholesky (~2x throughput). psum over the
                    # batch axis instead: vmap's collective batching rule
                    # returns an UNbatched any-lane-bad scalar, the cond
                    # survives as a real branch, and only ticks with an
                    # actual bad lane pay the batched refactorisation
                    # (applied per-lane via where).
                    n_bad = jax.lax.psum(bad.astype(jnp.int32),
                                         settings.guard_axis)
                    Kinv = jax.lax.cond(
                        n_bad > 0,
                        lambda k: jnp.where(bad, lift(factor(rho_vec)), k),
                        lambda k: k, Kinv)
                else:
                    Kinv = jax.lax.cond(
                        bad, lambda _: lift(factor(rho_vec)),
                        lambda k: k, Kinv)
        def converged(x, z, y):
            pri, dua, pri_s, dua_s = residuals(x, z, y)
            return ((pri <= settings.eps_abs + settings.eps_rel * pri_s)
                    & (dua <= settings.eps_abs + settings.eps_rel * dua_s))

        def not_all_done(done):
            """Early-exit predicate: any lane still unconverged — psum over
            guard_axis makes it unbatched so the chunk cond survives vmap
            as a real branch (the kinv_guard mechanism)."""
            if settings.guard_axis is not None:
                return jax.lax.psum((~done).astype(jnp.int32),
                                    settings.guard_axis) > 0
            return ~done

        def run_segment_early(Kinv, rho_vec, x, z, y, length, global_pos):
            """term_check_every-chunked segment with all-lanes-converged
            skip (ADMMSettings.term_check_every; OSQP's check-every-25
            termination, IMPCProblem.cpp:279-297, in lockstep-batch form).
            The very first chunk of the solve runs unconditionally — the
            warm-started iterate has not been checked and is almost never
            already converged."""
            ce = settings.term_check_every
            if ce <= 0:
                return run_segment_k(Kinv, rho_vec, x, z, y, length)
            pos = 0
            while pos < length:
                n = min(ce, length - pos)
                if global_pos + pos == 0:
                    x, z, y = run_segment_k(Kinv, rho_vec, x, z, y, n)
                else:
                    x, z, y = jax.lax.cond(
                        not_all_done(converged(x, z, y)),
                        lambda s, n=n: run_segment_k(Kinv, rho_vec, *s, n),
                        lambda s: s, (x, z, y))
                pos += n
            return x, z, y

        for si in range(len(bounds) - 1):
            x, z, y = run_segment_early(Kinv, rho_vec, x, z, y,
                                        bounds[si + 1] - bounds[si],
                                        bounds[si])
            if si < len(bounds) - 2:
                pri, dua, pri_s, dua_s = residuals(x, z, y)
                ratio = jnp.sqrt((pri / jnp.maximum(pri_s, 1e-12))
                                 / jnp.maximum(dua / jnp.maximum(dua_s, 1e-12),
                                               1e-12))
                upd = (ratio > settings.adaptive_rho_tolerance) | (
                    ratio < 1.0 / settings.adaptive_rho_tolerance)
                if settings.term_check_every > 0:
                    # OSQP never re-tunes ρ after termination: a converged
                    # lane keeps its ρ (and the carried K⁻¹ stays valid)
                    done_here = ((pri <= settings.eps_abs
                                  + settings.eps_rel * pri_s)
                                 & (dua <= settings.eps_abs
                                    + settings.eps_rel * dua_s))
                    upd = upd & ~done_here
                rho_scalar = jnp.where(
                    upd, jnp.clip(rho_scalar * ratio, settings.rho_min,
                                  settings.rho_max), rho_scalar)
                rho_new = jnp.where(eq, rho_scalar * settings.rho_eq_scale,
                                    rho_scalar)
                rho_new = jnp.where(upd, rho_new, rho_vec)
                if settings.guard_axis is None:
                    Kinv = woodbury_k(Kinv, rho_vec, rho_new)
                else:
                    # with a carried warm start most ticks keep ρ: skip
                    # the Woodbury+NS refresh via a REAL branch when no
                    # lane's adaptive-ρ test fired (psum over the batch
                    # axis, same mechanism as the recovery guard)
                    n_upd = jax.lax.psum(upd.astype(jnp.int32),
                                         settings.guard_axis)
                    Kinv = jax.lax.cond(
                        n_upd > 0,
                        lambda k: woodbury_k(k, rho_vec, rho_new),
                        lambda k: k, Kinv)
                rho_vec = rho_new

        kinv_out, rho_out, rho_scalar_out = lower(Kinv), rho_vec, rho_scalar

        # --- Schur polish on the active box set ---------------------------
        if settings.polish:
            def do_polish(ops):
                x, z, y = ops
                delta = jnp.asarray(settings.delta_polish, dt_)
                low = (y < 0) | eq
                up = (y > 0) | eq
                active = (low | up).astype(dt_)
                b_act = jnp.where(y < 0, lb, ub)
                b_act = jnp.where(eq, ub, b_act)
                # KKT [[H+δI, Sᵀ_a],[S_a, -δI]] reduced:
                # (H + δI + SᵀaSa/δ) x = -q + Sᵀa b/δ
                rhs = -q
                rhs = rhs.at[box0:].add(active * b_act / delta)
                if settings.delta_polish == settings.sigma:
                    # G = K + Sᵀ(active/δ − ρ)S: reuse the setup
                    # factorisation. polish_ns_steps (not ns_steps): the
                    # refine iterations below run against the exact
                    # operator and absorb a less polished inverse.
                    Ginv = lower(woodbury_k(Kinv, rho_vec, active / delta,
                                            settings.polish_ns_steps))

                    def g_apply(v):
                        Gv = H @ v + delta * v
                        return Gv.at[box0:].add(active * v[box0:] / delta)

                    x_p = Ginv @ rhs
                    for _ in range(settings.polish_refine_iters):
                        x_p = x_p + Ginv @ (rhs - g_apply(x_p))
                else:
                    G = H + delta * jnp.eye(nU, dtype=dt_)
                    G = G.at[jnp.arange(box0, nU),
                             jnp.arange(box0, nU)].add(active / delta)
                    cholG = jnp.linalg.cholesky(G)
                    x_p = admm._cho_solve(cholG, rhs)
                    for _ in range(settings.polish_refine_iters):
                        # refinement against the same regularised operator
                        r = rhs - (G @ x_p)
                        x_p = x_p + admm._cho_solve(cholG, r)
                y_p = jnp.where(active > 0, (x_p[box0:] - b_act) / delta,
                                0.0)
                z_p = jnp.clip(x_p[box0:], lb, ub)
                p0, d0, _, _ = residuals(x, z, y)
                p1, d1, _, _ = residuals(x_p, z_p, y_p)
                better = (p1 + d1) < (p0 + d0)
                return (jnp.where(better, x_p, x),
                        jnp.where(better, z_p, z),
                        jnp.where(better, y_p, y))

            # NOTE a conditional polish (skip via psum-guarded cond when
            # every lane is already ~100x inside tolerance) measured
            # NEUTRAL-to-negative at batch 1024 on chip (43.3/43.9/42.1k
            # vs 47.1k unconditional under comparable tunnel health): the
            # 0-NS Schur polish is only ~1 ms of the batched tick and the
            # branch machinery eats the saving. Unconditional it stays.
            x, z, y = do_polish((x, z, y))

        pri, dua, pri_s, dua_s = residuals(x, z, y)
        solved = ((pri <= settings.eps_abs + settings.eps_rel * pri_s)
                  & (dua <= settings.eps_abs + settings.eps_rel * dua_s))
        inacc = ((pri <= 10 * (settings.eps_abs + settings.eps_rel * pri_s))
                 & (dua <= 10 * (settings.eps_abs + settings.eps_rel * dua_s)))
        status = jnp.where(solved, admm.SOLVED,
                           jnp.where(inacc, admm.SOLVED_INACCURATE,
                                     admm.MAX_ITER_REACHED))
        u = x * D
        states = jnp.einsum("kan,n->ka", qp.F, u) + qp.f
    return CondensedSolution(
        u=u, y=y * E / c_s, states=states, status=status.astype(jnp.int32),
        pri_res=pri, dua_res=dua, kinv=kinv_out, rho_vec=rho_out,
        rho_scalar=rho_scalar_out, guard_fired=guard_fired)
