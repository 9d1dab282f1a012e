"""Continuous-time linearised dynamics of the 26-state centroidal+jet model.

Re-expression of the reference's three dynamics blocks, which are summed into
one system ẋ = Ac x + BJ Δq + BT v + c:

- angular momentum + RPY kinematics + RPY-error integrator
  (``AngularMomentumDynamicVS``, systemDynamicsVSMPC.cpp:79-206)
- CoM + linear momentum + gravity ramp + CoM-error integrator
  (``LinearMomentumDynamicVS``, systemDynamicsVSMPC.cpp:288-350)
- jet thrust second-order dynamics (``JetDynamicVS``,
  systemDynamicsVSMPC.cpp:384-429)

Unlike the reference (per-block 26x26 dense matrices summed via virtual
dispatch), this is one pure function writing static sub-blocks — XLA sees
only fused gathers/scatters with trace-time indices. Everything broadcasts:
vmap over scenarios gives batched linearisation for free.

Momentum states are in *body* coordinates; `Ac` rows follow the layout in
``core.constants``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import constants as C
from ..core.config import MPCConfig
from ..core.types import RobotSnapshot
from ..ops import jet_model as jm
from ..ops.so3 import euler_rate_matrix_inv, inv3, matrix_to_rpy, skew


class LinearizedDynamics(NamedTuple):
    Ac: jnp.ndarray  # [26, 26]
    BJ: jnp.ndarray  # [26, n_ctrl_joints]
    BT: jnp.ndarray  # [26, 4]
    c: jnp.ndarray   # [26]


class LambdaInit(NamedTuple):
    """Configure-time quantities for the 'constant' jointsLambdaOption and the
    constant RPY-error integrator reference (systemDynamicsVSMPC.cpp:54-56,67)."""

    rel_jac_lin: jnp.ndarray        # [4,3,J] linear rows of relative jacobians at t0
    rel_jac_ang: jnp.ndarray        # [4,3,J] angular rows of relative jacobians at t0
    jet_axes_world: jnp.ndarray     # [4,3] jet axes at t0 (world)
    jet_arms_world: jnp.ndarray     # [4,3] jet arms at t0 (world)
    rpy_init: jnp.ndarray           # [3] base RPY at configure time


def lambda_lin(cfg: MPCConfig, snap: RobotSnapshot, init: LambdaInit,
               joint_sel) -> jnp.ndarray:
    """Linear-momentum/joint coupling λ_lin [3, n_ctrl].

    λ = -Σᵢ Tᵢ S(Rᵀaᵢ) J_rel_ang,ᵢ then slice columns. The reference slices
    ``middleCols(3, 8)`` — a hard-coded arm-joint block
    (systemDynamicsVSMPC.cpp:321-349); we honour the same slice.
    """
    Rt = snap.w_R_b.T
    if cfg.joints_lambda_option == "constant":
        axes, jac = init.jet_axes_world, init.rel_jac_ang
    else:  # "unfiltered"
        axes, jac = snap.jet_axes_world, snap.rel_jac_ang
    a_body = axes @ Rt.T                      # [4,3]: each row Rᵀ aᵢ
    terms = -snap.jet_thrusts[:, None, None] * (skew(a_body) @ jac)  # [4,3,J]
    lam = jnp.sum(terms, axis=0)              # [3,J]
    return lam[:, 3:3 + cfg.n_ctrl_joints]


def lambda_ang(cfg: MPCConfig, snap: RobotSnapshot, init: LambdaInit,
               joint_sel) -> jnp.ndarray:
    """Angular-momentum/joint coupling λ_ang [3, n_ctrl].

    Two terms per jet (systemDynamicsVSMPC.cpp:159-206):
      -Tᵢ S(Rᵀaᵢ) J_relCoM,ᵢ  with J_relCoM = Rᵀ(J_jet,lin − J_com)
      -Tᵢ S(Rᵀrᵢ) S(Rᵀaᵢ) J_rel_ang,ᵢ
    Columns picked by the name-based joint selector (not the fixed slice —
    the reference differs between the two λ's; systemDynamicsVSMPC.cpp:202-205).
    """
    Rt = snap.w_R_b.T
    if cfg.joints_lambda_option == "constant":
        # (systemDynamicsVSMPC.cpp:187-199): S_i = T·[S(Rᵀa) | S(Rᵀr)S(Rᵀa)]
        # applied to the full 6-row configure-time relative jacobian.
        a_body = init.jet_axes_world @ Rt.T
        r_body = init.jet_arms_world @ Rt.T
        terms = -snap.jet_thrusts[:, None, None] * (
            skew(a_body) @ init.rel_jac_lin
            + skew(r_body) @ skew(a_body) @ init.rel_jac_ang)
        lam = jnp.sum(terms, axis=0)
    else:
        a_body = snap.jet_axes_world @ Rt.T               # [4,3]
        r_body = snap.jet_arms_world @ Rt.T               # [4,3]
        jac_rel_com = jnp.einsum(
            "ab,jbn->jan", Rt, snap.jac_jets_lin_joints - snap.jac_com_joints[None])
        term1 = -snap.jet_thrusts[:, None, None] * (skew(a_body) @ jac_rel_com)
        term2 = -snap.jet_thrusts[:, None, None] * (
            skew(r_body) @ skew(a_body) @ snap.rel_jac_ang)
        lam = jnp.sum(term1 + term2, axis=0)
    sel = jnp.asarray(joint_sel)
    return lam[:, sel]


def linearize(cfg: MPCConfig, snap: RobotSnapshot, init: LambdaInit,
              joint_sel, *, alpha_gravity, pos_com_ref_now,
              est_thrust_dot, thrust_des, thrust_dot_des,
              throttle_cmd) -> LinearizedDynamics:
    """Build the summed continuous-time system at the current state.

    Assembly is a single block-concatenation per output (row bands built
    from zero/identity/data blocks), not ``.at[].set`` scatters on a zero
    matrix: each scatter lowers to its own dynamic-update-slice pass over
    the whole [batch, 26, 26] buffer, and the ~14 of them measured
    ~1 ms/tick of the batch-256 chained MPC tick — the single most
    expensive piece of the tick — while the fused concatenation is one
    copy per output.
    """
    dt_ = snap.w_R_b.dtype
    n = cfg.n_states
    assert n == C.N_STATES, "block layout hard-codes the VSconstant order"
    nj = cfg.n_ctrl_joints

    R = snap.w_R_b
    omega_body = R.T @ snap.base_ang_vel_world
    rpy = matrix_to_rpy(R)
    Winv = euler_rate_matrix_inv(rpy)
    S_omega = skew(omega_body)

    z = lambda r, cc: jnp.zeros((r, cc), dt_)
    eye3 = jnp.eye(3, dtype=dt_)
    eye4 = jnp.eye(4, dtype=dt_)
    cat = lambda *blocks: jnp.concatenate(blocks, axis=-1)

    # --- per-band data (systemDynamicsVSMPC.cpp:79-103,288-318,384-429) ----
    # column layout [COM 3 | LIN 3 | RPY 3 | ANG 3 | T 4 | Ṫ 4 | PE 3 | RE 3]
    # ċ = (1/m) R h_lin
    rows_com = cat(z(3, 3), R / snap.total_mass, z(3, 20))
    # ḣ_lin = A_lin T − S(ω) h_lin + λ_lin Δq + α m Rᵀ g
    rows_lin = cat(z(3, 3), -S_omega, z(3, 6), snap.amom_jets_body[0:3],
                   z(3, 10))
    # φ̇ = W⁻¹ I⁻¹ h_ω  (closed-form 3x3 inverse: the batched-LU lowering of
    # jnp.linalg.inv is dispatch-bound on TPU)
    rows_rpy = cat(z(3, 9), Winv @ inv3(snap.inertia_locked), z(3, 14))
    # ḣ_ω = A_ang T − S(ω) h_ω + λ_ang Δq
    rows_ang = cat(z(3, 9), -S_omega, snap.amom_jets_body[3:6], z(3, 10))
    # error integrators: ė = c − c_ref(t), ė = φ − φ_init (constant
    # configure-time ref; systemDynamicsVSMPC.cpp:97-100)
    rows_pe = cat(eye3, z(3, 23))
    rows_re = cat(z(3, 6), eye3, z(3, 17))

    gravity = jnp.asarray([0.0, 0.0, -9.81], dt_)
    c_lin = alpha_gravity * snap.total_mass * (R.T @ gravity)

    # --- jet block (systemDynamicsVSMPC.cpp:384-429) -----------------------
    if cfg.use_jet_dynamic:
        if cfg.use_estimated_thrust:
            T0, Td0 = snap.jet_thrusts, est_thrust_dot
        else:
            T0, Td0 = thrust_des, thrust_dot_des
        dh_dT = jm.dh_dthrust(T0, Td0, throttle_cmd)
        dh_dTd = jm.dh_dthrust_dot(T0, Td0, throttle_cmd)
        rows_T = cat(z(4, 16), eye4, z(4, 6))        # Ṫ = Ṫ
        rows_Td = cat(z(4, 12), dh_dT[:, None] * eye4,
                      dh_dTd[:, None] * eye4, z(4, 6))
        # effectiveness always linearised at the *desired* thrust state
        # (systemDynamicsVSMPC.cpp:414-415)
        BT = jnp.concatenate(
            [z(16, 4), jm.g_newton(thrust_des, thrust_dot_des)[:, None]
             * eye4, z(6, 4)], axis=-2)
        c_td = jm.f_newton(T0, Td0) - dh_dT * T0 - dh_dTd * Td0
    else:
        # direct thrust passthrough (systemDynamicsVSMPC.cpp:422-426)
        rows_T = z(4, 26)
        rows_Td = z(4, 26)
        BT = jnp.concatenate([z(12, 4), eye4, z(10, 4)], axis=-2)
        c_td = jnp.zeros((4,), dt_)

    Ac = jnp.concatenate([rows_com, rows_lin, rows_rpy, rows_ang,
                          rows_T, rows_Td, rows_pe, rows_re], axis=-2)
    BJ = jnp.concatenate(
        [z(3, nj), lambda_lin(cfg, snap, init, joint_sel), z(3, nj),
         lambda_ang(cfg, snap, init, joint_sel), z(14, nj)], axis=-2)
    c = jnp.concatenate(
        [jnp.zeros((3,), dt_), c_lin, jnp.zeros((3,), dt_),
         jnp.zeros((3,), dt_), jnp.zeros((4,), dt_), c_td,
         -pos_com_ref_now, -init.rpy_init])

    return LinearizedDynamics(Ac, BJ, BT, c)
