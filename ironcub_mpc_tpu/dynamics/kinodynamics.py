"""Floating-base kinodynamics in JAX — the iDynTree-equivalent layer.

Everything ``Robot::setState`` computes (utils/src/Robot.cpp:198-335) —
mass matrix, centroidal momentum (+ matrix), CoM (+ Jacobian), per-frame
Jacobians, relative Jacobians, jet allocation/coupling matrices — plus the
bias forces needed by the JAX plant, re-derived in a single **common-frame
(world-origin Plücker) formulation** rather than iDynTree's recursive
algorithms:

- FK gives every link pose; each link gets a 6×(6+n) spatial Jacobian at the
  world origin built from trace-time path masks (no tree recursion in the
  compiled graph — one fused einsum per quantity);
- the joint-space mass matrix is ``Σ_k J_kᵀ I_k J_k``, total momentum is
  ``Σ_k I_k J_k ν``, bias forces are ``Σ_k J_kᵀ (I_k Ā_k + V_k ×* I_k V_k)``
  with the gravity trick folded into ``Ā_k`` — all MXU-friendly batched
  contractions that `vmap` cleanly over scenario batches.

Generalized velocity convention = iDynTree MIXED: ν = [v_base_origin (world);
ω_base (world); q̇]. Spatial vectors are ordered [linear; angular].
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from ..core.types import RobotSnapshot
from ..ops.so3 import skew
from .model import RobotModel


class LinkState(NamedTuple):
    R: jnp.ndarray      # [L,3,3] world rotations
    p: jnp.ndarray      # [L,3] world origins
    axis_w: jnp.ndarray  # [L,3] world joint axes (child-moving joint; 0 if fixed)


class KinDyn:
    """Precomputes static topology data; all methods are pure and jittable.

    The instance itself is a trace-time constant (numpy masks + python ints);
    array arguments carry the dynamic state.
    """

    def __init__(self, model: RobotModel, dtype=jnp.float32):
        self.model = model
        self.dtype = dtype
        self.n = model.n_joints
        self.L = model.n_links
        self.dof_mask = model.dof_mask()                     # [L, n] bool
        # link index whose frame carries each DOF's joint (child link)
        self.link_of_joint = np.full(self.n, -1, int)
        for i, j in enumerate(model.joint_of_link):
            if j >= 0:
                self.link_of_joint[j] = i
        self._origin_R = jnp.asarray(model.origin_R, dtype)
        self._origin_p = jnp.asarray(model.origin_p, dtype)
        self._axis = jnp.asarray(model.joint_axis, dtype)
        self._mass = jnp.asarray(model.mass, dtype)
        self._com = jnp.asarray(model.com, dtype)
        self._inertia = jnp.asarray(model.inertia, dtype)
        self._mask = jnp.asarray(self.dof_mask, dtype)

    # ------------------------------------------------------------------
    # forward kinematics
    # ------------------------------------------------------------------

    def fk(self, base_R, base_p, q) -> LinkState:
        """World pose of every link (unrolled tree, parents first)."""
        m = self.model
        Rs = [None] * self.L
        ps = [None] * self.L
        Rs[0], ps[0] = base_R, base_p
        axes = [jnp.zeros(3, self.dtype)] * self.L
        for i in range(1, self.L):
            par = m.parent_link[i]
            Rj = self._origin_R[i]
            pj = self._origin_p[i]
            R_pj = Rs[par] @ Rj
            p_i = ps[par] + Rs[par] @ pj
            j = m.joint_of_link[i]
            if j >= 0:
                a = self._axis[i]
                R_q = _axis_angle(a, q[j])
                Rs[i] = R_pj @ R_q
                axes[i] = R_pj @ a
            else:
                Rs[i] = R_pj
            ps[i] = p_i
        axis_w = jnp.zeros((self.L, 3), self.dtype)
        for i in range(1, self.L):
            j = self.model.joint_of_link[i]
            if j >= 0:
                axis_w = axis_w.at[i].set(axes[i])
        return LinkState(R=jnp.stack(Rs), p=jnp.stack(ps), axis_w=axis_w)

    # ------------------------------------------------------------------
    # spatial jacobians at the world origin
    # ------------------------------------------------------------------

    def joint_subspace(self, ls: LinkState):
        """[n, 6] motion subspace of each DOF at the world origin:
        s_j = [p_j × a_j ; a_j]."""
        idx = jnp.asarray(self.link_of_joint)
        a = ls.axis_w[idx]                    # [n,3]
        p = ls.p[idx]                         # [n,3]
        return jnp.concatenate([jnp.cross(p, a), a], axis=-1)

    def base_block(self, base_p):
        """[6,6] base columns at the world origin: [[I, S(p_b)],[0, I]]."""
        top = jnp.concatenate(
            [jnp.eye(3, dtype=self.dtype), skew(base_p)], axis=1)
        bot = jnp.concatenate(
            [jnp.zeros((3, 3), self.dtype), jnp.eye(3, dtype=self.dtype)], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    def link_spatial_jacobians(self, ls: LinkState, base_p):
        """[L, 6, 6+n] spatial Jacobian of every link at the world origin."""
        s = self.joint_subspace(ls)                          # [n,6]
        # mask[i,j]=1 if joint j moves link i
        Jq = jnp.einsum("ij,jk->ikj", self._mask, s)          # [L,6,n]
        Jb = jnp.broadcast_to(self.base_block(base_p), (self.L, 6, 6))
        return jnp.concatenate([Jb, Jq], axis=-1)

    def link_spatial_inertias(self, ls: LinkState, mass=None, inertia=None):
        """[L, 6, 6] spatial inertia of every link at the world origin.

        ``mass``/``inertia`` override the model's nominal inertial
        parameters — the plant-side hook for model-mismatch robustness
        sweeps (the controller keeps linearising against the nominal
        model while the plant flies perturbed parameters)."""
        mass_ = self._mass if mass is None else mass
        inertia_ = self._inertia if inertia is None else inertia
        c_w = ls.p + jnp.einsum("lab,lb->la", ls.R, self._com)  # world CoM
        I_w = jnp.einsum("lab,lbc,ldc->lad", ls.R, inertia_, ls.R)
        Sc = skew(c_w)
        m = mass_[:, None, None]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=self.dtype), (self.L, 3, 3))
        top = jnp.concatenate([m * eye, -m * Sc], axis=-1)
        bot = jnp.concatenate([m * Sc, I_w - m * Sc @ Sc], axis=-1)
        return jnp.concatenate([top, bot], axis=-2), c_w, I_w

    # ------------------------------------------------------------------
    # aggregate quantities
    # ------------------------------------------------------------------

    def mass_matrix(self, J, I_sp):
        """Free-floating mass matrix [6+n, 6+n] (mixed representation).

        = Σ_k J_kᵀ I_k J_k — equals iDynTree's getFreeFloatingMassMatrix
        because the generalized-velocity convention matches.
        """
        return jnp.einsum("lai,lab,lbj->ij", J, I_sp, J)

    def com(self, c_w):
        w = self._mass / jnp.sum(self._mass)
        return jnp.einsum("l,la->a", w, c_w)

    def momentum_matrix_origin(self, J, I_sp):
        """[6, 6+n] momentum map at the world origin: h_O = A_O ν."""
        return jnp.einsum("lab,lbj->aj", I_sp, J)

    def centroidal_momentum_matrix(self, A_O, com):
        """Transport the momentum map to the CoM (world orientation) —
        iDynTree getCentroidalTotalMomentumJacobian."""
        A_G = A_O.at[3:6].add(-skew(com) @ A_O[0:3])
        return A_G

    def com_jacobian(self, J, c_w):
        """[3, 6+n] CoM velocity map (getCenterOfMassJacobian)."""
        # v_comk = [I, -S(c_k)] V_k
        lin = J[:, 0:3, :] - skew(c_w) @ J[:, 3:6, :]
        w = (self._mass / jnp.sum(self._mass))[:, None, None]
        return jnp.sum(w * lin, axis=0)

    def frame_jacobian(self, J, ls: LinkState, link: int, p_frame):
        """[6, 6+n] mixed Jacobian of a frame at world position ``p_frame``."""
        Jl = J[link]
        lin = Jl[0:3] - skew(p_frame) @ Jl[3:6]
        return jnp.concatenate([lin, Jl[3:6]], axis=0)

    def bias_forces(self, J, I_sp, ls: LinkState, base_p, nu, gravity):
        """Generalized bias τ_bias = C(q,ν)ν + G(q): [6+n].

        Common-frame RNEA: Ā_k = J̇_k ν − [g;0]; τ = Σ J_kᵀ(I_k Ā_k + V_k ×* I_k V_k).
        """
        V = jnp.einsum("lab,b->la", J, nu)                   # [L,6]
        # J̇ν per link: joint columns + base column derivative
        idx = jnp.asarray(self.link_of_joint)
        a = ls.axis_w[idx]
        p = ls.p[idx]
        parent_of_joint = np.asarray(
            [self.model.parent_link[l] for l in self.link_of_joint])
        Vp = V[jnp.asarray(parent_of_joint)]                 # parent link vel [n,6]
        w_par = Vp[:, 3:6]
        v_par_O = Vp[:, 0:3]
        a_dot = jnp.cross(w_par, a)                          # [n,3]
        p_dot = v_par_O + jnp.cross(w_par, p)                # [n,3]
        s_dot = jnp.concatenate(
            [jnp.cross(p_dot, a) + jnp.cross(p, a_dot), a_dot], axis=-1)  # [n,6]
        qd = nu[6:]
        Jdot_nu_q = jnp.einsum("lj,jk,j->lk", self._mask, s_dot, qd)      # [L,6]
        # base column derivative: [v_b × ω_b; 0]
        vb, wb = nu[0:3], nu[3:6]
        base_bias = jnp.concatenate([jnp.cross(vb, wb), jnp.zeros(3, self.dtype)])
        Abias = Jdot_nu_q + base_bias[None, :]
        # gravity trick: fictitious upward base acceleration
        g_sp = jnp.concatenate([gravity, jnp.zeros(3, self.dtype)])
        Abias = Abias - g_sp[None, :]
        # spatial force per link: I Ā + V ×* I V
        IV = jnp.einsum("lab,lb->la", I_sp, V)
        f_cross = jnp.concatenate([
            jnp.cross(V[:, 3:6], IV[:, 0:3]),
            jnp.cross(V[:, 3:6], IV[:, 3:6]) + jnp.cross(V[:, 0:3], IV[:, 0:3]),
        ], axis=-1)
        F = jnp.einsum("lab,lb->la", I_sp, Abias) + f_cross
        return jnp.einsum("lab,la->b", J, F)

    def relative_jacobian(self, J, ls: LinkState, link: int, p_frame):
        """[6, n] joint columns of the frame's mixed Jacobian with the base
        held fixed — the base-relative Jacobian the λ couplings consume
        (Robot.cpp:244-250 via iDynTree getRelativeJacobian, MIXED)."""
        full = self.frame_jacobian(J, ls, link, p_frame)
        return full[:, 6:]


def _axis_angle(axis, angle):
    """Rotation about a unit axis (Rodrigues), trace-time constant axis."""
    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)


# ---------------------------------------------------------------------------
# snapshot producer (the Robot::setState equivalent)
# ---------------------------------------------------------------------------


def compute_snapshot(kd: KinDyn, jets: Tuple[str, ...], base_R, base_p,
                     base_vel, q, qd, jet_thrusts,
                     jet_axis_local=(0.0, 0.0, -1.0),
                     ext_wrench_frames: Tuple[str, ...] = (),
                     ext_wrenches_body=None,
                     ground_threshold: float = 5.0) -> RobotSnapshot:
    """Everything the MPC needs from one measured state.

    ``base_vel`` = [v_base_origin(world); ω(world)] (mixed). Jet thrust acts
    along the jet frame's local ``jet_axis_local`` (Robot.cpp:182-185).

    When ``ext_wrench_frames``/``ext_wrenches_body`` ([W, 6] force+torque in
    each named frame) are given, the snapshot also carries the aggregated
    external wrench, ZMP and ground-contact flag that the reference computes
    on every ``setState`` (Robot.cpp:280-322).
    """
    model = kd.model
    dt_ = kd.dtype
    nu = jnp.concatenate([base_vel, qd])
    ls = kd.fk(base_R, base_p, q)
    J = kd.link_spatial_jacobians(ls, base_p)
    I_sp, c_w, _ = kd.link_spatial_inertias(ls)
    com = kd.com(c_w)
    A_O = kd.momentum_matrix_origin(J, I_sp)
    A_G = kd.centroidal_momentum_matrix(A_O, com)
    h_G = A_G @ nu                                  # world momentum at CoM
    h_body = jnp.concatenate([base_R.T @ h_G[:3], base_R.T @ h_G[3:]])
    # locked inertia at CoM, body orientation (AngularMomentumDynamicVS
    # updateRPY algebra collapses to Rᵀ I_G R; systemDynamicsVSMPC.cpp:110-130)
    total_mass = jnp.sum(kd._mass)
    Sc = skew(c_w - com[None, :])
    I_w_links = jnp.einsum("lab,lbc,ldc->lad", ls.R, kd._inertia, ls.R)
    I_G = jnp.sum(I_w_links - kd._mass[:, None, None] * Sc @ Sc, axis=0)
    inertia_locked = base_R.T @ I_G @ base_R

    jcom = kd.com_jacobian(J, c_w)

    axes, arms, jlin, rlin, rang = [], [], [], [], []
    axis_local = jnp.asarray(jet_axis_local, dt_)
    for name in jets:
        fr = model.frames[name]
        R_f = ls.R[fr.link] @ jnp.asarray(fr.R, dt_)
        p_f = ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, dt_)
        axes.append(R_f @ axis_local)
        arms.append(p_f - com)
        Jf = kd.frame_jacobian(J, ls, fr.link, p_f)
        jlin.append(Jf[0:3, 6:])
        rel = kd.relative_jacobian(J, ls, fr.link, p_f)
        rlin.append(rel[0:3])
        rang.append(rel[3:6])
    axes = jnp.stack(axes)
    arms = jnp.stack(arms)

    # A_mom (world): force rows = axes; torque rows = arm × axis
    amom_w = jnp.concatenate([axes.T, jnp.cross(arms, axes).T], axis=0)  # [6,4]
    amom_body = jnp.concatenate(
        [base_R.T @ amom_w[0:3], base_R.T @ amom_w[3:6]], axis=0)

    ext_sum = zmp_pt = on_ground = None
    if ext_wrench_frames:
        from .wrenches import compute_wrench_summary
        ws = compute_wrench_summary(
            kd, ls, J, com, ext_wrench_frames, ext_wrenches_body, jcom,
            ground_threshold)
        ext_sum, zmp_pt, on_ground = ws.sum_world, ws.zmp, ws.on_ground

    return RobotSnapshot(
        ext_wrench_sum=ext_sum, zmp=zmp_pt, on_ground=on_ground,
        w_R_b=base_R,
        base_pos=base_p,
        base_ang_vel_world=base_vel[3:6],
        com_pos=com,
        total_mass=total_mass,
        momentum_body=h_body,
        inertia_locked=inertia_locked,
        amom_jets_body=amom_body,
        jet_axes_world=axes,
        jet_arms_world=arms,
        jac_jets_lin_joints=jnp.stack(jlin),
        jac_com_joints=jcom[:, 6:],
        rel_jac_lin=jnp.stack(rlin),
        rel_jac_ang=jnp.stack(rang),
        joint_pos=q,
        jet_thrusts=jet_thrusts,
    )
