"""Kinodynamics validation.

Two oracle families:
1. finite differences of our own FK (internal consistency of Jacobians);
2. MuJoCo (an independent rigid-body implementation) built from the same
   model spec: total mass, CoM, joint-space mass-matrix block, site
   Jacobians, centroidal angular momentum, joint bias forces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import RobotConfig
from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model, compute_snapshot
from ironcub_mpc_tpu.ops.so3 import rpy_to_matrix

import mjcf_oracle

F64 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
MODEL = build_ironcub_model()
KD = KinDyn(MODEL, dtype=jnp.float32)
JETS = RobotConfig().jets_list

RNG = np.random.default_rng(7)
Q0 = RNG.normal(0, 0.3, MODEL.n_joints)
QD0 = RNG.normal(0, 0.4, MODEL.n_joints)
BASE_R = np.asarray(rpy_to_matrix(jnp.asarray([0.1, -0.2, 0.3])))
BASE_P = np.array([0.3, -0.1, 0.8])
BASE_V = np.array([0.2, -0.1, 0.4, 0.3, -0.2, 0.1])


@pytest.fixture(scope="module")
def mj_state():
    mj, data = mjcf_oracle.make_oracle(MODEL)
    mjcf_oracle.set_state(mj, data, MODEL, BASE_R, BASE_P, Q0, BASE_V, QD0)
    return mj, data


@pytest.fixture(scope="module")
def ours():
    ls = KD.fk(jnp.asarray(BASE_R, jnp.float32), jnp.asarray(BASE_P, jnp.float32),
               jnp.asarray(Q0, jnp.float32))
    J = KD.link_spatial_jacobians(ls, jnp.asarray(BASE_P, jnp.float32))
    I_sp, c_w, I_w = KD.link_spatial_inertias(ls)
    return ls, J, I_sp, c_w


def test_total_mass(mj_state):
    mj, _ = mj_state
    import mujoco
    assert abs(MODEL.total_mass - mujoco.mj_getTotalmass(mj)) < 1e-6
    assert abs(MODEL.total_mass - 70.0) < 1e-6  # published Mk3 figure


def test_fk_matches_mujoco(mj_state, ours):
    mj, data = mj_state
    ls, *_ = ours
    import mujoco
    for i, name in enumerate(MODEL.link_names):
        bid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
        np.testing.assert_allclose(np.asarray(ls.p[i]), data.xpos[bid], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ls.R[i]),
                                   data.xmat[bid].reshape(3, 3), atol=1e-5)


def test_com_matches_mujoco(mj_state, ours):
    mj, data = mj_state
    ls, J, I_sp, c_w = ours
    com = KD.com(c_w)
    # subtree_com of the root body = whole-robot CoM
    np.testing.assert_allclose(np.asarray(com), data.subtree_com[1], atol=1e-5)


def test_mass_matrix_joint_block_matches_mujoco(mj_state, ours):
    mj, data = mj_state
    ls, J, I_sp, _ = ours
    import mujoco
    M = np.asarray(KD.mass_matrix(J, I_sp), np.float64)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, data, Mfull)
    perm = mjcf_oracle.dof_permutation(mj, MODEL)
    M_mj = Mfull[np.ix_(perm, perm)]
    np.testing.assert_allclose(M[6:, 6:], M_mj, atol=2e-4, rtol=1e-4)
    # full matrix symmetric PSD
    np.testing.assert_allclose(M, M.T, atol=1e-4)
    assert np.linalg.eigvalsh(M).min() > -1e-6
    # mixed-representation base-linear block = m I (sanity)
    np.testing.assert_allclose(M[:3, :3], MODEL.total_mass * np.eye(3),
                               atol=1e-4, rtol=1e-5)


def test_site_jacobians_match_mujoco(mj_state, ours):
    mj, data = mj_state
    ls, J, _, _ = ours
    import mujoco
    perm = mjcf_oracle.dof_permutation(mj, MODEL)
    for name in ("l_arm_jet_turbine", "chest_r_jet_turbine", "l_sole"):
        fr = MODEL.frames[name]
        p_f = np.asarray(ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, jnp.float32))
        Jf = np.asarray(KD.frame_jacobian(J, ls, fr.link, jnp.asarray(p_f, jnp.float32)))
        sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE, name)
        jacp = np.zeros((3, mj.nv))
        jacr = np.zeros((3, mj.nv))
        mujoco.mj_jacSite(mj, data, jacp, jacr, sid)
        # joint columns are convention-independent
        np.testing.assert_allclose(Jf[0:3, 6:], jacp[:, perm], atol=1e-5)
        np.testing.assert_allclose(Jf[3:6, 6:], jacr[:, perm], atol=1e-5)
        # site position check
        np.testing.assert_allclose(p_f, data.site_xpos[sid], atol=1e-5)


def test_centroidal_momentum_matches_mujoco(mj_state, ours):
    mj, data = mj_state
    ls, J, I_sp, c_w = ours
    import mujoco
    nu = jnp.asarray(np.concatenate([BASE_V, QD0]), jnp.float32)
    A_O = KD.momentum_matrix_origin(J, I_sp)
    com = KD.com(c_w)
    A_G = KD.centroidal_momentum_matrix(A_O, com)
    h = np.asarray(A_G @ nu, np.float64)
    mujoco.mj_subtreeVel(mj, data)
    # mujoco subtree_linvel/angmom of root body subtree (= whole robot)
    h_lin_mj = mujoco.mj_getTotalmass(mj) * data.subtree_linvel[1]
    h_ang_mj = data.subtree_angmom[1]
    np.testing.assert_allclose(h[:3], h_lin_mj, atol=2e-4)
    np.testing.assert_allclose(h[3:], h_ang_mj, atol=2e-4)


def test_bias_forces_match_mujoco_joint_rows(mj_state, ours):
    mj, data = mj_state
    ls, J, I_sp, _ = ours
    nu = jnp.asarray(np.concatenate([BASE_V, QD0]), jnp.float32)
    bias = np.asarray(KD.bias_forces(
        J, I_sp, ls, jnp.asarray(BASE_P, jnp.float32), nu,
        jnp.asarray([0, 0, -9.81], jnp.float32)), np.float64)
    perm = mjcf_oracle.dof_permutation(mj, MODEL)
    # qfrc_bias = C(q,qvel)qvel + g in mujoco's dof order. Base angular dofs
    # use a different convention (body frame), but joint rows must agree.
    np.testing.assert_allclose(bias[6:], data.qfrc_bias[perm], atol=2e-3,
                               rtol=1e-3)


def test_jacobian_finite_difference():
    """Frame Jacobian (incl. base columns) vs. FD of FK in f64 precision."""
    kd = KinDyn(MODEL, dtype=jnp.float64 if F64 == jnp.float64 else jnp.float32)
    name = "r_arm_jet_turbine"
    fr = MODEL.frames[name]

    def frame_pos(q):
        ls = kd.fk(jnp.asarray(BASE_R, kd.dtype), jnp.asarray(BASE_P, kd.dtype),
                   q)
        return ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, kd.dtype)

    q = jnp.asarray(Q0, kd.dtype)
    Jfd = jax.jacfwd(frame_pos)(q)
    ls = kd.fk(jnp.asarray(BASE_R, kd.dtype), jnp.asarray(BASE_P, kd.dtype), q)
    J = kd.link_spatial_jacobians(ls, jnp.asarray(BASE_P, kd.dtype))
    p_f = frame_pos(q)
    Jf = kd.frame_jacobian(J, ls, fr.link, p_f)
    np.testing.assert_allclose(np.asarray(Jf[0:3, 6:]), np.asarray(Jfd),
                               atol=1e-5)


def test_snapshot_contents():
    snap = compute_snapshot(
        KD, JETS, jnp.asarray(BASE_R, jnp.float32),
        jnp.asarray(BASE_P, jnp.float32), jnp.asarray(BASE_V, jnp.float32),
        jnp.asarray(Q0, jnp.float32), jnp.asarray(QD0, jnp.float32),
        jnp.full(4, 100.0))
    assert snap.jac_jets_lin_joints.shape == (4, 3, 23)
    assert snap.rel_jac_ang.shape == (4, 3, 23)
    np.testing.assert_allclose(float(snap.total_mass), MODEL.total_mass,
                               rtol=1e-6)
    # locked inertia symmetric positive definite
    I = np.asarray(snap.inertia_locked, np.float64)
    np.testing.assert_allclose(I, I.T, atol=1e-5)
    assert np.linalg.eigvalsh(I).min() > 0
    # A_mom linear block columns are unit vectors (jet axes)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(snap.amom_jets_body[:3]), axis=0), 1.0,
        atol=1e-5)


def test_snapshot_upright_jets_push_up():
    """At the zero posture the thrust axes should point (mostly) up."""
    snap = compute_snapshot(
        KD, JETS, jnp.eye(3), jnp.zeros(3), jnp.zeros(6),
        jnp.zeros(MODEL.n_joints), jnp.zeros(MODEL.n_joints), jnp.full(4, 10.0))
    axes = np.asarray(snap.jet_axes_world)
    assert np.all(axes[:, 2] > 0.9), axes


def test_locked_inertia_matches_reference_adjoint_formula(ours):
    """snap.inertia_locked (computed as Rᵀ I_G R) must equal the reference's
    literal derivation (systemDynamicsVSMPC.cpp:110-130): the [3:6,3:6]
    block of Adj(G_H_B)ᵀ · M_base · Adj(G_H_B) with G_H_B = (R_base,
    com − base_pos) and M_base the 6x6 base block of the mixed-representation
    free-floating mass matrix. (The two are analytically identical; this
    pins both code paths to the contract numerically.)"""
    ls, J, I_sp, c_w = ours
    M = np.asarray(KD.mass_matrix(J, I_sp), np.float64)
    snap = compute_snapshot(
        KD, JETS, jnp.asarray(BASE_R, jnp.float32),
        jnp.asarray(BASE_P, jnp.float32), jnp.asarray(BASE_V, jnp.float32),
        jnp.asarray(Q0, jnp.float32), jnp.asarray(QD0, jnp.float32),
        jnp.zeros(4, jnp.float32))

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                         [-v[1], v[0], 0.0]])

    r = np.asarray(snap.com_pos, np.float64) - BASE_P
    R = np.asarray(BASE_R, np.float64)
    adj = np.zeros((6, 6))
    adj[0:3, 0:3] = R
    adj[0:3, 3:6] = skew(r) @ R
    adj[3:6, 3:6] = R
    I_ref = (adj.T @ M[:6, :6] @ adj)[3:6, 3:6]
    I_ours = np.asarray(snap.inertia_locked, np.float64)
    scale = np.abs(I_ref).max()
    assert np.abs(I_ours - I_ref).max() / scale < 5e-5, (I_ours, I_ref)


def test_inv3_matches_linalg_inv():
    """Closed-form 3x3 inverse (ops/so3.inv3) vs jnp.linalg.inv on batched
    well-conditioned physical matrices (inertia-tensor-like SPD + a
    random-rotation family)."""
    import jax
    import jax.numpy as jnp

    from ironcub_mpc_tpu.ops.so3 import inv3

    rng = np.random.default_rng(7)
    A = rng.normal(size=(64, 3, 3))
    spd = A @ np.swapaxes(A, -1, -2) + 3.0 * np.eye(3)
    want = np.linalg.inv(spd)
    # f32 grade (the library regime; x64 stays off in tests) on
    # locked-inertia magnitudes (kg m^2 ~ O(1-10))
    got32 = np.asarray(inv3(jnp.asarray(spd, jnp.float32)))
    np.testing.assert_allclose(got32, want, rtol=2e-4, atol=2e-5)
    # and vs the f32 jnp.linalg.inv it replaces — same accuracy class
    lu32 = np.asarray(jnp.linalg.inv(jnp.asarray(spd, jnp.float32)))
    np.testing.assert_allclose(got32, lu32, rtol=2e-4, atol=2e-5)
