"""URDF loader tests: parsing, reduction (joint fusion) and re-rooting."""

import textwrap

import numpy as np
import jax.numpy as jnp

from ironcub_mpc_tpu.dynamics import KinDyn
from ironcub_mpc_tpu.dynamics.urdf import load_urdf

import mjcf_oracle

URDF = textwrap.dedent("""\
<robot name="mini">
  <link name="root_link">
    <inertial><mass value="3.0"/><origin xyz="0 0 0.05"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="chest">
    <inertial><mass value="5.0"/><origin xyz="0 0 0.1"/>
      <inertia ixx="0.05" iyy="0.04" izz="0.03" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="arm">
    <inertial><mass value="1.0"/><origin xyz="0 0 -0.1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="hand">
    <inertial><mass value="0.3"/><origin xyz="0 0 -0.05"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.0005" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="torso" type="revolute">
    <parent link="root_link"/><child link="chest"/>
    <origin xyz="0 0 0.2" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
  <joint name="shoulder" type="revolute">
    <parent link="chest"/><child link="arm"/>
    <origin xyz="0 0.2 0.1" rpy="0.2 0 0"/><axis xyz="1 0 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
  <joint name="wrist" type="revolute">
    <parent link="arm"/><child link="hand"/>
    <origin xyz="0 0 -0.25" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
</robot>
""")


def _write(tmp_path):
    p = tmp_path / "mini.urdf"
    p.write_text(URDF)
    return str(p)


def test_load_rooted_at_urdf_root(tmp_path):
    model = load_urdf(_write(tmp_path), ("torso", "shoulder"), "root_link")
    assert model.link_names[0] == "root_link"
    assert model.joint_names == ("torso", "shoulder")
    # wrist fused: hand merged into arm; total mass preserved
    np.testing.assert_allclose(model.total_mass, 9.3, rtol=1e-9)
    assert "hand" in model.frames  # fused link becomes a frame


def test_rerooted_model_matches_mujoco(tmp_path):
    """Re-root at 'chest' (reversed torso joint) and validate physics vs a
    MuJoCo model built from the loaded RobotModel."""
    model = load_urdf(_write(tmp_path), ("torso", "shoulder", "wrist"), "chest")
    assert model.link_names[0] == "chest"
    np.testing.assert_allclose(model.total_mass, 9.3, rtol=1e-9)

    kd = KinDyn(model)
    rng = np.random.default_rng(3)
    q = rng.normal(0, 0.5, 3)
    qd = rng.normal(0, 0.5, 3)
    base_R = np.eye(3)
    base_p = np.array([0.1, 0.2, 0.9])
    base_v = np.array([0.1, 0.0, -0.2, 0.05, 0.3, -0.1])

    mj, data = mjcf_oracle.make_oracle(model)
    mjcf_oracle.set_state(mj, data, model, base_R, base_p, q, base_v, qd)

    ls = kd.fk(jnp.asarray(base_R, jnp.float32), jnp.asarray(base_p, jnp.float32),
               jnp.asarray(q, jnp.float32))
    import mujoco
    for i, name in enumerate(model.link_names):
        bid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
        np.testing.assert_allclose(np.asarray(ls.p[i]), data.xpos[bid], atol=1e-5)

    J = kd.link_spatial_jacobians(ls, jnp.asarray(base_p, jnp.float32))
    I_sp, c_w, _ = kd.link_spatial_inertias(ls)
    M = np.asarray(kd.mass_matrix(J, I_sp), np.float64)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, data, Mfull)
    perm = mjcf_oracle.dof_permutation(mj, model)
    np.testing.assert_allclose(M[6:, 6:], Mfull[np.ix_(perm, perm)], atol=1e-5)
    np.testing.assert_allclose(np.asarray(kd.com(c_w)), data.subtree_com[1],
                               atol=1e-5)


def test_reversed_joint_sign_convention(tmp_path):
    """Re-rooting flips traversal of 'torso': rotating it must move the
    root_link side, and match the original model's relative motion."""
    m_fwd = load_urdf(_write(tmp_path), ("torso",), "root_link")
    m_rev = load_urdf(_write(tmp_path), ("torso",), "chest")
    kd_f = KinDyn(m_fwd)
    kd_r = KinDyn(m_rev)
    q = jnp.asarray([0.4], jnp.float32)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    ls_f = kd_f.fk(eye, zero, q)
    ls_r = kd_r.fk(eye, zero, q)
    # relative rotation chest->root_link must agree between both rootings.
    # In the re-rooted model the reversed link's authored frame survives as
    # the named frame "root_link" on the "<name>_axis" model link.
    i_chest_f = m_fwd.link_names.index("chest")
    fr = m_rev.frames["root_link"]
    R_root_r = np.asarray(ls_r.R[fr.link]) @ fr.R
    R_rel_f = np.asarray(ls_f.R[0]).T @ np.asarray(ls_f.R[i_chest_f])
    R_rel_r = R_root_r.T @ np.asarray(ls_r.R[0])
    np.testing.assert_allclose(R_rel_f, R_rel_r, atol=1e-6)


def test_reversed_offaxis_joint_exact(tmp_path):
    """Re-rooting past a revolute joint whose origin translation is OFF the
    rotation axis and whose origin rotation does not commute with it: the
    relative transform (rotation AND translation) between the two links must
    agree across rootings at nonzero q. X_oldparent = X_oldchild·Rot(a,−q)·
    T_o⁻¹ — a naive (T_o⁻¹, −a) inversion gets both parts wrong."""
    mini = textwrap.dedent("""\
    <robot name="offaxis">
      <link name="a"><inertial><mass value="1.0"/><origin xyz="0 0 0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
      </inertial></link>
      <link name="b"><inertial><mass value="1.0"/><origin xyz="0 0 0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
      </inertial></link>
      <joint name="j" type="revolute">
        <parent link="a"/><child link="b"/>
        <origin xyz="0.3 0.2 0.1" rpy="0.3 0 0"/><axis xyz="0 1 0"/>
        <limit lower="-2" upper="2" effort="10" velocity="10"/>
      </joint>
    </robot>
    """)
    path = tmp_path / "offaxis.urdf"
    path.write_text(mini)
    q = jnp.asarray([0.7], jnp.float32)

    def pose(mdl, name):
        kd = KinDyn(mdl)
        ls = kd.fk(jnp.eye(3), jnp.zeros(3), q)
        if name in mdl.link_names:
            i = mdl.link_names.index(name)
            return (np.asarray(ls.R[i], np.float64),
                    np.asarray(ls.p[i], np.float64))
        fr = mdl.frames[name]
        R = np.asarray(ls.R[fr.link], np.float64)
        p = np.asarray(ls.p[fr.link], np.float64)
        return R @ fr.R, p + R @ fr.p

    def rel(mdl):
        Ra, pa = pose(mdl, "a")
        Rb, pb = pose(mdl, "b")
        return Ra.T @ Rb, Ra.T @ (pb - pa)

    m_fwd = load_urdf(str(path), ("j",), "a")
    m_rev = load_urdf(str(path), ("j",), "b")
    # the authored link frame survives re-rooting as a named frame
    assert "a" in m_rev.frames
    R_f, p_f = rel(m_fwd)
    R_r, p_r = rel(m_rev)
    np.testing.assert_allclose(R_r, R_f, atol=1e-6)
    np.testing.assert_allclose(p_r, p_f, atol=1e-6)
