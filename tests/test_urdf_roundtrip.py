"""Full-humanoid URDF round-trip: the Robot.cpp:77-103 contract on the
real 23-DOF topology.

The real iRonCub URDF is authored rooted at ``root_link`` while the MPC
floats the base at ``chest`` (robot.toml ROBOT_COMMON) — loading it means
re-rooting across the torso chain, i.e. traversing revolute joints with
off-axis origin translations AGAINST their authored direction. These tests
export the procedural 23-DOF model as such a URDF (plus extra non-controlled
revolute joints and sensor-frame chains that must be fused), reload it with
``load_urdf(…, axes_list, "chest")`` and require kinodynamic snapshot
equality with the direct model at random nonzero configurations.

Swap-in for the real asset:
    model = load_urdf("ironcub_mk3.urdf", RobotConfig().axes_list, "chest")
"""

import textwrap
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import RobotConfig
from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model, compute_snapshot
from ironcub_mpc_tpu.dynamics.urdf import load_urdf
from ironcub_mpc_tpu.dynamics.urdf_export import model_to_urdf

RC = RobotConfig()

EXTRA_CLUTTER = textwrap.dedent("""\
  <link name="neck_1"><inertial><mass value="0.4"/><origin xyz="0 0 0.02"/>
    <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="neck_pitch" type="revolute">
    <parent link="head"/><child link="neck_1"/>
    <origin xyz="0 0 0.05" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
  <link name="l_wrist"><inertial><mass value="0.2"/><origin xyz="0 0 -0.02"/>
    <inertia ixx="0.0005" iyy="0.0005" izz="0.0003" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="l_wrist_pitch" type="revolute">
    <parent link="l_forearm"/><child link="l_wrist"/>
    <origin xyz="0 0 -0.16" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="10" velocity="10"/>
  </joint>
  <link name="imu_frame"/>
  <joint name="fix_imu" type="fixed">
    <parent link="chest"/><child link="imu_frame"/>
    <origin xyz="0.02 0 0.05" rpy="0 0.1 0"/>
  </joint>
  <link name="l_foot_ft_sensor"/>
  <joint name="fix_l_ft" type="fixed">
    <parent link="l_foot"/><child link="l_foot_ft_sensor"/>
    <origin xyz="0 0 -0.02" rpy="3.14159 0 0"/>
  </joint>
""")


def _export(tmp_path, urdf_root, clutter=True):
    model = build_ironcub_model(RC)
    xml = model_to_urdf(model, urdf_root)
    if clutter:
        xml = xml.replace("</robot>", EXTRA_CLUTTER + "</robot>")
    path = tmp_path / f"ironcub_{urdf_root}.urdf"
    path.write_text(xml)
    return model, str(path)


def _snapshot(model, seed):
    """Kinodynamic snapshot at a random nonzero state (torso angles ON —
    the re-rooted chain must be exercised away from zero)."""
    kd = KinDyn(model)
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-0.4, 0.4, 3)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", rpy).as_matrix()
    q = rng.uniform(-0.5, 0.5, 23)
    qd = rng.standard_normal(23) * 0.3
    base_p = rng.standard_normal(3)
    base_v = rng.standard_normal(6) * 0.4
    thr = 60.0 + 40.0 * rng.random(4)
    return compute_snapshot(
        kd, RC.jets_list, jnp.asarray(R, jnp.float32),
        jnp.asarray(base_p, jnp.float32), jnp.asarray(base_v, jnp.float32),
        jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32),
        jnp.asarray(thr, jnp.float32))


def _assert_snapshots_equal(a, b, tol=2e-5):
    for field in ("com_pos", "total_mass", "momentum_body", "inertia_locked",
                  "amom_jets_body", "jet_axes_world", "jet_arms_world",
                  "jac_jets_lin_joints", "jac_com_joints", "rel_jac_lin",
                  "rel_jac_ang"):
        va = np.asarray(getattr(a, field), np.float64)
        vb = np.asarray(getattr(b, field), np.float64)
        scale = max(np.abs(va).max(), 1.0)
        err = np.abs(va - vb).max() / scale
        assert err < tol, f"{field}: normalized max err {err:.2e}"


@pytest.mark.parametrize("urdf_root", ["root_link", "l_foot"])
def test_reroot_full_humanoid(tmp_path, urdf_root):
    """Export rooted away from the floating base, reload re-rooted at chest,
    and require snapshot equality with the chest-rooted load of the SAME
    cluttered URDF (the trivial-path reference — itself validated against
    the direct model and the MuJoCo oracle elsewhere). ``l_foot`` drives
    the re-root through the whole mirrored leg chain (non-identity origin
    rotations + off-axis translations on every backward joint)."""
    direct, ref_path = _export(tmp_path, "chest")
    reference = load_urdf(ref_path, RC.axes_list, "chest")
    _, path = _export(tmp_path, urdf_root)
    loaded = load_urdf(path, RC.axes_list, "chest")
    assert loaded.joint_names == RC.axes_list
    assert loaded.link_names[0] == "chest"
    # extra clutter must be fused into kept links, not kept as DOFs
    assert abs(loaded.total_mass - (direct.total_mass + 0.6)) < 1e-9
    for seed in (0, 7):
        _assert_snapshots_equal(_snapshot(reference, seed),
                                _snapshot(loaded, seed))


def test_reroot_chest_rooted_identity(tmp_path):
    """chest-rooted export loads without any backward traversal — sanity
    anchor for the re-rooted variants."""
    direct, path = _export(tmp_path, "chest", clutter=False)
    loaded = load_urdf(path, RC.axes_list, "chest")
    assert abs(loaded.total_mass - direct.total_mass) < 1e-9
    _assert_snapshots_equal(_snapshot(direct, 3), _snapshot(loaded, 3))


def test_clutter_mass_folds_into_parent(tmp_path):
    """Non-controlled revolute joints are locked at zero and their subtree
    inertia merges into the parent (loadReducedModelFromFile semantics)."""
    direct, path = _export(tmp_path, "root_link")
    loaded = load_urdf(path, RC.axes_list, "chest")
    # the wrist + neck masses shift the CoM: compare against a direct model
    # with the same point masses attached via the exporter's frames
    s_loaded = _snapshot(loaded, 5)
    s_direct = _snapshot(direct, 5)
    dm = 0.6  # neck 0.4 + wrist 0.2
    assert abs(float(s_loaded.total_mass)
               - float(s_direct.total_mass) - dm) < 1e-4  # f32 mass sums
    # jet frames survive the round trip exactly
    np.testing.assert_allclose(np.asarray(s_loaded.jet_axes_world),
                               np.asarray(s_direct.jet_axes_world),
                               atol=2e-6)
