"""Tests for the typed config tree and reference-format loaders."""

import dataclasses
import textwrap
from pathlib import Path

import pytest

from ironcub_mpc_tpu.core.config import (
    MPCConfig,
    RobotConfig,
    SimConfig,
    joint_selector,
    mpc_config_from_xml,
    robot_config_from_toml,
    sim_config_from_toml,
)

REF_CONFIG = Path("/root/reference/src/config")

SAMPLE_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8" ?>
    <robot name="test" build="1">
      <device name="flight_control_cpp_config" type="dummy">
        <group name="VS_MPC_CONFIG">
          <param name="enableDebugLogMode">false</param>
          <param name="useJetDynamic">true</param>
          <param name="useEstimatedThrust">true</param>
          <param name="periodMPC">0.005</param>
          <param name="periodMPCLargeSteps">0.1</param>
          <param name="periodMPCSmallSteps">0.005</param>
          <param name="nIter">17</param>
          <param name="nIterSmall">7</param>
          <param name="controlHorizon">12</param>
          <param name="controlledJoints">("l_shoulder_pitch", "l_elbow")</param>
          <param name="jointsLambdaOption">"constant"</param>
          <param name="weightCoMPos">(500.0 500.0 5000.0)</param>
          <param name="weightThrottle">80000.0</param>
          <group name="TRAJECTORY_MANAGER">
            <param name="trajectoryFile">"a.npz"</param>
          </group>
          <group name="POSITION_TRAJECTORY">
            <param name="trajectoryFile">"b.npz"</param>
          </group>
          <param name="throttleMin">0.0</param>
          <param name="throttleMax">100.0</param>
        </group>
      </device>
    </robot>
""")


def test_xml_loader(tmp_path):
    p = tmp_path / "cfg.xml"
    p.write_text(SAMPLE_XML)
    cfg = mpc_config_from_xml(p)
    assert cfg.n_iter == 17 and cfg.n_iter_small == 7 and cfg.control_horizon == 12
    assert cfg.controlled_joints == ("l_shoulder_pitch", "l_elbow")
    assert cfg.joints_lambda_option == "constant"
    assert cfg.weight_com_pos == (500.0, 500.0, 5000.0)
    assert cfg.alpha_gravity_trajectory == "a.npz"
    assert cfg.position_trajectory == "b.npz"
    assert cfg.use_jet_dynamic is True
    assert cfg.enable_debug_log_mode is False


def test_toml_loader(tmp_path):
    p = tmp_path / "robot.toml"
    p.write_text(textwrap.dedent("""\
        robotPortName = "icubSim"
        axesList = ["j1", "j2", "j3"]
        jetsList = ["a", "b", "c", "d"]
        controlBoardsNames = ["torso"]
        gravity = [0.0, 0.0, -9.81]
        CoMOffset = [0.0, 0.0, 0.01]
        thresholdNormalForceRobotOnTheGround = 5.0
        readZMPFromEstimator = true
        [ROBOT_COMMON]
        baseFrame = "chest"
    """))
    cfg = robot_config_from_toml(p)
    assert cfg.axes_list == ("j1", "j2", "j3")
    assert cfg.base_frame == "chest"
    assert cfg.com_offset == (0.0, 0.0, 0.01)
    assert cfg.n_joints == 3 and cfg.n_jets == 4


# ---------------------------------------------------------------------------
# The "reference configs load unmodified" claim, proven against the actual
# files: the shipped defaults were transcribed from these configs, so loading
# them must reproduce the default dataclasses exactly (the only fields allowed
# to differ are the artifact path strings, which point at the reference's
# .mat/.urdf assets rather than our converted .npz).
# ---------------------------------------------------------------------------

needs_reference = pytest.mark.skipif(
    not REF_CONFIG.exists(), reason="reference checkout not present")


@needs_reference
def test_reference_vs_mpc_config_xml_equals_defaults():
    # vs_mcp_config.xml:5-45
    cfg = mpc_config_from_xml(REF_CONFIG / "vs_mcp_config.xml")
    expected = dataclasses.replace(
        MPCConfig(),
        alpha_gravity_trajectory="src/trajectories/alphaGravity.mat",
        position_trajectory="src/trajectories/minimumJerkTrajectory.mat",
    )
    assert cfg == expected
    # derived sizes from the real file match the reference QP
    # (variableSamplingMPC.cpp:44-45: nVar = 26*18 + 8*12 + 4*6 = 588)
    assert cfg.n_var == 588 and cfg.n_states == 26


@needs_reference
def test_reference_robot_toml_equals_defaults():
    # robot.toml:1-45
    assert robot_config_from_toml(REF_CONFIG / "robot.toml") == RobotConfig()


@needs_reference
def test_reference_config_mujoco_toml_equals_defaults():
    # configMujoco.toml:1-32 (incl. the reference's "intial_position" typo)
    cfg = sim_config_from_toml(REF_CONFIG / "configMujoco.toml")
    expected = dataclasses.replace(
        SimConfig(),
        robot_model="package://iRonCub-Mk3/iRonCub/robots/iRonCub-Mk3/model.urdf",
        mujoco_model_path=(
            "package://iRonCub-Mk3/iRonCub/robots/iRonCub-Mk3_Mujoco/iRonCub.xml"),
    )
    assert cfg == expected


def test_config_is_hashable_static_arg():
    # frozen dataclass configs must be usable as jit static args
    assert hash(MPCConfig()) == hash(MPCConfig())
    assert MPCConfig() == MPCConfig()


def test_joint_selector_default():
    sel = joint_selector(RobotConfig(), MPCConfig())
    # the 8 controlled arm joints inside the 23-joint axes list
    assert sel == (3, 4, 5, 6, 7, 8, 9, 10)
