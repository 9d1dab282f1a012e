"""Procedural iRonCub-Mk3-like robot model.

The reference loads the real iRonCub-Mk3 URDF from the ``ironcub-models``
distribution (configMujoco.toml:2); that asset is not redistributable here,
so this module builds an approximate 23-DOF humanoid with the same topology,
joint names (robot.toml axesList), jet frames and floating-base convention
("chest", robot.toml ROBOT_COMMON). All algorithms are exact for whatever
model is supplied; swap in the real URDF via :mod:`.urdf` when available.

Geometry: z-up, x forward. The chest (root) sits at the torso top; torso
joints descend to the pelvis (``root_link``); legs hang from the pelvis;
arms + jet turbines hang from the chest. Total mass ≈ 42 kg.
"""

from __future__ import annotations

import numpy as np

from ..core.config import RobotConfig
from .model import ModelBuilder, RobotModel


def build_ironcub_model(robot_cfg: RobotConfig | None = None) -> RobotModel:
    cfg = robot_cfg or RobotConfig()
    b = ModelBuilder("chest")
    b.set_root_inertial(mass=9.0, com=(-0.02, 0.0, 0.03),
                        inertia_diag=(0.08, 0.06, 0.05))
    # head (fixed)
    b.add_link("head", "chest", None, origin_p=(0.0, 0.0, 0.12),
               mass=2.5, com=(0.0, 0.0, 0.08), inertia_diag=(0.02, 0.02, 0.015))

    # --- torso chain: chest -> pelvis (joints named bottom-up as in iCub) --
    b.add_link("torso_2", "chest", "torso_yaw", axis=(0, 0, 1),
               origin_p=(0.0, 0.0, -0.10), mass=1.5, com=(0.0, 0.0, -0.03),
               inertia_diag=(0.01, 0.01, 0.008))
    b.add_link("torso_1", "torso_2", "torso_roll", axis=(1, 0, 0),
               origin_p=(0.0, 0.0, -0.08), mass=1.5, com=(0.0, 0.0, -0.03),
               inertia_diag=(0.01, 0.01, 0.008))
    b.add_link("root_link", "torso_1", "torso_pitch", axis=(0, 1, 0),
               origin_p=(0.0, 0.0, -0.08), mass=4.0, com=(0.0, 0.0, -0.04),
               inertia_diag=(0.03, 0.025, 0.02))

    # --- legs -------------------------------------------------------------
    # Right-side roll/yaw axes are mirrored (as on the real robot) so the
    # shipped symmetric initial posture (configMujoco.toml:11-33, equal
    # values for both legs) produces a symmetric stance. Each leg joint's
    # origin also pre-rotates by minus the shipped initial angle — the
    # initial posture is the neutral standing pose of this approximate
    # model, which puts the soles flat under the hips.
    leg_neutral = {"hip_pitch": 19.6, "hip_roll": 8.43, "hip_yaw": 4.64,
                   "knee": 0.0, "ankle_pitch": 1.71, "ankle_roll": -8.33}

    def neutral_rpy(axis, deg):
        a = np.asarray(axis, float)
        return tuple(-np.radians(deg) * a)

    for side, sy in (("l", 1.0), ("r", -1.0)):
        hip = f"{side}_hip"
        ax_roll = (sy, 0, 0)
        ax_yaw = (0, 0, sy)
        b.add_link(f"{hip}_1", "root_link", f"{side}_hip_pitch", axis=(0, 1, 0),
                   origin_p=(0.0, sy * 0.07, -0.08),
                   origin_rpy=neutral_rpy((0, 1, 0), leg_neutral["hip_pitch"]),
                   mass=1.5, com=(0, 0, -0.02),
                   inertia_diag=(0.005, 0.005, 0.004))
        b.add_link(f"{hip}_2", f"{hip}_1", f"{side}_hip_roll", axis=ax_roll,
                   origin_rpy=neutral_rpy(ax_roll, leg_neutral["hip_roll"]),
                   mass=0.5, com=(0, 0, -0.02),
                   inertia_diag=(0.002, 0.002, 0.002))
        b.add_link(f"{side}_upper_leg", f"{hip}_2", f"{side}_hip_yaw",
                   axis=ax_yaw,
                   origin_rpy=neutral_rpy(ax_yaw, leg_neutral["hip_yaw"]),
                   mass=2.2, com=(0, 0, -0.10),
                   inertia_diag=(0.02, 0.02, 0.004))
        b.add_link(f"{side}_lower_leg", f"{side}_upper_leg", f"{side}_knee",
                   axis=(0, 1, 0), origin_p=(0.0, 0.0, -0.20), mass=1.5,
                   com=(0, 0, -0.09), inertia_diag=(0.012, 0.012, 0.002))
        b.add_link(f"{side}_ankle_1", f"{side}_lower_leg",
                   f"{side}_ankle_pitch", axis=(0, 1, 0),
                   origin_p=(0.0, 0.0, -0.20),
                   origin_rpy=neutral_rpy((0, 1, 0), leg_neutral["ankle_pitch"]),
                   mass=0.8, com=(0, 0, -0.02),
                   inertia_diag=(0.002, 0.002, 0.002))
        b.add_link(f"{side}_foot", f"{side}_ankle_1", f"{side}_ankle_roll",
                   axis=ax_roll,
                   origin_rpy=neutral_rpy(ax_roll, leg_neutral["ankle_roll"]),
                   mass=0.6, com=(0.03, 0, -0.03),
                   inertia_diag=(0.002, 0.004, 0.004))
        b.add_frame(f"{side}_sole", f"{side}_foot", p=(0.03, 0.0, -0.05))

    # --- arms + jet turbines ---------------------------------------------
    for side, sy in (("l", 1.0), ("r", -1.0)):
        sh = f"{side}_shoulder"
        b.add_link(f"{sh}_1", "chest", f"{side}_shoulder_pitch", axis=(0, 1, 0),
                   origin_p=(0.0, sy * 0.15, 0.04), mass=0.8,
                   com=(0, sy * 0.02, 0), inertia_diag=(0.002, 0.002, 0.002))
        b.add_link(f"{sh}_2", f"{sh}_1", f"{side}_shoulder_roll",
                   axis=(sy, 0, 0), mass=0.5, com=(0, 0, -0.02),
                   inertia_diag=(0.002, 0.002, 0.002))
        b.add_link(f"{side}_upper_arm", f"{sh}_2", f"{side}_shoulder_yaw",
                   axis=(0, 0, sy), mass=1.2, com=(0, 0, -0.08),
                   inertia_diag=(0.006, 0.006, 0.002))
        # forearm carries the arm jet turbine (~1 kg of the link mass)
        b.add_link(f"{side}_forearm", f"{side}_upper_arm", f"{side}_elbow",
                   axis=(0, 1, 0), origin_p=(0.0, 0.0, -0.15), mass=2.2,
                   com=(0.0, 0.0, -0.08), inertia_diag=(0.01, 0.01, 0.003))
        # jet frame: flipped so the thrust axis (local -z, Robot.cpp:184)
        # points up along the forearm — exhaust toward the hand
        b.add_frame(f"{side}_arm_jet_turbine", f"{side}_forearm",
                    p=(0.0, 0.0, -0.12), rpy=(np.pi, 0.0, 0.0))

    # chest turbines on the back, flipped (thrust up) and canted outward 10°
    b.add_frame("chest_l_jet_turbine", "chest", p=(-0.10, 0.08, 0.02),
                rpy=(np.pi - np.radians(10.0), 0.0, 0.0))
    b.add_frame("chest_r_jet_turbine", "chest", p=(-0.10, -0.08, 0.02),
                rpy=(np.pi + np.radians(10.0), 0.0, 0.0))

    return b.build(joint_order=cfg.axes_list)
