"""Shared test fixtures: synthetic robot snapshots and trajectories."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ironcub_mpc_tpu.core.types import RobotSnapshot

N_JOINTS = 23
MASS = 40.0
COM_HEIGHT = 0.6
HOVER_THRUST = MASS * 9.81 / 4.0


def make_hover_snapshot(mass=MASS, thrust=HOVER_THRUST, rpy_deg=(0.0, 0.0, 0.0),
                        omega=(0.0, 0.0, 0.0), dtype=jnp.float32,
                        rng_seed=None) -> RobotSnapshot:
    """A plausible iRonCub-like hover state: upright base, 4 jets with
    world-frame axes pushing up, symmetric arms, small locked inertia."""
    from ironcub_mpc_tpu.ops.so3 import rpy_to_matrix

    rng = np.random.default_rng(0 if rng_seed is None else rng_seed)
    rpy = np.radians(np.asarray(rpy_deg, np.float64))
    R = np.asarray(rpy_to_matrix(jnp.asarray(rpy)), np.float64)
    axes = np.tile(np.array([0.0, 0.0, 1.0]), (4, 1))
    arms = np.array([
        [0.25, 0.35, -0.05], [0.25, -0.35, -0.05],
        [-0.08, 0.12, 0.1], [-0.08, -0.12, 0.1]])
    inertia = np.diag([2.1, 1.9, 0.8])
    scale = 0.02 if rng_seed is None else 0.05
    jac_jets = rng.normal(0, scale, (4, 3, N_JOINTS))
    jac_com = rng.normal(0, scale * 0.5, (3, N_JOINTS))
    rel_lin = rng.normal(0, scale, (4, 3, N_JOINTS))
    rel_ang = rng.normal(0, scale, (4, 3, N_JOINTS))
    amom = np.zeros((6, 4))
    amom[:3] = axes.T
    for i in range(4):
        amom[3:, i] = np.cross(arms[i], axes[i])
    f = lambda a: jnp.asarray(a, dtype)
    return RobotSnapshot(
        w_R_b=f(R),
        base_pos=f([0.0, 0.0, COM_HEIGHT - 0.1]),
        base_ang_vel_world=f(omega),
        com_pos=f([0.0, 0.0, COM_HEIGHT]),
        total_mass=f(mass),
        momentum_body=f(np.zeros(6)),
        inertia_locked=f(inertia),
        amom_jets_body=f(amom),
        jet_axes_world=f(axes),
        jet_arms_world=f(arms),
        jac_jets_lin_joints=f(jac_jets),
        jac_com_joints=f(jac_com),
        rel_jac_lin=f(rel_lin),
        rel_jac_ang=f(rel_ang),
        joint_pos=f(np.zeros(N_JOINTS)),
        jet_thrusts=f(np.full(4, thrust)),
    )


def make_test_trajectories(n=30, fps=10.0):
    """Tiny trajectory channels: stationary hover reference."""
    channels = {
        "positionCoM": np.zeros((n, 3)),
        "velocityCoM": np.zeros((n, 3)),
        "RPY": np.zeros((n, 3)),
        "RPYDot": np.zeros((n, 3)),
    }
    alpha = np.ones(20 * n)  # full gravity compensation, MPC fps
    return channels, alpha
