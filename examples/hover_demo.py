#!/usr/bin/env python
"""Hover-regulation demo: drive the multi-rate MPC open-loop for 2 seconds.

Usage:  python examples/hover_demo.py [n_ticks]

Configures the MPC on a synthetic hover state of an iRonCub-like robot
(40 kg, 4 jets) and runs the 200 Hz tick repeatedly, printing the multi-rate
command stream: joint references update every 5 ms, throttle only at 10 Hz.
This is BASELINE config 1 ("hover regulation") without the physics plant —
the measured state is held at hover; the controller should keep thrust at
m·g/4 ≈ 98.1 N per jet and leave the posture alone.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

if "cpu" not in str(jax.devices()).lower():
    pass  # run on whatever accelerator is configured

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.core.types import RobotSnapshot
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as vs_mpc


def hover_snapshot(mass=40.0, dtype=jnp.float32) -> RobotSnapshot:
    """Synthetic upright hover state (stand-in for the dynamics layer)."""
    thrust = mass * 9.81 / 4.0
    axes = np.tile([0.0, 0.0, 1.0], (4, 1))
    arms = np.array([[0.25, 0.35, -0.05], [0.25, -0.35, -0.05],
                     [-0.08, 0.12, 0.10], [-0.08, -0.12, 0.10]])
    amom = np.zeros((6, 4))
    amom[:3] = axes.T
    for i in range(4):
        amom[3:, i] = np.cross(arms[i], axes[i])
    rng = np.random.default_rng(0)
    f = lambda a: jnp.asarray(a, dtype)
    J = 23
    return RobotSnapshot(
        w_R_b=f(np.eye(3)), base_pos=f([0, 0, 0.5]),
        base_ang_vel_world=f(np.zeros(3)), com_pos=f([0, 0, 0.6]),
        total_mass=f(mass), momentum_body=f(np.zeros(6)),
        inertia_locked=f(np.diag([2.1, 1.9, 0.8])),
        amom_jets_body=f(amom), jet_axes_world=f(axes), jet_arms_world=f(arms),
        jac_jets_lin_joints=f(rng.normal(0, 0.02, (4, 3, J))),
        jac_com_joints=f(rng.normal(0, 0.01, (3, J))),
        rel_jac_lin=f(rng.normal(0, 0.02, (4, 3, J))),
        rel_jac_ang=f(rng.normal(0, 0.02, (4, 3, J))),
        joint_pos=f(np.zeros(J)), jet_thrusts=f(np.full(4, thrust)),
    )


def main():
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    settings = admm.ADMMSettings(max_iter=150)
    snap = hover_snapshot()

    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    alpha = np.ones(600)  # full gravity compensation

    print(f"QP: {cfg.n_var} vars, {cfg.n_constraints} constraints, "
          f"horizon {cfg.n_iter} knots / {sched.total_span:.2f} s")
    problem, carry = vs_mpc.configure(cfg, sched, sel, snap, channels, alpha,
                                      settings)
    est_td = jnp.zeros(4)
    print(f"{'tick':>5} {'status':>6} {'thrust_des[0] N':>15} "
          f"{'throttle[0] %':>13} {'max|dq| rad':>12}")
    prev_joints = np.asarray(carry.joints_pos_ref)
    for k in range(n_ticks):
        carry, out = vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                     carry, snap, est_td)
        joints = np.asarray(out.joints_pos_ref)
        if k < 3 or (k + 1) % 5 == 0 or k in (18, 19, 20):
            print(f"{k:>5} {int(out.status):>6} "
                  f"{float(out.thrust_des[0]):>15.2f} "
                  f"{float(out.throttle[0]):>13.2f} "
                  f"{np.max(np.abs(joints - prev_joints)):>12.5f}")
        prev_joints = joints
    print("done:", n_ticks, "ticks")


if __name__ == "__main__":
    main()
