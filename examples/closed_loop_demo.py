#!/usr/bin/env python
"""Closed-loop demo: iRonCub standing on the ground under multi-rate MPC.

Usage: python examples/closed_loop_demo.py [n_ticks] [--nn-jets]

End-to-end equivalent of the reference driver (variable_sampling_mpc.py):
JAX plant at 1 kHz (PD joints + jet forces + ground contacts), LSTM+EKF
thrust estimation, 200 Hz multi-rate MPC, telemetry printout. Uses the
converted reference trajectories (alphaGravity ramp + minimum-jerk flight).
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, SimConfig
from ironcub_mpc_tpu.dynamics import KinDyn, load_ironcub_model
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.runtime.loop import ClosedLoop
from ironcub_mpc_tpu.runtime.trajectory import load_npz
from ironcub_mpc_tpu.sim.jet_lstm import LSTMJetModel
from ironcub_mpc_tpu.sim.plant import Plant


from ironcub_mpc_tpu.runtime.flight import standing_state


def main():
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    use_nn = "--nn-jets" in sys.argv

    model = load_ironcub_model()
    kd = KinDyn(model)
    sim_cfg = SimConfig(use_nn_jet_dynamics=use_nn)
    lstm = LSTMJetModel(str(ROOT / "data/jet_lstm_weights.npz")) if use_nn else None
    plant = Plant(kd, RobotConfig(), sim_cfg, lstm=lstm)
    loop = ClosedLoop(plant, MPCConfig(),
                      admm.ADMMSettings(max_iter=120))

    pos_traj = load_npz(str(ROOT / "data/trajectories/minimum_jerk.npz"))
    alpha_traj = load_npz(str(ROOT / "data/trajectories/alpha_gravity.npz"),
                          des_fps=1.0 / loop.cfg.period_mpc)

    s = standing_state(plant, sim_cfg.initial_position_deg)
    print("settling 1.0 s ...")
    t0 = time.time()
    s = jax.jit(lambda s: loop.settle(s, 1.0))(s)
    s.base_p.block_until_ready()
    print(f"  settled in {time.time()-t0:.1f}s wall; base z = "
          f"{float(s.base_p[2]):.4f}, |qd| = {float(jnp.max(jnp.abs(s.qd))):.4f}")

    problem, carry = loop.configure(
        s, {k: np.asarray(v) for k, v in pos_traj.channels.items()},
        np.asarray(alpha_traj.channels["alphaGravity"])[:, 0])

    rollout = loop.rollout_jit()
    t0 = time.time()
    carry, tel = rollout(problem, carry, n_ticks)
    jax.block_until_ready(tel)
    wall = time.time() - t0
    print(f"{n_ticks} ticks in {wall:.1f}s wall "
          f"({1e3*wall/n_ticks:.2f} ms/tick incl. compile)")

    st = np.asarray(tel.solver_status)
    print("solver: solved", int((st == 1).sum()), "/", n_ticks,
          "inaccurate", int((st == 2).sum()), "other", int((st > 2).sum()))
    for k in (0, n_ticks // 2, n_ticks - 1):
        print(f"t={k*0.005:6.3f}s com={np.round(np.asarray(tel.com_position[k]),3)} "
              f"ref={np.round(np.asarray(tel.com_position_desired[k]),3)} "
              f"thr={np.round(np.asarray(tel.throttle[k]),1)} "
              f"T={np.round(np.asarray(tel.estimated_thrust[k]),1)}")
    com_err = np.linalg.norm(
        np.asarray(tel.com_position) - np.asarray(tel.com_position_desired), axis=1)
    print(f"CoM tracking error: mean {com_err.mean()*1000:.1f} mm, "
          f"max {com_err.max()*1000:.1f} mm")


if __name__ == "__main__":
    main()
