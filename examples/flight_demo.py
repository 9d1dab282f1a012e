#!/usr/bin/env python
"""Full flight demo: takeoff + trajectory tracking on the reference schedule.

Usage: python examples/flight_demo.py [seconds] [--direct-thrust] [--save-mat]

Runs the complete closed loop (JAX plant + LSTM/EKF jets + multi-rate MPC)
against the *converted reference data*: the 35 s alphaGravity ramp and the
148 s minimum-jerk flight trajectory — BASELINE config 3. The whole rollout
is one compiled `lax.scan`, so this runs at full speed on the TPU chip.
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seconds = float(args[0]) if args else 30.0
    use_nn = "--direct-thrust" not in sys.argv
    save_mat = "--save-mat" in sys.argv

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache_tpu"
                      if jax.default_backend() == "tpu" else ROOT / ".jax_cache"))

    from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, SimConfig
    from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model
    from ironcub_mpc_tpu.ops import admm
    from ironcub_mpc_tpu.runtime import telemetry
    from ironcub_mpc_tpu.runtime.loop import ClosedLoop
    from ironcub_mpc_tpu.runtime.trajectory import load_npz
    from ironcub_mpc_tpu.sim.jet_lstm import LSTMJetModel
    from ironcub_mpc_tpu.sim.plant import Plant, PlantParams
    from closed_loop_demo import standing_state

    model = build_ironcub_model()
    kd = KinDyn(model)
    sim_cfg = SimConfig(use_nn_jet_dynamics=use_nn)
    lstm = LSTMJetModel(str(ROOT / "data/jet_lstm_weights.npz")) if use_nn else None
    import dataclasses
    # flight-tuned parameters: extra arm damping and stronger posture
    # regularisation keep the arms away from the approximate model's
    # follower-force flutter region at flight thrust
    plant = Plant(kd, RobotConfig(), sim_cfg, params=PlantParams(kd=60.0),
                  lstm=lstm)
    cfg = dataclasses.replace(MPCConfig(), weight_regularization_joint_pos=200.0)
    loop = ClosedLoop(plant, cfg,
                      admm.ADMMSettings(max_iter=120, rho_update_iters=(20, 50)))

    pos_traj = load_npz(str(ROOT / "data/trajectories/minimum_jerk.npz"))
    alpha_traj = load_npz(str(ROOT / "data/trajectories/alpha_gravity.npz"),
                          des_fps=1.0 / loop.cfg.period_mpc)

    s = standing_state(plant, sim_cfg.initial_position_deg)
    print(f"jets: {'LSTM+EKF' if use_nn else 'direct thrust'}; settling 2 s ...")
    s = jax.jit(lambda s: loop.settle(s, 2.0))(s)
    jax.block_until_ready(s.base_p)

    problem, carry = loop.configure(
        s, {k: np.asarray(v) for k, v in pos_traj.channels.items()},
        np.asarray(alpha_traj.channels["alphaGravity"])[:, 0])

    n_ticks = int(round(seconds / loop.cfg.period_mpc))
    rollout = loop.rollout_jit()
    print(f"flying {seconds:.0f} s = {n_ticks} ticks ...")
    t0 = time.time()
    carry, tel = rollout(problem, carry, n_ticks)
    jax.block_until_ready(tel)
    wall = time.time() - t0
    print(f"rollout: {wall:.1f}s wall ({1e3*wall/n_ticks:.2f} ms/tick, "
          f"{'%.1fx realtime' % (seconds/wall)})")

    st = np.asarray(tel.solver_status)
    print(f"solver: solved {int((st==1).sum())}/{n_ticks}, "
          f"inaccurate {int((st==2).sum())}, other {int((st>2).sum())}")
    com = np.asarray(tel.com_position)
    ref = np.asarray(tel.com_position_desired)
    err = np.linalg.norm(com - ref, axis=1)
    thr = np.asarray(tel.throttle)
    T = np.asarray(tel.estimated_thrust)
    alpha = np.asarray(tel.alpha_gravity)
    print(f"{'t[s]':>6} {'alpha':>6} {'com z':>7} {'ref z':>7} {'err[mm]':>8} "
          f"{'thr%':>6} {'T[N]':>7}")
    for sec in range(0, int(seconds) + 1, max(1, int(seconds) // 12)):
        k = min(int(sec / loop.cfg.period_mpc), n_ticks - 1)
        print(f"{sec:>6} {alpha[k]:>6.2f} {com[k,2]:>7.3f} {ref[k,2]:>7.3f} "
              f"{1e3*err[k]:>8.1f} {thr[k,0]:>6.1f} {T[k,0]:>7.1f}")
    half = n_ticks // 2
    print(f"tracking err: mean {1e3*err.mean():.1f} mm | "
          f"second half mean {1e3*err[half:].mean():.1f} mm | "
          f"max {1e3*err.max():.1f} mm")
    airborne = T.sum(axis=1) > 0.9 * model.total_mass * 9.81
    if airborne.any():
        print(f"airborne (thrust > 0.9 m g) from t="
              f"{airborne.argmax()*loop.cfg.period_mpc:.1f}s")
    if save_mat:
        path = telemetry.save_mat(tel, period=loop.cfg.period_mpc)
        print("telemetry saved ->", path)


if __name__ == "__main__":
    main()
