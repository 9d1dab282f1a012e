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

    from ironcub_mpc_tpu.runtime import telemetry
    from ironcub_mpc_tpu.runtime import flight

    loop, pos_traj, alpha_traj = flight.build_flight_loop(use_nn=use_nn)
    model = loop.kd.model
    n_ticks = int(round(seconds / loop.cfg.period_mpc))
    print(f"jets: {'LSTM+EKF' if use_nn else 'direct thrust'}; settling 2 s, "
          f"then flying {seconds:.0f} s = {n_ticks} ticks ...")
    tel, info = flight.run_flight(seconds, use_nn=use_nn, loop=loop,
                                  pos_traj=pos_traj, alpha_traj=alpha_traj)
    print(f"rollout: {info['rollout_wall_s']:.1f}s wall "
          f"({info['ms_per_tick']:.2f} ms/tick, "
          f"{info['realtime_factor']:.1f}x realtime)")

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
