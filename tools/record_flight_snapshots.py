#!/usr/bin/env python
"""Record a real-flight snapshot stream for the command-fidelity oracle.

The fidelity tests (tests/test_command_fidelity.py) replay a snapshot
stream through both the library controller and the independent float64
oracle. The synthetic stream covers sequencing; THIS tool records a stream
from an actual takeoff flight — real thrust magnitudes (~115 N), the
alphaGravity ramp mid-takeoff, real Jacobian conditioning — so the oracle
also certifies fidelity in the regime the mission actually flies
(VERDICT r2 item 6).

Usage: python tools/record_flight_snapshots.py [start_tick=2700] [n=120] [out=flight_snapshots.npz]
Writes tests/golden/flight_snapshots.npz:
  snap_<field>  [n+1, ...] every RobotSnapshot field, f32
  est_td        [n, 4]   EKF thrust-rate estimates fed to each tick
  initial_throttle [4]   applied throttle at the recording handoff
  alpha         [400]    alphaGravity slice from the flight's cursor
  ch_<name>     [45, 3]  reference-trajectory windows from the cursor
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    start_tick = int(args[0]) if args else 2700
    n = int(args[1]) if len(args) > 1 else 120

    from ironcub_mpc_tpu.runtime import flight

    loop, pos_traj, alpha_traj = flight.build_flight_loop(use_nn=True)
    s = flight.standing_state(loop.plant,
                              loop.plant.sim_cfg.initial_position_deg)
    s = jax.jit(lambda s: loop.settle(s, 2.0))(s)
    channels = {k: np.asarray(v) for k, v in pos_traj.channels.items()}
    alpha_full = np.asarray(alpha_traj.channels["alphaGravity"])[:, 0]
    problem, carry = loop.configure(s, channels, alpha_full)

    print(f"fast-forwarding {start_tick} ticks "
          f"(t = {start_tick * loop.cfg.period_mpc:.1f} s) ...", flush=True)
    carry, _ = loop.rollout_jit()(problem, carry, start_tick)
    jax.block_until_ready(carry.plant.base_p)

    tick = jax.jit(lambda c: loop.tick(problem, c))
    snap_of = jax.jit(lambda s: loop.snapshot(s)[0])

    snaps, est_tds = [], []
    throttle0 = np.asarray(carry.plant.throttle)
    alpha_idx = int(carry.mpc.alpha_traj_idx)
    pos_idx = int(carry.mpc.pos_traj_idx)
    for k in range(n + 1):
        snap = snap_of(carry.plant)
        snaps.append({f: np.asarray(getattr(snap, f), np.float32)
                      for f in snap._fields})
        if k < n:
            est_tds.append(np.asarray(carry.plant.ekf.x[..., 1], np.float32))
            carry, tel = tick(carry)
            assert int(tel.solver_status) in (1, 2), \
                f"recording tick {k}: status {int(tel.solver_status)}"

    out = {}
    for f in snaps[0]:
        out[f"snap_{f}"] = np.stack([sd[f] for sd in snaps])
    out["est_td"] = np.stack(est_tds)
    out["initial_throttle"] = throttle0.astype(np.float32)
    out["alpha"] = alpha_full[alpha_idx:alpha_idx + 400].astype(np.float32)
    for name, arr in channels.items():
        out[f"ch_{name}"] = np.asarray(
            arr[pos_idx:pos_idx + 45], np.float32)
    out["meta_start_tick"] = np.asarray([start_tick])
    out["meta_thrust_range"] = np.asarray(
        [out["snap_jet_thrusts"].min(), out["snap_jet_thrusts"].max()])

    dest = ROOT / "tests/golden" / (
        args[2] if len(args) > 2 else "flight_snapshots.npz")
    np.savez_compressed(dest, **out)
    print(f"recorded {n} ticks from t={start_tick * loop.cfg.period_mpc:.2f}s"
          f" (thrust {out['meta_thrust_range'][0]:.1f}–"
          f"{out['meta_thrust_range'][1]:.1f} N, "
          f"alpha {out['alpha'][0]:.2f}→{out['alpha'][min(n, 399)]:.2f})"
          f" -> {dest} ({dest.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
