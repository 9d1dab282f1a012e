#!/usr/bin/env python
"""Convert reference data assets to the framework's native .npz formats.

Inputs (read-only, optional — skipped when absent):
- MATLAB v7.3 trajectories ``minimumJerkTrajectory.mat`` / ``alphaGravity.mat``
  (reference ``src/trajectories/``) -> ``data/trajectories/*.npz``
- LSTM jet-model checkpoint ``model_7.pth`` (reference
  ``src/mujoco_lib/jet_model_torch/``) -> ``data/jet_lstm_weights.npz``

When the reference assets are unavailable, synthesises equivalent data so the
framework is self-contained: a minimum-jerk hover/translation trajectory, the
takeoff gravity ramp, and randomly initialised LSTM weights.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")


def minimum_jerk(p0, p1, T, t):
    """Classic minimum-jerk interpolation p0->p1 over duration T."""
    s = np.clip(t / T, 0.0, 1.0)
    shape = 10 * s**3 - 15 * s**4 + 6 * s**5
    dshape = (30 * s**2 - 60 * s**3 + 30 * s**4) / T
    p = p0 + (p1 - p0) * shape[:, None]
    v = (p1 - p0) * dshape[:, None]
    return p, v


def synthesize_trajectories(out_dir: Path):
    """Build a takeoff + translate flight reference at 10 fps (148 s) and a
    35 s alphaGravity ramp, mirroring the shapes of the reference data."""
    fps = 10.0
    T = 1481
    t = np.arange(T) / fps
    pos = np.zeros((T, 3))
    vel = np.zeros((T, 3))
    # 0-30 s: hold; 30-60 s: rise 1.5 m; 60-100 s: translate 2 m in x
    seg1 = (t >= 30) & (t < 60)
    p_z, v_z = minimum_jerk(np.zeros(1), np.array([1.5]), 30.0, t[seg1] - 30.0)
    pos[seg1, 2] = p_z[:, 0]
    vel[seg1, 2] = v_z[:, 0]
    pos[t >= 60, 2] = 1.5
    seg2 = (t >= 60) & (t < 100)
    p_x, v_x = minimum_jerk(np.zeros(1), np.array([2.0]), 40.0, t[seg2] - 60.0)
    pos[seg2, 0] = p_x[:, 0]
    vel[seg2, 0] = v_x[:, 0]
    pos[t >= 100, 0] = 2.0
    rpy = np.zeros((T, 3))
    rpy_dot = np.zeros((T, 3))
    np.savez(out_dir / "minimum_jerk.npz", positionCoM=pos, velocityCoM=vel,
             RPY=rpy, RPYDot=rpy_dot, fps=np.array([[fps]]))

    Ta = 351
    ta = np.arange(Ta) / fps
    # ramp 0.08 -> 1.0 over 10-25 s, then hold (takeoff gravity compensation)
    alpha = np.full((Ta, 1), 0.08)
    ramp = (ta >= 10) & (ta < 25)
    a_r, _ = minimum_jerk(np.array([0.08]), np.array([1.0]), 15.0, ta[ramp] - 10.0)
    alpha[ramp, 0] = a_r[:, 0]
    alpha[ta >= 25, 0] = 1.0
    np.savez(out_dir / "alpha_gravity.npz", alphaGravity=alpha,
             fps=np.array([[fps]]))
    print("synthesised trajectories ->", out_dir)


def convert_trajectories(out_dir: Path):
    import h5py

    src = REF / "src/trajectories"
    for name, out in [("minimumJerkTrajectory.mat", "minimum_jerk.npz"),
                      ("alphaGravity.mat", "alpha_gravity.npz")]:
        with h5py.File(src / name) as h:
            data = {k: np.array(v) for k, v in h.items()}
        np.savez(out_dir / out, **data)
        print(f"{name} -> {out}:", {k: v.shape for k, v in data.items()})


def convert_lstm(out_path: Path):
    import torch

    ck = torch.load(REF / "src/mujoco_lib/jet_model_torch/model_7.pth",
                    map_location="cpu", weights_only=False)
    sd = ck["model_state_dict"]
    md = ck["metadata"]
    np.savez(
        out_path,
        w_ih=sd["lstm.weight_ih_l0"].numpy(),   # [4H, in]
        w_hh=sd["lstm.weight_hh_l0"].numpy(),   # [4H, H]
        b_ih=sd["lstm.bias_ih_l0"].numpy(),
        b_hh=sd["lstm.bias_hh_l0"].numpy(),
        fc_w=sd["fc.weight"].numpy(),           # [1, H]
        fc_b=sd["fc.bias"].numpy(),
        thrust_mean=np.array(md["thrust_mean"]),
        thrust_std=np.array(md["thrust_std"]),
        throttle_mean=np.array(md["throttle_mean"]),
        throttle_std=np.array(md["throttle_std"]),
    )
    print("LSTM checkpoint ->", out_path)


def synthesize_lstm(out_path: Path):
    rng = np.random.default_rng(0)
    H, IN = 80, 2
    np.savez(
        out_path,
        w_ih=rng.normal(0, 0.1, (4 * H, IN)).astype(np.float32),
        w_hh=rng.normal(0, 0.1, (4 * H, H)).astype(np.float32),
        b_ih=np.zeros(4 * H, np.float32),
        b_hh=np.zeros(4 * H, np.float32),
        fc_w=rng.normal(0, 0.1, (1, H)).astype(np.float32),
        fc_b=np.zeros(1, np.float32),
        thrust_mean=np.array(106.45674270279225),
        thrust_std=np.array(67.65402248339913),
        throttle_mean=np.array(46.591412689912644),
        throttle_std=np.array(31.970014330288528),
    )
    print("synthesised LSTM weights ->", out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-synth", action="store_true")
    args = ap.parse_args()
    traj_dir = REPO / "data/trajectories"
    traj_dir.mkdir(parents=True, exist_ok=True)
    have_ref = REF.exists() and not args.force_synth
    if have_ref:
        convert_trajectories(traj_dir)
        convert_lstm(REPO / "data/jet_lstm_weights.npz")
    else:
        synthesize_trajectories(traj_dir)
        synthesize_lstm(REPO / "data/jet_lstm_weights.npz")


if __name__ == "__main__":
    main()
