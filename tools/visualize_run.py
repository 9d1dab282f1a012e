#!/usr/bin/env python
"""Render a telemetry .mat dump (runtime.telemetry.save_mat format, same
channel names as the reference driver's scipy.io.savemat) into a one-page
PNG dashboard: CoM tracking, attitude, momenta, thrust/throttle multi-rate
staircase, ZMP/ground contact, and solver health.

Headless-safe (matplotlib Agg). Usage:
    python tools/visualize_run.py run.mat [out.png]
"""

import sys
from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def render(mat: dict, out_path: str) -> str:
    t = np.ravel(mat["time_controller"])
    fig, axes = plt.subplots(3, 3, figsize=(16, 10), constrained_layout=True)

    ax = axes[0, 0]
    for i, lbl in enumerate("xyz"):
        ax.plot(t, mat["CoMPosition"][:, i], label=f"CoM {lbl}")
        ax.plot(t, mat["CoMPosition_desired"][:, i], "--", alpha=0.6)
    ax.set_title("CoM position vs reference [m]")
    ax.legend(fontsize=7)

    ax = axes[0, 1]
    for i, lbl in enumerate(("roll", "pitch", "yaw")):
        ax.plot(t, np.degrees(mat["base_orientation"][:, i]), label=lbl)
        ax.plot(t, np.degrees(mat["base_orientation_desired"][:, i]), "--",
                alpha=0.6)
    ax.set_title("base RPY vs reference [deg]")
    ax.legend(fontsize=7)

    ax = axes[0, 2]
    for i, lbl in enumerate("xyz"):
        ax.plot(t, mat["linear_momentum"][:, i], label=f"lin {lbl}")
        ax.plot(t, mat["angular_momentum"][:, i], ":", label=f"ang {lbl}")
    ax.set_title("centroidal momentum (body) [N·s / N·m·s]")
    ax.legend(fontsize=6, ncol=2)

    ax = axes[1, 0]
    for i in range(4):
        ax.plot(t, mat["thrust_desired"][:, i], label=f"T{i} des")
        ax.plot(t, mat["estimated_thrust"][:, i], "--", alpha=0.6)
    ax.set_title("thrust: desired vs estimated [N]")
    ax.legend(fontsize=6, ncol=2)

    ax = axes[1, 1]
    for i in range(4):
        ax.step(t, mat["throttle"][:, i], where="post", label=f"u{i}")
    ax.set_title("throttle (10 Hz multi-rate staircase) [%]")
    ax.legend(fontsize=7)

    ax = axes[1, 2]
    ax.plot(t, mat["joints_pos_ref"] - mat["joints_pos_meas"], alpha=0.7)
    ax.set_title("joint tracking error (ref − meas) [rad]")

    ax = axes[2, 0]
    if "ZMP" in mat:
        ax.plot(t, mat["ZMP"][:, 0], label="ZMP x")
        ax.plot(t, mat["ZMP"][:, 1], label="ZMP y")
        ax.plot(t, mat["CoMPosition"][:, 0], "--", alpha=0.5, label="CoM x")
        ax.plot(t, mat["CoMPosition"][:, 1], "--", alpha=0.5, label="CoM y")
        ax2 = ax.twinx()
        ax2.fill_between(t, 0, np.ravel(mat["robot_on_ground"]).astype(float),
                         alpha=0.1, color="gray", step="post")
        ax2.set_ylabel("on ground")
    ax.set_title("ZMP / ground contact")
    ax.legend(fontsize=7)

    ax = axes[2, 1]
    ax.plot(t, np.ravel(mat["alpha_gravity"]), label="alphaGravity")
    ax.set_title("gravity-compensation ramp")
    ax.legend(fontsize=7)

    ax = axes[2, 2]
    ax.semilogy(t, np.maximum(np.ravel(mat["pri_res"]), 1e-12), label="pri")
    ax.semilogy(t, np.maximum(np.ravel(mat["dua_res"]), 1e-12), label="dua")
    ax2 = ax.twinx()
    ax2.plot(t, np.ravel(mat["solver_status"]), "r.", ms=2)
    ax2.set_ylabel("status (1=solved)")
    # residuals are UNSCALED inf-norms; termination is the relative OSQP
    # criterion (eps_abs + eps_rel * scale), so dua ~ O(1-10) against a
    # large gradient scale is converged — the status trace is the verdict
    ax.set_title("solver residuals (unscaled) / status")
    ax.legend(fontsize=7)

    for row in axes:
        for ax in row:
            ax.set_xlabel("t [s]")
            ax.grid(alpha=0.3)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def main():
    import scipy.io

    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(src).with_suffix(".png"))
    mat = scipy.io.loadmat(src, squeeze_me=False)
    render(mat, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
