"""Telemetry persistence and introspection.

The reference emits telemetry two ways: structured per-block channels over a
YARP ``VectorsCollectionServer`` (IMPCProblem.cpp:300-408) and a timestamped
``.mat`` dump of the driver-side arrays (variable_sampling_mpc.py:163-194).
Here the scan-accumulated :class:`~ironcub_mpc_tpu.runtime.loop.TickTelemetry`
pytree is the single source; this module flattens it to the reference's
``.mat`` channel names (so reference analysis scripts work unchanged) and
adds the debug-mode per-block introspection the reference gates behind
``enableDebugLogMode``.
"""

from __future__ import annotations

import time
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .loop import TickTelemetry

# TickTelemetry field -> reference .mat key (variable_sampling_mpc.py:164-188)
MAT_KEYS = {
    "com_position": "CoMPosition",
    "com_position_desired": "CoMPosition_desired",
    "base_orientation_desired": "base_orientation_desired",
    "base_position": "base_position",
    "base_orientation": "base_orientation",
    "base_lin_vel": "base_lin_vel",
    "base_ang_vel": "base_ang_vel",
    "base_lin_vel_filtered": "base_lin_vel_filtered",
    "base_ang_vel_filtered": "base_ang_vel_filtered",
    "joints_pos_meas": "joints_pos_meas",
    "joints_vel_meas": "joints_vel_meas",
    "joints_pos_ref": "joints_pos_ref",
    "linear_momentum": "linear_momentum",
    "angular_momentum": "angular_momentum",
    "momentum_reference": "momentum_reference",
    "estimated_thrust": "estimated_thrust",
    "estimated_thrust_dot": "estimated_thrust_dot",
    "thrust_desired": "thrust_desired",
    "thrust_desired_dot": "thrust_desired_dot",
    "alpha_gravity": "alpha_gravity",
    "throttle": "throttle",
    "solver_status": "solver_status",
    "pri_res": "pri_res",
    "dua_res": "dua_res",
}


def to_mat_dict(tel: "TickTelemetry", period: float = 0.005) -> dict:
    """Stacked telemetry -> reference-named numpy dict (+time_controller)."""
    out = {}
    for field, key in MAT_KEYS.items():
        out[key] = np.asarray(getattr(tel, field))
    n = out["CoMPosition"].shape[0]
    out["time_controller"] = np.arange(1, n + 1) * period
    return out


def save_mat(tel: "TickTelemetry", path: str | None = None,
             period: float = 0.005, extra: dict | None = None) -> str:
    """Dump a run to ``.mat`` (timestamped by default, like the reference)."""
    import scipy.io

    if path is None:
        path = time.strftime("%Y-%m-%d_%H-%M-%S") + ".mat"
    data = to_mat_dict(tel, period)
    if extra:
        data.update(extra)
    scipy.io.savemat(path, data)
    return path


def debug_block_costs(problem, cfg, u, states, state_reference) -> dict:
    """Per-cost-block values of a condensed solution — the debug-mode
    ``<block>::xHx_gx`` channels (IMPCProblem.cpp:360-376).

    Returns {block name: cost value} for the four cost blocks.
    """
    import jax.numpy as jnp

    nj, nt, ch = cfg.n_ctrl_joints, cfg.n_jets, cfg.control_horizon
    q_diag = jnp.diagonal(problem.Q)
    err = states - state_reference.T
    tracking = float(jnp.sum(err * err * q_diag[None, :]))
    dq = u[:nj * ch].reshape(ch, nj)
    reg_joint = float(jnp.sum(
        dq * dq * jnp.asarray(cfg.weight_delta_joint)[None, :]))
    v = u[nj * ch:].reshape(-1, nt)
    dv = v[1:] - v[:-1]
    reg_throttle = float(cfg.weight_throttle * jnp.sum(dv * dv))
    init_throttle = float(cfg.weight_initial_throttle * jnp.sum(v[0] * v[0]))
    return {
        "ReferenceTrackingCost": tracking,
        "RegualarizationCost": reg_joint + reg_throttle,
        "ThrottleInitialValueCost": init_throttle,
        "JointPositionRegularizationCost": None,  # needs joint state; see loop
    }
