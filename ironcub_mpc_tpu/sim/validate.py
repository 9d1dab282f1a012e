"""Cross-engine plant validation: one controller, two physics engines.

Runs the SAME closed-loop MPC (same config, settings, trajectory, initial
state) once against the production JAX plant (:mod:`.plant`) and once
against host MuJoCo (:mod:`.mujoco_sim` — the reference's plant,
mujoco_lib/ironcub_mujoco_simulator.py:122-139), then reports per-tick
CoM / attitude / base-position divergence. This bounds how far the JAX
plant's physics drifts from MuJoCo's: if the penalty-contact/PD model were
off, every Monte-Carlo sweep would sweep the wrong physics.

Where the two plants deliberately differ (the divergence these bounds
absorb):

- **Contacts** — MuJoCo solves a complementarity problem with its soft
  constraint model; the JAX plant uses penalty springs at four sole-corner
  points (``PlantParams.contact_kp/kd``) with smooth Coulomb friction.
  Standing equilibrium therefore differs by O(mm) in penetration depth and
  load distribution.
- **Integration** — MuJoCo semi-implicit Euler with implicit actuator/
  damping terms vs. the JAX plant's semi-implicit Euler with implicit
  *joint-damping only* (plant.substep). Both run at the same 1 kHz.
- **Actuation** — the generated MJCF's position servos (kp=1500, joint
  damping 60; sim/mjcf.py) match ``PlantParams(kp=1500, kd=60)`` by
  construction, so PD torques agree to actuator-model differences
  (MuJoCo clamps via actuator force limits none are set here).
- **Jets** — identical by construction: the same LSTM+EKF chain runs in
  both (sim/jet_lstm.py, sim/ekf.py), and thrust enters both as a pure
  force along the jet site's −z axis.

The divergence is measured in closed loop, so controller feedback partially
compensates plant differences — exactly the regime the sweeps run in.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, RobotConfig, SimConfig, joint_selector
from ..horizon.schedule import build_schedule
from ..ops import admm
from ..ops.so3 import matrix_to_rpy
from ..qp import mpc as vs_mpc


class PlantTrace(NamedTuple):
    """Per-tick channels recorded at the pre-step snapshot (same sampling
    point as runtime.loop.TickTelemetry)."""

    com: np.ndarray        # [T, 3]
    rpy: np.ndarray        # [T, 3] rad
    base_p: np.ndarray     # [T, 3]
    thrust: np.ndarray     # [T, 4] estimated/applied thrust
    status: np.ndarray     # [T]


from ..runtime.flight import standing_geometry as _standing_geometry


def _hold_channels():
    return {k: np.zeros((30, 3)) for k in
            ("positionCoM", "velocityCoM", "RPY", "RPYDot")}


def run_jax_plant(kd, cfg: MPCConfig, settings, sim_cfg: SimConfig, lstm,
                  alpha, n_ticks: int, settle_s: float) -> PlantTrace:
    """Closed loop over the production JAX plant (runtime.loop path)."""
    from ..runtime.loop import ClosedLoop
    from .plant import Plant, PlantParams

    # kd=60 matches the generated MJCF's joint damping (sim/mjcf.py)
    plant = Plant(kd, RobotConfig(), sim_cfg,
                  params=PlantParams(kd=60.0), lstm=lstm)
    loop = ClosedLoop(plant, cfg, settings)
    q0, z_min = _standing_geometry(kd, sim_cfg.initial_position_deg)
    s = plant.init_state(np.eye(3), np.array([0.0, 0.0, -z_min]), q0)
    s = jax.jit(lambda s: loop.settle(s, settle_s))(s)
    problem, carry = loop.configure(s, _hold_channels(), alpha)
    carry, tel = loop.rollout_jit()(problem, carry, n_ticks)
    return PlantTrace(
        com=np.asarray(tel.com_position),
        rpy=np.asarray(tel.base_orientation),
        base_p=np.asarray(tel.base_position),
        thrust=np.asarray(tel.estimated_thrust),
        status=np.asarray(tel.solver_status))


def run_mujoco_plant(kd, cfg: MPCConfig, settings, sim_cfg: SimConfig, lstm,
                     alpha, n_ticks: int, settle_s: float) -> PlantTrace:
    """The same closed loop over host MuJoCo, tick structure mirroring
    runtime.loop.ClosedLoop.tick: snapshot → solve → apply → 5 substeps."""
    from .mujoco_sim import HostMujocoSim

    sim = HostMujocoSim(kd, RobotConfig(), sim_cfg, lstm=lstm)
    q0, z_min = _standing_geometry(kd, sim_cfg.initial_position_deg)
    sim.set_state(np.eye(3), [0.0, 0.0, -z_min], q0)
    sim.set_joint_positions(q0)
    sim.set_thrust(np.full(4, 10.0))
    sim.step(int(round(settle_s / sim_cfg.timestep)))

    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    snap = sim.snapshot()
    problem, carry = vs_mpc.configure(
        cfg, sched, sel, snap, _hold_channels(), alpha, settings,
        est_thrust_dot=jnp.asarray(sim.get_estimated_thrust_dot(), kd.dtype),
        initial_throttle=jnp.asarray(sim._throttle, kd.dtype),
        dtype=kd.dtype)
    tick = jax.jit(lambda problem, carry, snap, est: vs_mpc.mpc_tick(
        cfg, sched, sel, settings, problem, carry, snap, est))
    n_sub = int(round(cfg.period_mpc / sim_cfg.timestep))

    com, rpy, base_p, thrust, status = [], [], [], [], []
    for _ in range(n_ticks):
        snap = sim.snapshot()
        carry, out = tick(problem, carry, snap,
                          jnp.asarray(sim.get_estimated_thrust_dot(),
                                      kd.dtype))
        if not sim_cfg.use_nn_jet_dynamics:
            sim.set_thrust(np.asarray(out.thrust_des))
        sim.set_joint_positions(np.asarray(out.joints_pos_ref))
        sim.set_throttle(np.asarray(out.throttle))
        com.append(np.asarray(snap.com_pos))
        rpy.append(np.asarray(matrix_to_rpy(snap.w_R_b)))
        base_p.append(np.asarray(sim.get_base_position()))
        thrust.append(np.asarray(sim.get_estimated_thrust()))
        status.append(int(out.status))
        sim.step(n_sub)
    return PlantTrace(com=np.stack(com), rpy=np.stack(rpy),
                      base_p=np.stack(base_p), thrust=np.stack(thrust),
                      status=np.asarray(status))


def compare_plants(n_ticks: int = 400, settle_s: float = 1.0,
                   use_nn: bool = True, alpha_ramp: bool = True,
                   max_iter: int = 120) -> dict:
    """Run both engines and report divergence statistics.

    Default scenario (VERDICT r2 item 2): standing + the early alphaGravity
    ramp with NN jets + EKF on — thrust builds from idle toward weight
    support while ground contact carries the remainder.
    """
    from pathlib import Path

    from ..dynamics import KinDyn, load_ironcub_model
    from .jet_lstm import LSTMJetModel

    root = Path(__file__).resolve().parents[2]
    model = load_ironcub_model()
    kd = KinDyn(model)
    cfg = MPCConfig()
    settings = admm.ADMMSettings(max_iter=max_iter,
                                 rho_update_iters=(20, 50))
    sim_cfg = SimConfig(use_nn_jet_dynamics=use_nn)
    lstm = (LSTMJetModel(str(root / "data/jet_lstm_weights.npz"))
            if use_nn else None)
    if alpha_ramp:
        from ..runtime.trajectory import load_npz

        traj = load_npz(str(root / "data/trajectories/alpha_gravity.npz"),
                        des_fps=1.0 / cfg.period_mpc)
        alpha = np.asarray(traj.channels["alphaGravity"])[:, 0]
    else:
        alpha = np.full(max(n_ticks + 10, 600), 0.08)

    a = run_jax_plant(kd, cfg, settings, sim_cfg, lstm, alpha,
                      n_ticks, settle_s)
    b = run_mujoco_plant(kd, cfg, settings, sim_cfg, lstm, alpha,
                         n_ticks, settle_s)

    d_com = np.linalg.norm(a.com - b.com, axis=1)
    d_rpy = np.degrees(np.max(np.abs(
        (a.rpy - b.rpy + np.pi) % (2 * np.pi) - np.pi), axis=1))
    d_base = np.linalg.norm(a.base_p - b.base_p, axis=1)
    d_thrust = np.max(np.abs(a.thrust - b.thrust), axis=1)
    ok = lambda s: (s == admm.SOLVED) | (s == admm.SOLVED_INACCURATE)
    return {
        "n_ticks": int(n_ticks),
        "seconds": round(n_ticks * cfg.period_mpc, 3),
        "jets": "lstm+ekf" if use_nn else "direct",
        "alpha_ramp": bool(alpha_ramp),
        "com_div_max_m": round(float(d_com.max()), 5),
        "com_div_mean_m": round(float(d_com.mean()), 5),
        "rpy_div_max_deg": round(float(d_rpy.max()), 4),
        "base_div_max_m": round(float(d_base.max()), 5),
        "thrust_div_max_n": round(float(d_thrust.max()), 4),
        "jax_solved_frac": round(float(ok(a.status).mean()), 4),
        "mujoco_solved_frac": round(float(ok(b.status).mean()), 4),
        "finite": bool(np.isfinite(a.com).all()
                       and np.isfinite(b.com).all()),
    }
