"""Closed-loop runtime: 200 Hz MPC over the 1 kHz JAX plant.

Equivalent of the reference driver (src/variable_sampling_mpc.py:15-194):
settle on the ground under PD + idle thrust, configure the MPC, then loop
{read sensors → update+solve → apply commands → 5 plant substeps} while
accumulating telemetry.

TPU-first: the whole control tick (estimator, linearisation, QP solve, plant
physics) is one pure function, so a flight is `lax.scan(tick)` — compiled
once, zero host round-trips — and a robustness sweep is `vmap(rollout)`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import MPCConfig, RobotConfig, SimConfig, joint_selector
from ..core.types import MPCCarry, MPCOutput, RobotSnapshot
from ..dynamics.kinodynamics import KinDyn, compute_snapshot
from ..horizon.schedule import HorizonSchedule, build_schedule
from ..ops import admm
from ..qp import mpc as vs_mpc
from ..sim.plant import Plant, PlantState


class LoopCarry(NamedTuple):
    plant: PlantState
    mpc: MPCCarry
    base_lin_vel_filt: jnp.ndarray  # telemetry low-pass (sim.py:327-328)
    base_ang_vel_filt: jnp.ndarray


class TickTelemetry(NamedTuple):
    """Per-tick channels; names mirror the reference's saved .mat arrays
    (variable_sampling_mpc.py:163-188)."""

    com_position: jnp.ndarray
    com_position_desired: jnp.ndarray
    base_orientation_desired: jnp.ndarray
    base_position: jnp.ndarray
    base_orientation: jnp.ndarray
    base_lin_vel: jnp.ndarray
    base_ang_vel: jnp.ndarray
    base_lin_vel_filtered: jnp.ndarray
    base_ang_vel_filtered: jnp.ndarray
    joints_pos_meas: jnp.ndarray
    joints_vel_meas: jnp.ndarray
    joints_pos_ref: jnp.ndarray
    linear_momentum: jnp.ndarray
    angular_momentum: jnp.ndarray
    momentum_reference: jnp.ndarray
    estimated_thrust: jnp.ndarray
    estimated_thrust_dot: jnp.ndarray
    thrust_desired: jnp.ndarray
    thrust_desired_dot: jnp.ndarray
    alpha_gravity: jnp.ndarray
    throttle: jnp.ndarray
    solver_status: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    # wrench aggregation channels (Robot.cpp:280-322 per-setState outputs)
    zmp: jnp.ndarray
    on_ground: jnp.ndarray
    ext_wrench_sum: jnp.ndarray
    # [] bool: carried-inverse recovery guard re-factorised this tick
    # (failure forensics; defaulted so positional construction stays
    # compatible)
    guard_fired: jnp.ndarray = None
    # per-block QP introspection; None unless enable_debug_log_mode
    debug: object = None


class ClosedLoop:
    """Binds a plant, a kinodynamics model and the MPC into one system."""

    def __init__(self, plant: Plant, mpc_cfg: MPCConfig | None = None,
                 settings: admm.ADMMSettings | None = None):
        self.plant = plant
        self.kd = plant.kd
        self.robot_cfg = plant.robot_cfg
        self.cfg = mpc_cfg or MPCConfig()
        self.sched = build_schedule(self.cfg)
        self.sel = joint_selector(self.robot_cfg, self.cfg)
        self.settings = settings or admm.ADMMSettings(max_iter=150)
        self.n_substeps = round(self.cfg.period_mpc / plant.dt)
        # low-pass alpha, reference formula (ironcub_mujoco_simulator.py:308-316)
        self.alpha_lp = self.cfg.period_mpc / (2 * 3.14 * 3 * self.cfg.period_mpc)

    # ------------------------------------------------------------------

    def snapshot(self, s: PlantState) -> Tuple[RobotSnapshot, PlantState]:
        """Robot.setState equivalent from plant sensors (raw velocities are
        fed to the kinodynamics, as in the reference; the low-pass is
        telemetry-only — ironcub_mujoco_simulator.py:327-346). Sole contact
        wrenches feed the snapshot's ZMP/ground-contact aggregation
        (Robot.cpp:280-322). ``sole_wrenches`` re-derives FK/Jacobians that
        ``compute_snapshot`` also builds; both are pure functions of the
        same state, so XLA CSE dedupes them inside any jitted caller (the
        rollout/tick paths) — only eager calls pay twice."""
        lin, ang, s = self.plant.measured_base_velocity(s)
        base_vel = jnp.concatenate([lin, ang])
        snap = compute_snapshot(
            self.kd, self.robot_cfg.jets_list, s.base_R, s.base_p, base_vel,
            s.q, s.qd, self.plant.applied_thrust(s),
            ext_wrench_frames=("l_sole", "r_sole"),
            ext_wrenches_body=self.plant.sole_wrenches(s),
            ground_threshold=self.robot_cfg.threshold_normal_force_on_ground)
        return snap, s

    def settle(self, s: PlantState, seconds: float = 2.0) -> PlantState:
        """Stand under PD with idle thrust (variable_sampling_mpc.py:61-62)."""
        n = int(round(seconds / self.plant.dt))
        return self.plant.step(s, n)

    def configure(self, s: PlantState, traj_channels, alpha_traj):
        snap, s = self.snapshot(s)
        problem, mpc_carry = vs_mpc.configure(
            self.cfg, self.sched, self.sel, snap, traj_channels, alpha_traj,
            self.settings, est_thrust_dot=s.ekf.x[..., 1],
            initial_throttle=s.throttle, dtype=self.kd.dtype)
        carry = LoopCarry(
            plant=s, mpc=mpc_carry,
            base_lin_vel_filt=jnp.zeros(3, self.kd.dtype),
            base_ang_vel_filt=jnp.zeros(3, self.kd.dtype))
        return problem, carry

    # ------------------------------------------------------------------

    def tick(self, problem, carry: LoopCarry,
             settings: admm.ADMMSettings | None = None
             ) -> Tuple[LoopCarry, TickTelemetry]:
        """One 5 ms control tick + 5 plant substeps (pure, scannable).

        ``settings`` overrides the loop's solver settings for this tick —
        the failure-recovery pass re-runs a bad tick with a fresh
        factorisation + boosted iterations (parallel/monte_carlo.py)."""
        s = carry.plant
        snap, s = self.snapshot(s)
        est_td = s.ekf.x[..., 1]
        mpc_carry, out = vs_mpc.mpc_tick(
            self.cfg, self.sched, self.sel, settings or self.settings,
            problem, carry.mpc, snap, est_td)

        # apply commands (variable_sampling_mpc.py:124-135)
        if not self.plant.sim_cfg.use_nn_jet_dynamics:
            s = self.plant.set_thrust(s, out.thrust_des)
        s = self.plant.set_joint_positions(s, out.joints_pos_ref)
        s = self.plant.set_throttle(s, out.throttle)

        # telemetry low-pass on base velocities
        lin, ang = s.base_v[0:3], s.base_v[3:6]
        a = self.alpha_lp
        lp_lin = a * lin + (1 - a) * carry.base_lin_vel_filt
        lp_ang = a * ang + (1 - a) * carry.base_ang_vel_filt

        from ..ops.so3 import matrix_to_rpy
        tel = TickTelemetry(
            com_position=snap.com_pos,
            com_position_desired=out.pos_com_ref,
            base_orientation_desired=out.rpy_ref,
            base_position=s.base_p,
            base_orientation=matrix_to_rpy(s.base_R),
            base_lin_vel=lin, base_ang_vel=ang,
            base_lin_vel_filtered=lp_lin, base_ang_vel_filtered=lp_ang,
            joints_pos_meas=s.q, joints_vel_meas=s.qd,
            joints_pos_ref=out.joints_pos_ref,
            linear_momentum=snap.momentum_body[:3],
            angular_momentum=snap.momentum_body[3:],
            momentum_reference=out.mom_ref,
            estimated_thrust=self.plant.applied_thrust(s),
            estimated_thrust_dot=est_td,
            thrust_desired=out.thrust_des,
            thrust_desired_dot=out.thrust_dot_des,
            alpha_gravity=out.alpha_gravity,
            throttle=out.throttle,
            solver_status=out.status,
            pri_res=out.pri_res,
            dua_res=out.dua_res,
            guard_fired=out.guard_fired,
            zmp=snap.zmp,
            on_ground=snap.on_ground,
            ext_wrench_sum=snap.ext_wrench_sum,
            debug=out.debug,
        )

        s = self.plant.step(s, self.n_substeps)
        return LoopCarry(plant=s, mpc=mpc_carry,
                         base_lin_vel_filt=lp_lin, base_ang_vel_filt=lp_ang), tel

    def rollout(self, problem, carry: LoopCarry, n_ticks: int):
        """`lax.scan` over ticks — one compiled program for a whole flight."""
        def body(c, _):
            return self.tick(problem, c)
        return jax.lax.scan(body, carry, None, length=n_ticks)

    def rollout_jit(self):
        """Jitted (problem, carry, n_ticks-static) rollout."""
        return jax.jit(self.rollout, static_argnums=(2,))
