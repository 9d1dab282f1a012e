"""JAX rigid-body plant: the MuJoCo-simulator equivalent, fully on-device.

Replaces the reference's host MuJoCo loop (mujoco_lib/ironcub_mujoco_simulator
.py:122-139): 1 kHz semi-implicit integration of the full floating-base
dynamics M(q)ν̇ + h(q,ν) = Sτ + Σ JᵀF with

- joint PD position actuators (the MJCF position-servo analogue),
- jet thrust as pure world-frame forces along each jet frame's axis,
- penalty ground contacts at four corner points per sole (spring-damper
  normal force + smooth Coulomb friction),
- optional LSTM+EKF in-the-loop thrust estimation (use_nn_jet_dynamics) or
  direct thrust actuation,
- Gaussian sensor-noise injection on base velocities (simulate_noise).

Everything is a pure function of :class:`PlantState`, so a rollout is a
`lax.scan` and a Monte-Carlo sweep is a `vmap` — the design reason this
plant exists instead of binding host MuJoCo (which the runtime can still use
for cross-validation when the real assets are present).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import RobotConfig, SimConfig
from ..ops.so3 import skew
from .ekf import EKFState, JetEKF
from .jet_lstm import LSTMJetModel
from ..dynamics.kinodynamics import KinDyn


class PlantState(NamedTuple):
    base_R: jnp.ndarray      # [3,3]
    base_p: jnp.ndarray      # [3]
    base_v: jnp.ndarray      # [6] mixed [v_origin(world); ω(world)]
    q: jnp.ndarray           # [n]
    qd: jnp.ndarray          # [n]
    thrust_nn: jnp.ndarray   # [4] LSTM plant thrust (N)
    ekf: EKFState            # estimated (T, Ṫ)
    throttle: jnp.ndarray    # [4] currently applied throttle (%)
    q_des: jnp.ndarray       # [n] PD position targets
    thrust_cmd: jnp.ndarray  # [4] direct thrust command (when NN model off)
    rng: jnp.ndarray         # PRNG key for sensor noise
    # scenario perturbations (robustness sweeps; zero/one = nominal)
    wind_force: jnp.ndarray   # [3] world-frame gust force applied at the base
    thrust_scale: jnp.ndarray  # [4] multiplicative thrust-model error
    # model-mismatch perturbations: the PLANT flies these perturbed
    # inertial/placement parameters while the controller keeps linearising
    # against the nominal model (sim-to-real margin; ones/zeros = nominal)
    mass_scale: jnp.ndarray = None    # [L] per-link mass (+inertia) scale
    jet_pos_offset: jnp.ndarray = None  # [4,3] jet placement error, link frame


@dataclasses.dataclass(frozen=True)
class PlantParams:
    kp: float = 1500.0         # joint PD stiffness (damping applied implicitly)
    kd: float = 30.0           # joint PD damping
    # ground contact: stiff, well-damped penalty springs (MuJoCo-grade
    # stiffness). Measured at the calibrated 70 kg model: static standing
    # droop -0.7° pitch and a rocking mode at damping ratio ~0.6 — at the
    # old (2e4, 300) the droop was -2.6° with a lightly-damped rock that
    # the grounded MPC's arm action could pump into a backward topple.
    contact_kp: float = 6.0e4  # ground spring
    contact_kd: float = 900.0  # ground damper
    friction_mu: float = 0.8
    friction_vel: float = 0.02  # smooth-friction reference slip speed
    foot_half_x: float = 0.07
    foot_half_y: float = 0.04


class Plant:
    """Static configuration + pure step functions."""

    def __init__(self, kd: KinDyn, robot_cfg: RobotConfig | None = None,
                 sim_cfg: SimConfig | None = None,
                 params: PlantParams = PlantParams(),
                 lstm: LSTMJetModel | None = None):
        self.kd = kd
        self.robot_cfg = robot_cfg or RobotConfig()
        self.sim_cfg = sim_cfg or SimConfig()
        self.params = params
        self.dt = self.sim_cfg.timestep
        self.lstm = lstm
        self.ekf = JetEKF(self.dt, dtype=kd.dtype)
        model = kd.model
        self._jet_frames = [model.frames[n] for n in self.robot_cfg.jets_list]
        self._sole_frames = [model.frames[n] for n in ("l_sole", "r_sole")]
        hx, hy = params.foot_half_x, params.foot_half_y
        self._corners = np.array([[hx, hy, 0], [hx, -hy, 0],
                                  [-hx, hy, 0], [-hx, -hy, 0]])

    # ------------------------------------------------------------------

    def init_state(self, base_R, base_p, q, seed: int = 0,
                   thrust0: float = 10.0) -> PlantState:
        dt_ = self.kd.dtype
        n = self.kd.n
        t0 = jnp.full((4,), thrust0, dt_)
        return PlantState(
            base_R=jnp.asarray(base_R, dt_), base_p=jnp.asarray(base_p, dt_),
            base_v=jnp.zeros(6, dt_), q=jnp.asarray(q, dt_),
            qd=jnp.zeros(n, dt_), thrust_nn=t0, ekf=self.ekf.init(t0),
            throttle=jnp.zeros(4, dt_), q_des=jnp.asarray(q, dt_),
            thrust_cmd=t0, rng=jax.random.PRNGKey(seed),
            wind_force=jnp.zeros(3, dt_), thrust_scale=jnp.ones(4, dt_),
            mass_scale=jnp.ones(self.kd.L, dt_),
            jet_pos_offset=jnp.zeros((4, 3), dt_))

    # ------------------------------------------------------------------
    # actuation setters (the MujocoSim set_* API)
    # ------------------------------------------------------------------

    def set_joint_positions(self, s: PlantState, q_des) -> PlantState:
        return s._replace(q_des=q_des)

    def set_throttle(self, s: PlantState, throttle) -> PlantState:
        return s._replace(throttle=throttle)

    def set_thrust(self, s: PlantState, thrust) -> PlantState:
        return s._replace(thrust_cmd=thrust)

    def applied_thrust(self, s: PlantState):
        """Thrust actually exerted on the robot this step
        (EKF estimate when the NN jet model is on, else the command)."""
        if self.sim_cfg.use_nn_jet_dynamics:
            return s.ekf.x[..., 0]
        return s.thrust_cmd

    # ------------------------------------------------------------------
    # contact model (shared by the dynamics and the FT-sensor readout)
    # ------------------------------------------------------------------

    def _sole_corner_forces(self, ls, J, nu, fr):
        """Per-corner (world point, world force) of the penalty contact."""
        kd = self.kd
        p = self.params
        R_f = ls.R[fr.link] @ jnp.asarray(fr.R, kd.dtype)
        p_f = ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, kd.dtype)
        V = J[fr.link] @ nu  # spatial velocity at origin
        out = []
        for corner in self._corners:
            pc = p_f + R_f @ jnp.asarray(corner, kd.dtype)
            vc = V[0:3] + jnp.cross(V[3:6], pc)
            pen = -pc[2]
            fz = jnp.maximum(p.contact_kp * pen - p.contact_kd * vc[2], 0.0)
            fz = jnp.where(pen > 0, fz, 0.0)
            vt = vc[0:2]
            ft = -p.friction_mu * fz * vt / (
                jnp.linalg.norm(vt) + p.friction_vel)
            out.append((pc, jnp.concatenate([ft, fz[None]])))
        return out

    def sole_wrenches(self, s: PlantState):
        """Ground-contact wrench per sole in the sole frame — the FT-sensor
        readout the reference feeds to ``Robot.setState`` as external
        wrenches (ironcub_mujoco_simulator.py wrench path + Robot.cpp:280).
        Returns [2, 6] (force, torque about the sole origin)."""
        kd = self.kd
        ls = kd.fk(s.base_R, s.base_p, s.q)
        J = kd.link_spatial_jacobians(ls, s.base_p)
        nu = jnp.concatenate([s.base_v, s.qd])
        out = []
        for fr in self._sole_frames:
            R_f = ls.R[fr.link] @ jnp.asarray(fr.R, kd.dtype)
            p_f = ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(fr.p, kd.dtype)
            f_tot = jnp.zeros(3, kd.dtype)
            tau_tot = jnp.zeros(3, kd.dtype)
            for pc, f in self._sole_corner_forces(ls, J, nu, fr):
                f_tot = f_tot + f
                tau_tot = tau_tot + jnp.cross(pc - p_f, f)
            out.append(jnp.concatenate([R_f.T @ f_tot, R_f.T @ tau_tot]))
        return jnp.stack(out)

    # ------------------------------------------------------------------
    # one 1 kHz substep
    # ------------------------------------------------------------------

    def substep(self, s: PlantState) -> PlantState:
        kd = self.kd
        dt = self.dt
        p = self.params

        # --- jet plant + estimator (ironcub_mujoco_simulator.py:129-135) --
        if self.sim_cfg.use_nn_jet_dynamics:
            t_nn, td_nn = self.lstm.step(s.thrust_nn, s.throttle, dt)
            ekf = self.ekf.update(s.ekf, s.throttle, t_nn, td_nn)
            thrust = ekf.x[..., 0]
            s = s._replace(thrust_nn=t_nn, ekf=ekf)
        else:
            thrust = s.thrust_cmd

        # --- kinodynamics at current state ---------------------------------
        # mass_scale applies the per-scenario inertial-parameter error to
        # the TRUE dynamics (mass and rotational inertia scale together —
        # a mis-estimated segment mass); the controller's snapshot keeps
        # using the nominal model
        ls = kd.fk(s.base_R, s.base_p, s.q)
        J = kd.link_spatial_jacobians(ls, s.base_p)
        I_sp, c_w, _ = kd.link_spatial_inertias(
            ls, mass=kd._mass * s.mass_scale,
            inertia=kd._inertia * s.mass_scale[:, None, None])
        M = kd.mass_matrix(J, I_sp)
        nu = jnp.concatenate([s.base_v, s.qd])
        gravity = jnp.asarray(self.robot_cfg.gravity, kd.dtype)
        bias = kd.bias_forces(J, I_sp, ls, s.base_p, nu, gravity)

        # --- generalized forces -------------------------------------------
        # PD damping is handled implicitly in the solve (below) so stiff
        # gains stay stable on low-inertia joints at 1 kHz.
        tau = jnp.zeros_like(nu)
        pd = p.kp * (s.q_des - s.q)
        tau = tau.at[6:].set(pd)

        # jet thrust: pure force f = a_i T_i at the jet frame origin
        # (thrust_scale models per-scenario turbine mismatch;
        # jet_pos_offset a per-scenario placement error in the link frame)
        for i, fr in enumerate(self._jet_frames):
            R_f = ls.R[fr.link] @ jnp.asarray(fr.R, kd.dtype)
            p_f = (ls.p[fr.link] + ls.R[fr.link]
                   @ (jnp.asarray(fr.p, kd.dtype) + s.jet_pos_offset[i]))
            axis = R_f @ jnp.asarray([0.0, 0.0, -1.0], kd.dtype)
            f = axis * (thrust[i] * s.thrust_scale[i])
            F_O = jnp.concatenate([f, jnp.cross(p_f, f)])
            tau = tau + J[fr.link].T @ F_O

        # wind gust: world-frame force at the base origin
        F_wind = jnp.concatenate([s.wind_force,
                                  jnp.cross(s.base_p, s.wind_force)])
        tau = tau + J[0].T @ F_wind

        # ground contact at sole corners
        for fr in self._sole_frames:
            for pc, f in self._sole_corner_forces(ls, J, nu, fr):
                F_O = jnp.concatenate([f, jnp.cross(pc, f)])
                tau = tau + J[fr.link].T @ F_O

        # --- forward dynamics + semi-implicit Euler -----------------------
        # implicit joint damping: τ_d = -D q̇_{k+1}  ⇒  (M + dt·D) ν̇ =
        # τ - D ν_k - bias  (D zero on base rows) — unconditionally stable
        # for any damping gain, like MuJoCo's implicit joint damping.
        D = jnp.zeros(M.shape[0], kd.dtype).at[6:].set(p.kd)
        lhs = M + dt * jnp.diag(D)
        nu_dot = jnp.linalg.solve(lhs, tau - D * nu - bias)
        nu_new = nu + nu_dot * dt
        v, w = nu_new[0:3], nu_new[3:6]
        base_p = s.base_p + v * dt
        base_R = _exp_so3(w * dt) @ s.base_R
        q = s.q + nu_new[6:] * dt
        return s._replace(base_R=base_R, base_p=base_p, base_v=nu_new[0:6],
                          q=q, qd=nu_new[6:])

    def step(self, s: PlantState, n_steps: int) -> PlantState:
        def body(s, _):
            return self.substep(s), None
        s, _ = jax.lax.scan(body, s, None, length=n_steps)
        return s

    # ------------------------------------------------------------------
    # sensors (MujocoSim get_* API, with optional noise)
    # ------------------------------------------------------------------

    def measured_base_velocity(self, s: PlantState):
        """(v_world, ω_world) with optional Gaussian noise
        (ironcub_mujoco_simulator.py:263-288); returns (lin, ang, new_state)."""
        lin, ang = s.base_v[0:3], s.base_v[3:6]
        if self.sim_cfg.simulate_noise:
            rng, k1, k2 = jax.random.split(s.rng, 3)
            lin = lin + self.sim_cfg.noise_std_base_vel * jax.random.normal(
                k1, (3,), s.base_v.dtype)
            ang = ang + self.sim_cfg.noise_std_base_vel * jax.random.normal(
                k2, (3,), s.base_v.dtype)
            s = s._replace(rng=rng)
        return lin, ang, s


def _exp_so3(w):
    """Matrix exponential of a rotation increment (Rodrigues, safe at 0)."""
    th = jnp.linalg.norm(w) + 1e-12
    K = skew(w / th)
    s, c = jnp.sin(th), jnp.cos(th)
    return jnp.eye(3, dtype=w.dtype) + s * K + (1.0 - c) * (K @ K)
