"""Host-MuJoCo simulation path — fidelity cross-check of the JAX plant.

Re-expression of the reference's ``MujocoSim``
(mujoco_lib/ironcub_mujoco_simulator.py:21-408) against either
(a) a real MJCF asset (``SimConfig.mujoco_model_path``) when the iRonCub
models are installed, or (b) XML generated from the same
:class:`~ironcub_mpc_tpu.dynamics.model.RobotModel` spec the JAX stack uses
(:mod:`.mjcf`).

The MPC still consumes a :class:`RobotSnapshot` produced by the JAX
kinodynamics — this class only replaces the *plant*: step physics with host
MuJoCo, read sensors, apply joint position targets and jet thrust forces,
optionally run the LSTM+EKF thrust pipeline. Use it to validate the pure-JAX
plant (same controller, two independent physics engines).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..core.config import RobotConfig, SimConfig
from ..core.types import RobotSnapshot
from ..dynamics.kinodynamics import KinDyn, compute_snapshot
from .ekf import JetEKF
from .jet_lstm import LSTMJetModel


class HostMujocoSim:
    def __init__(self, kd: KinDyn, robot_cfg: RobotConfig | None = None,
                 sim_cfg: SimConfig | None = None,
                 lstm: Optional[LSTMJetModel] = None,
                 mjcf_path: str | None = None,
                 run_visualization: bool = False):
        import mujoco

        self._mujoco = mujoco
        self.kd = kd
        self.robot_cfg = robot_cfg or RobotConfig()
        self.sim_cfg = sim_cfg or SimConfig()
        if mjcf_path:
            self.model = mujoco.MjModel.from_xml_path(mjcf_path)
        else:
            from .mjcf import mjcf_from_model

            xml = mjcf_from_model(kd.model, floor=True, actuators=True,
                                  timestep=self.sim_cfg.timestep)
            self.model = mujoco.MjModel.from_xml_string(xml)
        self.model.opt.timestep = self.sim_cfg.timestep  # 1 kHz (sim.py:46)
        self.data = mujoco.MjData(self.model)
        self._site_ids = {
            n: mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_SITE, n)
            for n in list(self.robot_cfg.jets_list) + ["l_sole", "r_sole"]
            if mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_SITE, n) >= 0}
        self._dof_adr = []
        self._qpos_adr = []
        for jn in kd.model.joint_names:
            jid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, jn)
            self._dof_adr.append(self.model.jnt_dofadr[jid])
            self._qpos_adr.append(self.model.jnt_qposadr[jid])
        self._dof_adr = np.asarray(self._dof_adr)
        self._qpos_adr = np.asarray(self._qpos_adr)
        self._jet_body = [
            self.model.site_bodyid[self._site_ids[n]]
            for n in self.robot_cfg.jets_list]

        self.lstm = lstm
        self.ekf = JetEKF(self.sim_cfg.timestep) if self.sim_cfg.use_nn_jet_dynamics else None
        self._thrust_nn = np.full(4, 10.0)
        self._ekf_state = self.ekf.init(jnp.full(4, 10.0)) if self.ekf else None
        self._throttle = np.zeros(4)
        self._thrust_cmd = np.full(4, 10.0)
        self.desired_joint_pos = np.zeros(kd.n)
        self._rng = np.random.default_rng(0)
        self._jet_chain_cache = {}
        self._snap_jit = None
        self.viewer = None
        self._viewer_closed = False
        if run_visualization:
            self.launch_viewer()

    # ------------------------------------------------------------------
    # passive viewer + thrust visualization
    # (ironcub_mujoco_simulator.py:116-120, 398-404)
    # ------------------------------------------------------------------

    def launch_viewer(self) -> bool:
        """Open the passive viewer; returns False (and keeps running
        headless) when no display/GL is available. The display check comes
        first because glfw aborts the process (not an exception) when it
        cannot open one."""
        import os
        import sys
        import warnings

        headless = (sys.platform.startswith("linux")
                    and not os.environ.get("DISPLAY")
                    and not os.environ.get("WAYLAND_DISPLAY"))
        if headless:
            warnings.warn("viewer unavailable (no display); running headless")
            self.viewer = None
            return False
        try:
            import mujoco.viewer

            self.viewer = mujoco.viewer.launch_passive(self.model, self.data)
            return True
        except Exception as e:  # no GL platform
            warnings.warn(f"viewer unavailable ({e}); running headless")
            self.viewer = None
            return False

    def _update_thrust_geoms(self, thrust):
        """Draw one cylinder per jet, scaled by thrust, pointing along the
        exhaust (+z of the jet site — thrust acts along −z). Mirrors the
        reference's thrust visualization (sim.py:398-404)."""
        mujoco = self._mujoco
        scn = self.viewer.user_scn
        scn.ngeom = 0
        for i, name in enumerate(self.robot_cfg.jets_list):
            sid = self._site_ids[name]
            R_site = self.data.site_xmat[sid].reshape(3, 3)
            p = self.data.site_xpos[sid]
            length = 0.002 * max(float(thrust[i]), 0.0)
            geom = scn.geoms[scn.ngeom]
            mujoco.mjv_initGeom(
                geom, mujoco.mjtGeom.mjGEOM_CYLINDER,
                np.array([0.01, 0.01, length / 2 + 1e-6]),
                p + R_site @ np.array([0.0, 0.0, length / 2]),
                R_site.flatten(), np.array([1.0, 0.45, 0.1, 0.6],
                                           np.float32))
            scn.ngeom += 1

    def _viewer_sync(self, thrust):
        if self.viewer is None:
            return
        if not self.viewer.is_running():
            # user closed the window: remember, so is_running() turns False
            # instead of reading None as "headless, run forever"
            self.viewer = None
            self._viewer_closed = True
            return
        self._update_thrust_geoms(thrust)
        self.viewer.sync()

    def is_running(self) -> bool:
        """Driver loop condition (variable_sampling_mpc.py:106): True while
        the viewer is open (or was never opened — headless); False once the
        user closes the viewer window."""
        if self._viewer_closed:
            return False
        return self.viewer is None or self.viewer.is_running()

    # ------------------------------------------------------------------
    # MujocoSim API parity
    # ------------------------------------------------------------------

    def set_state(self, base_R, base_p, q):
        from scipy.spatial.transform import Rotation

        self.data.qpos[:] = 0
        self.data.qvel[:] = 0
        self.data.qpos[0:3] = np.asarray(base_p)
        quat = Rotation.from_matrix(np.asarray(base_R)).as_quat()
        self.data.qpos[3:7] = quat[[3, 0, 1, 2]]
        self.data.qpos[self._qpos_adr] = np.asarray(q)
        self._mujoco.mj_forward(self.model, self.data)

    def set_joint_positions(self, q_des):
        self.desired_joint_pos = np.asarray(q_des)

    def set_throttle(self, throttle):
        self._throttle = np.asarray(throttle)

    def set_thrust(self, thrust):
        self._thrust_cmd = np.asarray(thrust)

    def get_joint_positions(self):
        return self.data.qpos[self._qpos_adr].copy()

    def get_joint_velocities(self):
        return self.data.qvel[self._dof_adr].copy()

    def get_estimated_thrust(self):
        if self.ekf is not None:
            return np.asarray(self._ekf_state.x[:, 0])
        return self._thrust_cmd

    def get_estimated_thrust_dot(self):
        if self.ekf is not None:
            return np.asarray(self._ekf_state.x[:, 1])
        return np.zeros(4)

    def get_base_position(self):
        return self.data.qpos[0:3].copy()

    def get_base_velocity(self):
        # free joint linear velocity is world-frame
        v = self.data.qvel[0:3].copy()
        if self.sim_cfg.simulate_noise:
            v = v + self._rng.normal(0, self.sim_cfg.noise_std_base_vel, 3)
        return v

    def get_base_angular_velocity(self):
        from scipy.spatial.transform import Rotation

        q = self.data.qpos[3:7]
        R = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix()
        w = R @ self.data.qvel[3:6]  # free-joint angular vel is body-frame
        if self.sim_cfg.simulate_noise:
            w = w + self._rng.normal(0, self.sim_cfg.noise_std_base_vel, 3)
        return w

    def _apply_thrust_forces(self, thrust):
        """Jet forces along each site's −z axis via xfrc_applied."""
        self.data.xfrc_applied[:] = 0
        for i, name in enumerate(self.robot_cfg.jets_list):
            sid = self._site_ids[name]
            R_site = self.data.site_xmat[sid].reshape(3, 3)
            axis = R_site @ np.array([0.0, 0.0, -1.0])
            f = axis * thrust[i]
            bid = self._jet_body[i]
            p_site = self.data.site_xpos[sid]
            p_body = self.data.xipos[bid]
            self.data.xfrc_applied[bid, 0:3] += f
            self.data.xfrc_applied[bid, 3:6] += np.cross(p_site - p_body, f)

    def _jet_chain(self, n_steps: int):
        """Jitted ``n_steps``-long LSTM→EKF chain. The jet pipeline only
        depends on the (constant within a ``step`` call) throttle, never on
        MuJoCo state, so the per-1 kHz-substep thrust sequence can be
        computed in one compiled scan instead of ~ms-scale eager jnp calls
        per substep — identical semantics, ~50x faster host stepping."""
        fn = self._jet_chain_cache.get(n_steps)
        if fn is None:
            import jax

            dt = float(self.model.opt.timestep)

            def chain(thrust_nn, ekf_state, throttle):
                def body(c, _):
                    t_nn, ekf_s = c
                    t, td = self.lstm.step(t_nn, throttle, dt)
                    ekf_s = self.ekf.update(ekf_s, throttle, t, td)
                    return (t, ekf_s), ekf_s.x[:, 0]

                (t_nn, ekf_s), thrust_seq = jax.lax.scan(
                    body, (thrust_nn, ekf_state), None, length=n_steps)
                return t_nn, ekf_s, thrust_seq

            fn = jax.jit(chain)
            self._jet_chain_cache[n_steps] = fn
        return fn

    def step(self, n_steps: int = 1):
        """1 kHz loop: LSTM→EKF→thrust, PD targets, mj_step
        (ironcub_mujoco_simulator.py:122-139)."""
        if self.ekf is not None:
            t_nn, ekf_s, thrust_seq = self._jet_chain(n_steps)(
                jnp.asarray(self._thrust_nn), self._ekf_state,
                jnp.asarray(self._throttle))
            thrust_seq = np.asarray(thrust_seq)
        for k in range(n_steps):
            if self.ekf is not None:
                thrust = thrust_seq[k]
            else:
                thrust = self._thrust_cmd
            self._apply_thrust_forces(thrust)
            self.data.ctrl[:len(self.desired_joint_pos)] = self.desired_joint_pos
            self._mujoco.mj_step(self.model, self.data)
            self._viewer_sync(thrust)
        if self.ekf is not None:
            self._thrust_nn = np.asarray(t_nn)
            self._ekf_state = ekf_s

    # ------------------------------------------------------------------

    def snapshot(self) -> RobotSnapshot:
        """Marshal the MuJoCo state into the MPC's snapshot via the JAX
        kinodynamics (update_robot_state equivalent, sim.py:318-346). The
        snapshot function is jitted once per sim (pure function of the
        marshalled state) — identical values, ~30x faster per tick in
        closed-loop validation runs."""
        from scipy.spatial.transform import Rotation

        if self._snap_jit is None:
            import jax

            self._snap_jit = jax.jit(
                lambda R, p, v, q, qd, T: compute_snapshot(
                    self.kd, self.robot_cfg.jets_list, R, p, v, q, qd, T))
        q = self.data.qpos[3:7]
        R = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix()
        base_vel = np.concatenate(
            [self.get_base_velocity(), self.get_base_angular_velocity()])
        return self._snap_jit(
            jnp.asarray(R, self.kd.dtype),
            jnp.asarray(self.data.qpos[0:3], self.kd.dtype),
            jnp.asarray(base_vel, self.kd.dtype),
            jnp.asarray(self.get_joint_positions(), self.kd.dtype),
            jnp.asarray(self.get_joint_velocities(), self.kd.dtype),
            jnp.asarray(self.get_estimated_thrust(), self.kd.dtype))
