"""Auxiliary subsystems: wrench/ZMP parity, checkpoint/resume, profiling,
telemetry persistence, and the host-MuJoCo simulation path."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, SimConfig
from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model
from ironcub_mpc_tpu.dynamics.wrenches import compute_wrench_summary
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.utils.profiling import DeadlineMonitor, Timer

ROOT = Path(__file__).resolve().parents[1]
MODEL = build_ironcub_model()
KD = KinDyn(MODEL)


def _standing_geometry():
    q0 = jnp.asarray(np.radians(SimConfig().initial_position_deg), jnp.float32)
    ls = KD.fk(jnp.eye(3), jnp.zeros(3), q0)
    J = KD.link_spatial_jacobians(ls, jnp.zeros(3))
    I_sp, c_w, _ = KD.link_spatial_inertias(ls)
    com = KD.com(c_w)
    jac_com = KD.com_jacobian(J, c_w)
    return ls, J, com, jac_com


def test_wrench_summary_and_zmp():
    ls, J, com, jac_com = _standing_geometry()
    # equal world-vertical forces at both soles -> ZMP midway between them
    # (pre-rotate into each sole's local frame; soles are ~1 deg off-level)
    ps, wr_rows = [], []
    for n in ("l_sole", "r_sole"):
        fr = MODEL.frames[n]
        R_f = np.asarray(ls.R[fr.link] @ jnp.asarray(fr.R, jnp.float32))
        ps.append(np.asarray(ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(
            fr.p, jnp.float32)))
        wr_rows.append(np.concatenate([R_f.T @ np.array([0, 0, 210.0]),
                                       np.zeros(3)]))
    wr = jnp.asarray(np.stack(wr_rows), jnp.float32)
    out = compute_wrench_summary(
        KD, ls, J, com, ("l_sole", "r_sole"), wr, jac_com, threshold=5.0)
    assert bool(out.on_ground)
    np.testing.assert_allclose(float(out.sum_world[2]), 420.0, rtol=1e-5)
    mid = 0.5 * (ps[0] + ps[1])
    np.testing.assert_allclose(np.asarray(out.zmp[:2]), mid[:2], atol=5e-3)
    # below threshold -> not on ground, ZMP zeroed
    out2 = compute_wrench_summary(
        KD, ls, J, com, ("l_sole", "r_sole"), jnp.zeros((2, 6)), jac_com, 5.0)
    assert not bool(out2.on_ground)
    np.testing.assert_allclose(np.asarray(out2.zmp), 0.0)


def test_wrench_lambda_shape():
    ls, J, com, jac_com = _standing_geometry()
    wr = jnp.zeros((4, 6)).at[:, 2].set(50.0)
    out = compute_wrench_summary(
        KD, ls, J, com, tuple(SimConfig().external_wrenches_list), wr,
        jac_com, 5.0)
    assert out.lambda_mom.shape == (6, 6 + 23)
    assert out.amom.shape == (4, 6, 6)


def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, str(ROOT / "examples"))
    from closed_loop_demo import standing_state

    from ironcub_mpc_tpu.runtime import checkpoint
    from ironcub_mpc_tpu.runtime.loop import ClosedLoop
    from ironcub_mpc_tpu.sim.plant import Plant

    plant = Plant(KD, RobotConfig(), SimConfig(use_nn_jet_dynamics=False))
    loop = ClosedLoop(plant, MPCConfig(), admm.ADMMSettings(max_iter=40))
    s = standing_state(plant, SimConfig().initial_position_deg)
    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    problem, carry = loop.configure(s, channels, np.full(600, 0.08))
    carry, _ = loop.rollout_jit()(problem, carry, 3)

    path = checkpoint.save(tmp_path / "ckpt", problem, carry, step=3)
    p2, c2, step = checkpoint.restore(path, problem, carry)
    assert step == 3
    np.testing.assert_allclose(np.asarray(c2.mpc.warm_x),
                               np.asarray(carry.mpc.warm_x))
    np.testing.assert_allclose(np.asarray(c2.plant.q), np.asarray(carry.plant.q))
    # resumed rollout continues identically to an uninterrupted one
    c_resumed, t1 = loop.rollout_jit()(p2, c2, 2)
    c_direct, t2 = loop.rollout_jit()(problem, carry, 2)
    np.testing.assert_allclose(np.asarray(t1.com_position),
                               np.asarray(t2.com_position), atol=1e-6)


def test_telemetry_mat_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, str(ROOT / "examples"))
    from closed_loop_demo import standing_state

    import scipy.io

    from ironcub_mpc_tpu.runtime import telemetry
    from ironcub_mpc_tpu.runtime.loop import ClosedLoop
    from ironcub_mpc_tpu.sim.plant import Plant

    plant = Plant(KD, RobotConfig(), SimConfig(use_nn_jet_dynamics=False))
    loop = ClosedLoop(plant, MPCConfig(), admm.ADMMSettings(max_iter=40))
    s = standing_state(plant, SimConfig().initial_position_deg)
    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    problem, carry = loop.configure(s, channels, np.full(600, 0.08))
    carry, tel = loop.rollout_jit()(problem, carry, 4)
    path = telemetry.save_mat(tel, str(tmp_path / "run.mat"))
    back = scipy.io.loadmat(path)
    # reference channel names present (variable_sampling_mpc.py:164-188)
    for key in ("CoMPosition", "CoMPosition_desired", "joints_pos_ref",
                "estimated_thrust", "throttle", "time_controller"):
        assert key in back, key
    assert back["CoMPosition"].shape == (4, 3)


def test_profiling_tools():
    t = Timer(window=3)
    for _ in range(5):
        with t:
            pass
    assert len(t.samples) == 5 and t.rolling_mean() >= 0
    d = DeadlineMonitor(period=0.005, verbose=False)
    assert not d.check(0.004)
    assert d.check(0.006)
    assert d.overruns == 1


def test_host_mujoco_sim_runs_and_matches_snapshot():
    """The MuJoCo-backed plant stands under PD and its snapshot feeds the
    MPC; cross-engine CoM agreement with the JAX FK at the same state."""
    from ironcub_mpc_tpu.sim.mujoco_sim import HostMujocoSim

    sim = HostMujocoSim(KD, RobotConfig(), SimConfig(use_nn_jet_dynamics=False))
    q0 = np.radians(SimConfig().initial_position_deg)
    # place above ground using the JAX-side standing geometry
    ls = KD.fk(jnp.eye(3), jnp.zeros(3), jnp.asarray(q0, jnp.float32))
    fr = MODEL.frames["l_sole"]
    sole_z = float((ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(
        fr.p, jnp.float32))[2])
    sim.set_state(np.eye(3), [0, 0, -sole_z + 0.012], q0)
    sim.set_joint_positions(q0)
    sim.set_thrust(np.full(4, 10.0))
    sim.step(500)  # 0.5 s settle
    snap = sim.snapshot()
    assert np.all(np.isfinite(np.asarray(snap.com_pos)))
    # robot still standing (base z close to initial)
    assert abs(sim.get_base_position()[2] + sole_z) < 0.05
    # mujoco subtree CoM agrees with our kinodynamics at the same state
    import mujoco

    mujoco.mj_forward(sim.model, sim.data)
    np.testing.assert_allclose(np.asarray(snap.com_pos),
                               sim.data.subtree_com[1], atol=1e-4)


def test_host_mujoco_closed_loop_ticks():
    """A few full MPC ticks against the MuJoCo plant (config-1 style)."""
    from ironcub_mpc_tpu.core.config import joint_selector
    from ironcub_mpc_tpu.horizon import build_schedule
    from ironcub_mpc_tpu.qp import mpc as vs_mpc
    from ironcub_mpc_tpu.sim.mujoco_sim import HostMujocoSim

    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    settings = admm.ADMMSettings(max_iter=60)
    sim = HostMujocoSim(KD, RobotConfig(), SimConfig(use_nn_jet_dynamics=False))
    q0 = np.radians(SimConfig().initial_position_deg)
    ls = KD.fk(jnp.eye(3), jnp.zeros(3), jnp.asarray(q0, jnp.float32))
    fr = MODEL.frames["l_sole"]
    sole_z = float((ls.p[fr.link] + ls.R[fr.link] @ jnp.asarray(
        fr.p, jnp.float32))[2])
    sim.set_state(np.eye(3), [0, 0, -sole_z + 0.012], q0)
    sim.set_joint_positions(q0)
    sim.set_thrust(np.full(4, 10.0))
    sim.step(400)

    snap = sim.snapshot()
    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    problem, carry = vs_mpc.configure(cfg, sched, sel, snap, channels,
                                      np.full(600, 0.08), settings)
    statuses = []
    for _ in range(6):
        snap = sim.snapshot()
        carry, out = vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                     carry, snap,
                                     jnp.asarray(sim.get_estimated_thrust_dot(),
                                                 jnp.float32))
        sim.set_thrust(np.asarray(out.thrust_des))
        sim.set_joint_positions(np.asarray(out.joints_pos_ref))
        sim.set_throttle(np.asarray(out.throttle))
        sim.step(5)
        statuses.append(int(out.status))
    assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE) for s in statuses)


def test_debug_log_mode():
    """enable_debug_log_mode parity (IMPCProblem.cpp:300-408): flag on emits
    per-block ½xᵀHx+gᵀx values and lb ≤ Ax ≤ ub triples on both solver
    paths, and the two paths agree on the block costs; flag off emits
    nothing (static branch)."""
    import dataclasses

    import __graft_entry__ as ge
    from ironcub_mpc_tpu.qp import mpc as vs_mpc

    settings = admm.ADMMSettings(max_iter=120, pallas_mode="off")

    def one_tick(cfg):
        cfg2, sched, sel, st, problem, carry, snap, _ = ge._setup(
            cfg=cfg, settings=settings)
        return vs_mpc.mpc_tick(cfg2, sched, sel, st, problem, carry, snap,
                               jnp.zeros(4))

    # flag off: no debug payload
    _, out_off = one_tick(MPCConfig())
    assert out_off.debug is None

    outs = {}
    for solver in ("condensed", "full"):
        cfg = dataclasses.replace(MPCConfig(), enable_debug_log_mode=True,
                                  qp_solver=solver)
        _, out = one_tick(cfg)
        dbg = out.debug
        assert dbg is not None
        assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
        m = MPCConfig().n_constraints
        assert dbg.constraint_lb.shape == (m,)
        # the accepted solution satisfies every row (loose feasibility tol)
        ax = np.asarray(dbg.constraint_ax, np.float64)
        lb = np.asarray(dbg.constraint_lb, np.float64)
        ub = np.asarray(dbg.constraint_ub, np.float64)
        scale = np.maximum(np.abs(lb), 1.0)
        assert np.all(ax >= lb - 5e-3 * scale), (ax - lb).min()
        assert np.all(ax <= ub + 5e-3 * scale), (ub - ax).min()
        np.testing.assert_allclose(float(dbg.total_cost),
                                   float(jnp.sum(dbg.block_costs)),
                                   rtol=1e-6)
        outs[solver] = np.asarray(dbg.block_costs, np.float64)

    # both solvers minimize the same QP: per-block costs agree
    scale = max(np.abs(outs["full"]).max(), 1.0)
    assert np.abs(outs["condensed"] - outs["full"]).max() / scale < 1e-2, (
        outs)

    # channels flow into the .mat dict
    from ironcub_mpc_tpu.runtime.telemetry import to_mat_dict
    from ironcub_mpc_tpu.runtime.loop import TickTelemetry
    z3 = jnp.zeros(3)
    tel = TickTelemetry(*([z3] * 15), *([jnp.zeros(4)] * 4),
                        jnp.zeros(()), jnp.zeros(4), jnp.zeros(()),
                        jnp.zeros(()), jnp.zeros(()), z3,
                        jnp.zeros((), bool), jnp.zeros(6),
                        debug=outs and out.debug)
    mat = to_mat_dict(tel)
    assert "debug_ReferenceTrackingCost_xHx_gx" in mat
    assert mat["debug_constraint_Ax"].shape == (MPCConfig().n_constraints,)


def test_realtime_driver_smoke(tmp_path):
    """Native-pacer + telemetry-ring host loop drives the jitted tick and
    accounts overruns/drops (variable_sampling_mpc.py:106-161 analog)."""
    import sys
    sys.path.insert(0, str(ROOT / "examples"))
    import realtime_driver

    stats = realtime_driver.run(
        n_ticks=60, period_s=0.05,
        drain_path=str(tmp_path / "rt.f32"), verbose=False)
    assert stats["ticks"] == 60
    assert stats["ring_dropped"] == 0
    assert stats["drained_records"] == 60
    # generous period: the loop must hold it on any host
    assert stats["overruns"] <= 6
    rec = np.fromfile(tmp_path / "rt.f32", np.float32).reshape(60, -1)
    assert rec.shape[1] == realtime_driver.RECORD_LEN
    # status channel: every tick solved
    assert np.all((rec[:, 1] == admm.SOLVED)
                  | (rec[:, 1] == admm.SOLVED_INACCURATE))


def test_visualize_run(tmp_path):
    """Telemetry .mat -> PNG dashboard renders headless."""
    import sys
    sys.path.insert(0, str(ROOT / "examples"))
    sys.path.insert(0, str(ROOT / "tools"))
    from closed_loop_demo import standing_state
    from ironcub_mpc_tpu.runtime.loop import ClosedLoop
    from ironcub_mpc_tpu.runtime.telemetry import save_mat
    from ironcub_mpc_tpu.sim.plant import Plant
    import visualize_run

    model = build_ironcub_model()
    plant = Plant(KinDyn(model), RobotConfig(),
                  SimConfig(use_nn_jet_dynamics=False))
    loop = ClosedLoop(plant, MPCConfig(), admm.ADMMSettings(max_iter=40))
    s = standing_state(plant, SimConfig().initial_position_deg)
    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    problem, carry = loop.configure(s, channels, np.full(600, 0.08))
    carry, tel = loop.rollout_jit()(problem, carry, 5)
    mat_path = save_mat(tel, str(tmp_path / "run.mat"))
    import scipy.io
    mat = scipy.io.loadmat(mat_path, squeeze_me=False)
    png = visualize_run.render(mat, str(tmp_path / "run.png"))
    assert (tmp_path / "run.png").stat().st_size > 10_000


def test_host_mujoco_viewer_headless_fallback():
    """run_visualization on a headless host degrades gracefully and
    is_running() keeps the driver loop alive."""
    from ironcub_mpc_tpu.sim.mujoco_sim import HostMujocoSim

    model = build_ironcub_model()
    kd = KinDyn(model)
    with pytest.warns(UserWarning, match="viewer unavailable"):
        sim = HostMujocoSim(kd, RobotConfig(),
                            SimConfig(use_nn_jet_dynamics=False),
                            run_visualization=True)
    assert sim.viewer is None
    assert sim.is_running()
    sim.set_state(np.eye(3), np.array([0.0, 0.0, 1.0]),
                  np.radians(SimConfig().initial_position_deg))
    sim.step(3)  # viewer_sync no-ops headless
