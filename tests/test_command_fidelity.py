"""Closed-loop command-sequence fidelity vs the independent oracle.

BASELINE's north star asks for thrust + joint commands within tolerance of
the reference controller over the same horizon. The reference stack
(iDynTree/OSQP) is not runnable here, so the oracle is
``tests/golden_oracle.OracleMPC``: a from-scratch float64 NumPy
re-transcription of the *entire multi-tick orchestration* —
reference-window shifts (costsVSMPC.cpp:121-165), multi-rate counters and
throttle pin (constraintsVSMPC.cpp:338-374), RPY unwrap with turn counting
(constraintsVSMPC.cpp:232-247), alphaGravity cursor
(systemDynamicsVSMPC.cpp:263-272), command integration
(variableSamplingMPC.cpp:88-112) — with each tick's QP solved *exactly* by
an active-set method (a different algorithm from the library's ADMM).

Both controllers consume the same synthetic snapshot stream and carry their
own state for 45 ticks — across two 20-tick throttle-update boundaries,
two reference-window shifts and one yaw wrap through ±π — and must emit
the same command sequence. Unlike test_golden_qp (per-tick assembly), this
catches sequencing bugs: counter phase errors, window off-by-ones, unwrap
drift, warm-start contamination, command-integration mistakes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import golden_oracle as oracle
from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.core.types import RobotSnapshot
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as mpc_mod

N_JOINTS = 23
N_TICKS = 45
MASS = 42.0


def _rotmat(rpy):
    cr, sr = np.cos(rpy), np.sin(rpy)
    Rx = np.array([[1, 0, 0], [0, cr[0], -sr[0]], [0, sr[0], cr[0]]])
    Ry = np.array([[cr[1], 0, sr[1]], [0, 1, 0], [-sr[1], 0, cr[1]]])
    Rz = np.array([[cr[2], -sr[2], 0], [sr[2], cr[2], 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _snapshot_dict(t, rng_a, rng_b):
    """Smooth synthetic robot state at tick t (float64).

    Yaw starts near +π−0.09 and drifts up, so matrix_to_rpy wraps to −π
    around tick 9 — exercising the unwrap turn counter mid-sequence.
    """
    w = 2.0 * np.pi * t / 40.0
    mix = 0.5 * (1.0 - np.cos(w))                      # smooth 0→1→0 blend
    rpy = np.array([0.08 * np.sin(w), -0.06 * np.cos(w) + 0.06,
                    3.05 + 0.012 * t])
    rpy[2] = np.arctan2(np.sin(rpy[2]), np.cos(rpy[2]))  # wrapped, like asRPY
    R = _rotmat(rpy)
    axes = np.tile(np.array([0.0, 0.0, 1.0]), (4, 1))
    tilt = 0.05 * np.sin(w + np.arange(4))
    axes[:, 0] += tilt
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    arms = np.array([[0.25, 0.35, -0.05], [0.25, -0.35, -0.05],
                     [-0.08, 0.12, 0.1], [-0.08, -0.12, 0.1]])
    arms = arms + 0.01 * np.sin(w) * rng_a.standard_normal(arms.shape)
    inertia = np.diag([2.1, 1.9, 0.8]) + 0.05 * mix * np.diag(
        rng_a.uniform(0.5, 1.5, 3))
    blend = lambda a, b: (1.0 - mix) * a + mix * b
    sd = dict(
        w_R_b=R,
        base_ang_vel_world=np.array([0.1 * np.sin(w), -0.08 * np.cos(w),
                                     0.05 * np.sin(2 * w)]),
        com_pos=np.array([0.02 * np.sin(w), -0.015 * np.cos(w),
                          0.6 + 0.01 * mix]),
        total_mass=MASS,
        momentum_body=0.4 * np.sin(w + np.arange(6)),
        inertia_locked=inertia,
        jet_axes_world=axes,
        jet_arms_world=arms,
        jet_thrusts=MASS * 9.81 / 4.0 + 8.0 * np.sin(w + np.arange(4)),
        rel_jac_lin=blend(rng_a.normal(0, 0.03, (4, 3, N_JOINTS)),
                          rng_b.normal(0, 0.03, (4, 3, N_JOINTS))),
        rel_jac_ang=blend(rng_a.normal(0, 0.03, (4, 3, N_JOINTS)),
                          rng_b.normal(0, 0.03, (4, 3, N_JOINTS))),
        jac_jets_lin_joints=blend(rng_a.normal(0, 0.03, (4, 3, N_JOINTS)),
                                  rng_b.normal(0, 0.03, (4, 3, N_JOINTS))),
        jac_com_joints=blend(rng_a.normal(0, 0.015, (3, N_JOINTS)),
                             rng_b.normal(0, 0.015, (3, N_JOINTS))),
        joint_pos=0.1 * np.sin(0.05 * t + np.arange(N_JOINTS)),
    )
    return sd


def _to_snapshot(sd):
    f = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    # body-frame allocation matrix, as compute_snapshot provides it
    # (Robot.cpp:324-329 adjoint transform)
    R = sd["w_R_b"]
    amom = np.zeros((6, 4))
    for i in range(4):
        amom[:3, i] = R.T @ sd["jet_axes_world"][i]
        amom[3:, i] = R.T @ np.cross(sd["jet_arms_world"][i],
                                     sd["jet_axes_world"][i])
    return RobotSnapshot(
        w_R_b=f(sd["w_R_b"]), base_pos=f([0.0, 0.0, 0.5]),
        base_ang_vel_world=f(sd["base_ang_vel_world"]),
        com_pos=f(sd["com_pos"]), total_mass=f(sd["total_mass"]),
        momentum_body=f(sd["momentum_body"]),
        inertia_locked=f(sd["inertia_locked"]),
        amom_jets_body=f(amom),
        jet_axes_world=f(sd["jet_axes_world"]),
        jet_arms_world=f(sd["jet_arms_world"]),
        jac_jets_lin_joints=f(sd["jac_jets_lin_joints"]),
        jac_com_joints=f(sd["jac_com_joints"]),
        rel_jac_lin=f(sd["rel_jac_lin"]), rel_jac_ang=f(sd["rel_jac_ang"]),
        joint_pos=f(sd["joint_pos"]), jet_thrusts=f(sd["jet_thrusts"]),
    )


def _trajectories(n=40):
    """Non-trivial references so window shifts move real content."""
    tt = np.arange(n) / 10.0
    return {
        "positionCoM": np.stack([0.05 * np.sin(0.5 * tt),
                                 0.04 * (1 - np.cos(0.5 * tt)),
                                 0.08 * tt / tt[-1]], axis=1),
        "velocityCoM": np.stack([0.025 * np.cos(0.5 * tt),
                                 0.02 * np.sin(0.5 * tt),
                                 np.full(n, 0.08 / tt[-1] * 0.1)], axis=1),
        "RPY": np.stack([0.02 * np.sin(tt), np.zeros(n),
                         0.03 * tt / tt[-1]], axis=1),
        "RPYDot": np.stack([0.02 * np.cos(tt), np.zeros(n),
                            np.full(n, 0.03 / tt[-1] * 0.1)], axis=1),
    }


@pytest.fixture(scope="module",
                params=["condensed", "full", "constant-commanded",
                        "joint-limits"])
def sequences(request):
    """Four controller configurations: both solver paths on the stock
    config; the constant-λ / commanded-thrust variant — there x₀'s
    thrust block comes from the *carried* thrust_des/thrust_dot_des
    commands (constraintsVSMPC.cpp:215-224), a feedback loop through the
    carry that the estimated-thrust configs never exercise; and the
    config-gated joint-position constraint with limits tight enough
    (±3°) that the box is active on real ticks."""
    import dataclasses
    if request.param == "condensed":
        cfg = MPCConfig()
    elif request.param == "full":
        cfg = dataclasses.replace(MPCConfig(), qp_solver="full")
    elif request.param == "joint-limits":
        cfg = dataclasses.replace(MPCConfig(),
                                  use_joint_position_constraint=True,
                                  joint_pos_min_deg=(-3.0,) * 8,
                                  joint_pos_max_deg=(3.0,) * 8)
    else:
        cfg = dataclasses.replace(MPCConfig(),
                                  joints_lambda_option="constant",
                                  use_estimated_thrust=False)
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    settings = admm.ADMMSettings(max_iter=400, polish=True,
                                 pallas_mode="off")

    # both controllers must see bit-identical inputs: round every snapshot
    # field through float32 (what the library consumes) before handing the
    # float64 copy to the oracle
    sds = []
    for t in range(N_TICKS + 1):
        sd = _snapshot_dict(t, np.random.default_rng(100 + t),
                            np.random.default_rng(200 + t))
        sds.append({k: np.asarray(np.asarray(v, np.float32), np.float64)
                    for k, v in sd.items()})
    est_tds_raw = [0.5 * np.sin(0.3 * t + np.arange(4))
                   for t in range(N_TICKS)]
    est_tds = [np.asarray(np.asarray(e, np.float32), np.float64)
               for e in est_tds_raw]
    r32 = lambda a: np.asarray(np.asarray(a, np.float32), np.float64)
    channels = {k: r32(v) for k, v in _trajectories().items()}
    alpha = r32(np.linspace(0.55, 1.0, 400))
    initial_throttle = r32(np.full(4, 62.0))

    snap0 = _to_snapshot(sds[0])
    problem, carry = mpc_mod.configure(
        cfg, sched, sel, snap0, channels, alpha, settings,
        initial_throttle=jnp.asarray(initial_throttle, jnp.float32))

    ocfg = dict(
        n_iter=cfg.n_iter, n_iter_small=cfg.n_iter_small,
        control_horizon=cfg.control_horizon,
        dt_small=cfg.period_mpc_small_steps,
        dt_large=cfg.period_mpc_large_steps,
        w_com=np.asarray(cfg.weight_com_pos),
        w_com_err=np.asarray(cfg.weight_com_pos_error),
        w_lin=np.asarray(cfg.weight_lin_mom),
        w_rpy=np.asarray(cfg.weight_rpy),
        w_rpy_err=np.asarray(cfg.weight_rpy_error),
        w_ang=np.asarray(cfg.weight_ang_mom),
        w_dq=np.asarray(cfg.weight_delta_joint),
        w_throttle=cfg.weight_throttle,
        w_throttle0=cfg.weight_initial_throttle,
        w_jreg=cfg.weight_regularization_joint_pos,
        throttle_min=cfg.throttle_min, throttle_max=cfg.throttle_max,
        joint_limits=cfg.use_joint_position_constraint,
        joint_pos_min=np.deg2rad(cfg.joint_pos_min_deg),
        joint_pos_max=np.deg2rad(cfg.joint_pos_max_deg),
    )
    omp = oracle.OracleMPC(
        ocfg, sds[0], np.asarray(sel), channels, alpha, initial_throttle,
        lambda_option=cfg.joints_lambda_option,
        use_jet_dynamic=cfg.use_jet_dynamic,
        use_estimated_thrust=cfg.use_estimated_thrust)

    lib_out, orc_out = [], []
    for t in range(N_TICKS):
        snap = _to_snapshot(sds[t + 1])
        est = jnp.asarray(est_tds[t], jnp.float32)
        carry, out = mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                      carry, snap, est)
        assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE), \
            f"tick {t}: library status {int(out.status)}"
        lib_out.append({k: np.asarray(getattr(out, k), np.float64)
                        for k in ("joints_pos_ref", "throttle", "thrust_des",
                                  "thrust_dot_des", "final_state")})
        orc_out.append(omp.tick(sds[t + 1], est_tds[t]))
    return cfg, lib_out, orc_out


def _series(outs, key):
    return np.stack([o[key] for o in outs])


def test_joint_command_sequence(sequences):
    _, lib, orc = sequences
    np.testing.assert_allclose(_series(lib, "joints_pos_ref"),
                               _series(orc, "joints_pos_ref"),
                               atol=2e-3)


def test_throttle_command_sequence(sequences):
    _, lib, orc = sequences
    lib_t, orc_t = _series(lib, "throttle"), _series(orc, "throttle")
    np.testing.assert_allclose(lib_t, orc_t, atol=0.15)
    # multi-rate semantics must agree: both sides update throttle at the
    # same ticks only
    lib_changes = np.any(np.abs(np.diff(lib_t, axis=0)) > 1e-4, axis=1)
    orc_changes = np.any(np.abs(np.diff(orc_t, axis=0)) > 1e-4, axis=1)
    np.testing.assert_array_equal(lib_changes, orc_changes)


def test_thrust_command_sequence(sequences):
    _, lib, orc = sequences
    np.testing.assert_allclose(_series(lib, "thrust_des"),
                               _series(orc, "thrust_des"), atol=0.5)
    np.testing.assert_allclose(_series(lib, "thrust_dot_des"),
                               _series(orc, "thrust_dot_des"), atol=2.0)


def test_final_state_sequence(sequences):
    _, lib, orc = sequences
    lib_f, orc_f = _series(lib, "final_state"), _series(orc, "final_state")
    scale = np.maximum(1.0, np.abs(orc_f).max(axis=0))
    assert np.max(np.abs(lib_f - orc_f) / scale) < 5e-2


# ---------------------------------------------------------------------------
# recorded-flight streams: the same dual-controller replay, but on snapshot
# streams captured from an actual mission flight (tools/record_flight_
# snapshots.py) — real thrust magnitudes (47–154 N), the alphaGravity ramp
# mid-takeoff / saturated at 1.0 airborne, real Jacobian conditioning, 120
# ticks spanning 6 throttle-update boundaries. Catches conditioning-
# sensitive errors the synthetic random-Jacobian stream cannot.
# ---------------------------------------------------------------------------

N_REC = 120


@pytest.fixture(scope="module", params=["ramp", "airborne"])
def recorded_sequences(request):
    import dataclasses
    from pathlib import Path

    name = {"ramp": "flight_snapshots.npz",
            "airborne": "flight_snapshots_air.npz"}[request.param]
    npz = np.load(Path(__file__).parent / "golden" / name)

    # the flight configuration (runtime/flight.build_flight_loop)
    cfg = dataclasses.replace(MPCConfig(),
                              weight_regularization_joint_pos=200.0)
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    settings = admm.ADMMSettings(max_iter=400, polish=True,
                                 pallas_mode="off")

    snap_fields = {f: npz[f"snap_{f}"] for f in RobotSnapshot._fields}
    to_snap = lambda t: RobotSnapshot(
        **{f: jnp.asarray(snap_fields[f][t], jnp.float32)
           for f in RobotSnapshot._fields})
    to_dict = lambda t: {k: np.asarray(snap_fields[k][t], np.float64)
                         for k in ("w_R_b", "base_ang_vel_world", "com_pos",
                                   "total_mass", "momentum_body",
                                   "inertia_locked", "jet_axes_world",
                                   "jet_arms_world", "jet_thrusts",
                                   "rel_jac_lin", "rel_jac_ang",
                                   "jac_jets_lin_joints", "jac_com_joints",
                                   "joint_pos")}
    est_tds = [np.asarray(npz["est_td"][t], np.float64)
               for t in range(N_REC)]
    channels = {k: np.asarray(npz[f"ch_{k}"], np.float64) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    alpha = np.asarray(npz["alpha"], np.float64)
    initial_throttle = np.asarray(npz["initial_throttle"], np.float64)

    problem, carry = mpc_mod.configure(
        cfg, sched, sel, to_snap(0), channels, alpha, settings,
        initial_throttle=jnp.asarray(initial_throttle, jnp.float32))
    ocfg = dict(
        n_iter=cfg.n_iter, n_iter_small=cfg.n_iter_small,
        control_horizon=cfg.control_horizon,
        dt_small=cfg.period_mpc_small_steps,
        dt_large=cfg.period_mpc_large_steps,
        w_com=np.asarray(cfg.weight_com_pos),
        w_com_err=np.asarray(cfg.weight_com_pos_error),
        w_lin=np.asarray(cfg.weight_lin_mom),
        w_rpy=np.asarray(cfg.weight_rpy),
        w_rpy_err=np.asarray(cfg.weight_rpy_error),
        w_ang=np.asarray(cfg.weight_ang_mom),
        w_dq=np.asarray(cfg.weight_delta_joint),
        w_throttle=cfg.weight_throttle,
        w_throttle0=cfg.weight_initial_throttle,
        w_jreg=cfg.weight_regularization_joint_pos,
        throttle_min=cfg.throttle_min, throttle_max=cfg.throttle_max,
        joint_limits=cfg.use_joint_position_constraint,
        joint_pos_min=np.deg2rad(cfg.joint_pos_min_deg),
        joint_pos_max=np.deg2rad(cfg.joint_pos_max_deg),
    )
    omp = oracle.OracleMPC(
        ocfg, to_dict(0), np.asarray(sel), channels, alpha,
        initial_throttle, lambda_option=cfg.joints_lambda_option,
        use_jet_dynamic=cfg.use_jet_dynamic,
        use_estimated_thrust=cfg.use_estimated_thrust)

    lib_out, orc_out = [], []
    for t in range(N_REC):
        est = jnp.asarray(est_tds[t], jnp.float32)
        carry, out = mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                      carry, to_snap(t + 1), est)
        assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE), \
            f"recorded tick {t}: library status {int(out.status)}"
        lib_out.append({k: np.asarray(getattr(out, k), np.float64)
                        for k in ("joints_pos_ref", "throttle", "thrust_des",
                                  "thrust_dot_des")})
        orc_out.append(omp.tick(to_dict(t + 1), est_tds[t]))
    return lib_out, orc_out


def test_recorded_flight_joint_commands(recorded_sequences):
    lib, orc = recorded_sequences
    np.testing.assert_allclose(_series(lib, "joints_pos_ref"),
                               _series(orc, "joints_pos_ref"), atol=2e-3)


def test_recorded_flight_throttle_commands(recorded_sequences):
    lib, orc = recorded_sequences
    lib_t, orc_t = _series(lib, "throttle"), _series(orc, "throttle")
    np.testing.assert_allclose(lib_t, orc_t, atol=0.15)
    # multi-rate boundary detection: real 10 Hz updates move throttle by
    # O(0.1-1); 1e-3 rejects solver noise around an active throttle bound
    # (the calibrated-model airborne stream runs near the 100% pin, where
    # sub-1e-4 chatter on the held knots is ADMM tolerance, not an update)
    lib_changes = np.any(np.abs(np.diff(lib_t, axis=0)) > 1e-3, axis=1)
    orc_changes = np.any(np.abs(np.diff(orc_t, axis=0)) > 1e-3, axis=1)
    np.testing.assert_array_equal(lib_changes, orc_changes)
    # the stream must actually span multiple multi-rate boundaries
    assert lib_changes.sum() >= 5


def test_recorded_flight_thrust_commands(recorded_sequences):
    lib, orc = recorded_sequences
    np.testing.assert_allclose(_series(lib, "thrust_des"),
                               _series(orc, "thrust_des"), atol=0.5)
    np.testing.assert_allclose(_series(lib, "thrust_dot_des"),
                               _series(orc, "thrust_dot_des"), atol=2.0)


def test_joint_limits_respected(sequences):
    """With the config-gated joint-position constraint on, the integrated
    command must stay inside the (deliberately tight) deg limits once the
    controller has pulled the initial out-of-range posture back in."""
    cfg, lib, _ = sequences
    if not cfg.use_joint_position_constraint:
        pytest.skip("joint-limits config only")
    sel = np.asarray(joint_selector(RobotConfig(), cfg))
    jp = _series(lib, "joints_pos_ref")[:, sel]
    qmin = np.deg2rad(cfg.joint_pos_min_deg)
    qmax = np.deg2rad(cfg.joint_pos_max_deg)
    late = jp[10:]
    assert np.all(late >= qmin[None, :] - 1e-3)
    assert np.all(late <= qmax[None, :] + 1e-3)


def test_bench_solver_config_fidelity_on_recorded_stream():
    """The HEADLINE bench configuration (max_iter=40, rho mark at 15,
    batch-guard + ns_skip_tol + term_check_every early exit — the exact
    solver bench.py measures) must keep command fidelity against a
    400-iteration deep solve over the recorded real-flight stream: the
    throughput number is only meaningful if the benched solver is
    production-grade."""
    import jax
    import jax.numpy as jnp

    from ironcub_mpc_tpu.runtime.replay import load_flight_replay

    replay = load_flight_replay()
    cfg, sched, sel = replay.cfg, replay.sched, replay.sel
    to_snap = replay.snap_of
    n = 45  # spans two 20-tick multi-rate boundaries

    bench = admm.ADMMSettings(max_iter=40, polish=True,
                              rho_update_iters=(15,), pallas_mode="off",
                              kinv_guard=True,
                              guard_axis=admm.BATCH_GUARD_AXIS,
                              ns_skip_tol=0.02, term_check_every=5)
    deep = admm.ADMMSettings(max_iter=400, polish=True, pallas_mode="off")

    def run(settings, batched):
        problem, carry = replay.configure(settings)
        if batched:
            carry = jax.tree.map(lambda a: jnp.stack([a, a]), carry)
            tick = jax.jit(jax.vmap(
                lambda c, s, e: mpc_mod.mpc_tick(cfg, sched, sel, settings,
                                                 problem, c, s, e),
                in_axes=(0, None, None), axis_name=admm.BATCH_GUARD_AXIS))
        else:
            tick = jax.jit(lambda c, s, e: mpc_mod.mpc_tick(
                cfg, sched, sel, settings, problem, c, s, e))
        outs = []
        for t in range(n):
            est = replay.est_td[t]
            carry, out = tick(carry, to_snap(t + 1), est)
            outs.append(out)
        return outs

    bench_outs = run(bench, batched=True)
    deep_outs = run(deep, batched=False)
    for t, (b, d) in enumerate(zip(bench_outs, deep_outs)):
        st = np.atleast_1d(np.asarray(b.status))
        assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE) for s in st), \
            f"tick {t}: bench-config status {st}"
        np.testing.assert_allclose(
            np.asarray(b.throttle[0]), np.asarray(d.throttle), atol=0.2,
            err_msg=f"throttle diverges at tick {t}")
        np.testing.assert_allclose(
            np.asarray(b.joints_pos_ref[0]), np.asarray(d.joints_pos_ref),
            atol=2e-3, err_msg=f"joints diverge at tick {t}")
        np.testing.assert_allclose(
            np.asarray(b.thrust_des[0]), np.asarray(d.thrust_des),
            atol=0.5, err_msg=f"thrust diverges at tick {t}")
