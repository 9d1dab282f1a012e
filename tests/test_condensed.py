"""Condensed-vs-full-space equivalence: state elimination is exact, so the
two solvers must produce the same command sequence over a multi-rate run."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as mpc_mod

from helpers import make_hover_snapshot, make_test_trajectories

SETTINGS = admm.ADMMSettings(max_iter=200)


def _run(cfg, n_ticks=25, rng_seed=11):
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    snap = make_hover_snapshot(rng_seed=rng_seed)
    channels, alpha = make_test_trajectories()
    problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels, alpha,
                                       SETTINGS)
    outs = []
    est = jnp.zeros(4)
    for _ in range(n_ticks):
        carry, out = mpc_mod.mpc_tick(cfg, sched, sel, SETTINGS, problem,
                                      carry, snap, est)
        outs.append(out)
    return outs


@pytest.fixture(scope="module")
def both_runs():
    full = _run(dataclasses.replace(MPCConfig(), qp_solver="full"))
    cond = _run(dataclasses.replace(MPCConfig(), qp_solver="condensed"))
    return full, cond


def test_all_ticks_solve(both_runs):
    full, cond = both_runs
    for o in full + cond:
        assert int(o.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)


def test_command_sequences_match(both_runs):
    """Thrust + joint command fidelity between the two formulations — the
    BASELINE command-fidelity criterion applied internally."""
    full, cond = both_runs
    for k, (a, b) in enumerate(zip(full, cond)):
        np.testing.assert_allclose(
            np.asarray(a.joints_pos_ref), np.asarray(b.joints_pos_ref),
            atol=2e-3, err_msg=f"joint refs diverge at tick {k}")
        np.testing.assert_allclose(
            np.asarray(a.thrust_des), np.asarray(b.thrust_des),
            atol=0.5, err_msg=f"thrust diverges at tick {k}")
        np.testing.assert_allclose(
            np.asarray(a.throttle), np.asarray(b.throttle),
            atol=0.5, err_msg=f"throttle diverges at tick {k}")


def test_final_state_matches(both_runs):
    full, cond = both_runs
    a = np.asarray(full[-1].final_state)
    b = np.asarray(cond[-1].final_state)
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)


def test_condensed_multi_rate_hold():
    cond = _run(dataclasses.replace(MPCConfig(), qp_solver="condensed"),
                n_ticks=22)
    throttles = np.stack([np.asarray(o.throttle) for o in cond])
    first = throttles[0]
    for k in range(19):
        np.testing.assert_allclose(throttles[k], first, atol=0.5)
    assert np.any(np.abs(throttles[19] - first) > 0.5)
    np.testing.assert_allclose(throttles[20], throttles[19], atol=0.5)


def test_assoc_condensing_matches_sequential():
    """Horizon-parallel (associative-scan) condensing reproduces the
    sequential affine-map chain: identical F, f, H_c, q_c to f32 tolerance."""
    from ironcub_mpc_tpu.ops import jet_model as jm
    from ironcub_mpc_tpu.qp import condensed

    cfg_a = dataclasses.replace(MPCConfig(), condense_mode="assoc")
    cfg_s = dataclasses.replace(MPCConfig(), condense_mode="sequential")
    sched = build_schedule(cfg_a)
    sel = joint_selector(RobotConfig(), cfg_a)
    snap = make_hover_snapshot(rng_seed=5)
    channels, alpha = make_test_trajectories()
    problem, carry = mpc_mod.configure(cfg_a, sched, sel, snap, channels,
                                       alpha, SETTINGS)
    est = jnp.zeros(4)
    carry2, prep = mpc_mod._tick_prep(cfg_a, sel, problem, carry, snap, est)
    selA = jnp.asarray(sel)
    q_diag = jnp.diagonal(problem.Q)
    jreg = cfg_a.weight_regularization_joint_pos * (
        carry2.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl)
    tgrad = -cfg_a.weight_initial_throttle * jm.throttle_to_v(
        carry2.throttle_cmd)

    def build(cfg):
        return condensed.condense(
            cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag,
            problem.H_u, jreg, tgrad, prep.pin, carry2.throttle_cmd)

    qa, qs = build(cfg_a), build(cfg_s)
    np.testing.assert_allclose(qa.F, qs.F, rtol=0, atol=5e-5)
    np.testing.assert_allclose(qa.f, qs.f, rtol=0, atol=5e-5)
    scale_h = float(jnp.max(jnp.abs(qs.H)))
    np.testing.assert_allclose(qa.H, qs.H, rtol=0, atol=2e-5 * scale_h)
    scale_q = float(jnp.max(jnp.abs(qs.q)))
    np.testing.assert_allclose(qa.q, qs.q, rtol=0, atol=2e-5 * scale_q)


def test_structured_condensing_matches_sequential():
    """Block-structure-exploiting condensing (momenta chains + jet 2x2
    chains + integrator prefix sums, condensed._structured_chain) reproduces
    the dense sequential chain: identical F, f, H_c, q_c to f32 tolerance.
    Run at a non-hover state (rng perturbed) so S(omega), the jet partials
    and the lambda couplings are all nonzero."""
    from ironcub_mpc_tpu.ops import jet_model as jm
    from ironcub_mpc_tpu.qp import condensed

    cfg_t = dataclasses.replace(MPCConfig(), condense_mode="structured")
    cfg_p = dataclasses.replace(MPCConfig(), condense_mode="paired")
    cfg_s = dataclasses.replace(MPCConfig(), condense_mode="sequential")
    sched = build_schedule(cfg_t)
    sel = joint_selector(RobotConfig(), cfg_t)
    snap = make_hover_snapshot(rng_seed=11)
    channels, alpha = make_test_trajectories()
    problem, carry = mpc_mod.configure(cfg_t, sched, sel, snap, channels,
                                       alpha, SETTINGS)
    est = jnp.full(4, 0.3)
    carry2, prep = mpc_mod._tick_prep(cfg_t, sel, problem, carry, snap, est)
    selA = jnp.asarray(sel)
    q_diag = jnp.diagonal(problem.Q)
    jreg = cfg_t.weight_regularization_joint_pos * (
        carry2.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl)
    tgrad = -cfg_t.weight_initial_throttle * jm.throttle_to_v(
        carry2.throttle_cmd)

    def build(cfg):
        return condensed.condense(
            cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag,
            problem.H_u, jreg, tgrad, prep.pin, carry2.throttle_cmd)

    qt, qs = build(cfg_t), build(cfg_s)
    qp_ = build(cfg_p)
    np.testing.assert_allclose(qp_.F, qs.F, rtol=0, atol=5e-5)
    np.testing.assert_allclose(qp_.f, qs.f, rtol=0, atol=5e-5)
    np.testing.assert_allclose(
        qp_.H, qs.H, rtol=0, atol=2e-5 * float(jnp.max(jnp.abs(qs.H))))
    np.testing.assert_allclose(qt.F, qs.F, rtol=0, atol=5e-5)
    np.testing.assert_allclose(qt.f, qs.f, rtol=0, atol=5e-5)
    scale_h = float(jnp.max(jnp.abs(qs.H)))
    np.testing.assert_allclose(qt.H, qs.H, rtol=0, atol=2e-5 * scale_h)
    scale_q = float(jnp.max(jnp.abs(qs.q)))
    np.testing.assert_allclose(qt.q, qs.q, rtol=0, atol=2e-5 * scale_q)
    np.testing.assert_allclose(qt.lb, qs.lb, rtol=0, atol=0)
    np.testing.assert_allclose(qt.ub, qs.ub, rtol=0, atol=0)


def test_structured_condensing_full_mpc_tick():
    """A whole mpc_tick under condense_mode='structured' produces the same
    commands as under 'sequential' (the mode only changes how F/f are
    built, so commands must agree to solver-noise tolerance)."""
    cfgs = {m: dataclasses.replace(MPCConfig(), condense_mode=m)
            for m in ("structured", "sequential")}
    sched = build_schedule(cfgs["structured"])
    sel = joint_selector(RobotConfig(), cfgs["structured"])
    snap = make_hover_snapshot(rng_seed=3)
    channels, alpha = make_test_trajectories()
    outs = {}
    for m, cfg in cfgs.items():
        problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels,
                                           alpha, SETTINGS)
        for _ in range(3):
            carry, out = mpc_mod.mpc_tick(cfg, sched, sel, SETTINGS,
                                          problem, carry, snap,
                                          jnp.zeros(4))
        outs[m] = out
    a, b = outs["structured"], outs["sequential"]
    assert int(a.status) in (1, 2) and int(b.status) in (1, 2)
    np.testing.assert_allclose(a.joints_pos_ref, b.joints_pos_ref,
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(a.throttle, b.throttle, rtol=0, atol=1e-2)
    np.testing.assert_allclose(a.thrust_des, b.thrust_des, rtol=0, atol=1e-2)


def test_solver_state_recovery_after_corruption():
    """One bad tick must not poison the 200 Hz loop: non-finite carried
    solver state (warm start, K⁻¹, ρ) is sanitized and the carried-inverse
    refresh falls back to a fresh factorisation when Newton–Schulz cannot
    contract (qp/condensed.py solve; the reference gets this resilience for
    free by re-running OSQP setup, IMPCProblem.cpp:221-236)."""
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    snap = make_hover_snapshot()
    channels, alpha = make_test_trajectories()
    settings = admm.ADMMSettings(max_iter=200, kinv_carry=True,
                                 pallas_mode="off")
    problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels,
                                       alpha, settings)
    est = jnp.zeros(4)
    carry, ref_out = mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                      carry, snap, est)
    # corrupt every piece of carried solver state the way a diverged tick
    # would: NaN warm start/duals, NaN K⁻¹, NaN adaptive-ρ state
    nanlike = lambda a: jnp.full_like(a, jnp.nan)
    bad = carry._replace(warm_x=nanlike(carry.warm_x),
                         warm_y=nanlike(carry.warm_y),
                         kinv=nanlike(carry.kinv),
                         rho_vec=nanlike(carry.rho_vec),
                         rho_scalar=nanlike(carry.rho_scalar))
    carry2, out = mpc_mod.mpc_tick(cfg, sched, sel, settings, problem, bad,
                                   snap, est)
    assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
    assert np.all(np.isfinite(np.asarray(out.joints_pos_ref)))
    assert np.all(np.isfinite(np.asarray(carry2.kinv)))
    # and the recovered solution matches the uncorrupted tick's commands
    np.testing.assert_allclose(np.asarray(out.throttle),
                               np.asarray(ref_out.throttle), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.thrust_des),
                               np.asarray(ref_out.thrust_des), atol=1e-2)


@pytest.mark.parametrize("ns,pns", [(1, 0), (1, 1), (2, 2)])
def test_ns_depth_knobs_all_solve(ns, pns):
    """Supported Newton–Schulz depths (ns_steps ≥ 1) must keep the
    carried-inverse path convergent across warm ticks and agree with the
    conservative depths on the commands. ns_steps=0 is NOT supported:
    without an NS pass the raw-f32 Woodbury error stalls the dual
    residual when adaptive ρ walks toward rho_min (verified failing —
    see the ADMMSettings.ns_steps docstring)."""
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    snap = make_hover_snapshot()
    channels, alpha = make_test_trajectories()
    settings = dataclasses.replace(SETTINGS, ns_steps=ns,
                                   polish_ns_steps=pns, pallas_mode="off")
    problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels,
                                       alpha, settings)
    est = jnp.zeros(4)
    outs = []
    for _ in range(6):
        carry, out = mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                      carry, snap, est)
        assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
        outs.append(np.asarray(out.throttle))
    if (ns, pns) != (2, 2):
        settings_ref = dataclasses.replace(SETTINGS, ns_steps=2,
                                           polish_ns_steps=2,
                                           pallas_mode="off")
        problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels,
                                           alpha, settings_ref)
        for k in range(6):
            carry, out = mpc_mod.mpc_tick(cfg, sched, sel, settings_ref,
                                          problem, carry, snap, est)
            np.testing.assert_allclose(outs[k], np.asarray(out.throttle),
                                       atol=5e-3)


def test_batch_guard_recovers_corrupted_lane():
    """Batch-level kinv_guard (ADMMSettings.guard_axis): under
    ``vmap(axis_name=BATCH_GUARD_AXIS)`` the guard's any-lane-bad predicate
    is psum-reduced to an unbatched scalar, the recovery cond stays a real
    branch, and a lane with a corrupted carried K⁻¹ is refactorised while
    healthy lanes keep their refreshed inverse. Commands must match the
    lane-mode guarded solve on every lane."""
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    channels, alpha = make_test_trajectories()
    base = admm.ADMMSettings(max_iter=200, kinv_carry=True, pallas_mode="off")
    batched = dataclasses.replace(base, guard_axis=admm.BATCH_GUARD_AXIS)
    n = 4
    snaps = [make_hover_snapshot(rng_seed=100 + i) for i in range(n)]
    snap_b = jax.tree.map(lambda *a: jnp.stack(a), *snaps)
    problem, carry0 = mpc_mod.configure(cfg, sched, sel, snaps[0], channels,
                                        alpha, base)
    carry_b = jax.tree.map(lambda a: jnp.stack([a] * n), carry0)
    est_b = jnp.zeros((n, 4))

    def tick_with(settings):
        def tick(carry, snap, est):
            return mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                    carry, snap, est)
        return tick

    step_b = jax.jit(jax.vmap(tick_with(batched),
                              axis_name=admm.BATCH_GUARD_AXIS))
    carry_b, _ = step_b(carry_b, snap_b, est_b)  # seed the carried state
    # corrupt lane 2's carried inverse the way a diverged tick would
    kinv_bad = carry_b.kinv.at[2].set(jnp.nan)
    carry_bad = carry_b._replace(kinv=kinv_bad)
    carry_out, out_b = step_b(carry_bad, snap_b, est_b)

    st = np.asarray(out_b.status)
    assert np.all((st == admm.SOLVED) | (st == admm.SOLVED_INACCURATE)), st
    assert np.all(np.isfinite(np.asarray(carry_out.kinv)))
    # forensics: guard_fired reports exactly the corrupted lane
    gf = np.asarray(out_b.guard_fired)
    assert gf[2], gf
    assert not gf[0] and not gf[1] and not gf[3], gf

    # per-lane reference: the original lane-mode guard, unbatched
    for i in range(n):
        carry_i = jax.tree.map(lambda a: a[i], carry_bad)
        snap_i = jax.tree.map(lambda a: a[i], snap_b)
        _, out_i = jax.jit(tick_with(base))(carry_i, snap_i, est_b[i])
        np.testing.assert_allclose(np.asarray(out_b.throttle[i]),
                                   np.asarray(out_i.throttle), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_b.thrust_des[i]),
                                   np.asarray(out_i.thrust_des), atol=1e-2)


def test_full_space_warm_start_recovery():
    """Same resilience on the full-space OSQP-equivalent path: NaN warm
    start/duals from a failed tick are sanitized (ops/admm.solve_prepared)."""
    cfg = dataclasses.replace(MPCConfig(), qp_solver="full")
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    snap = make_hover_snapshot()
    channels, alpha = make_test_trajectories()
    problem, carry = mpc_mod.configure(cfg, sched, sel, snap, channels,
                                       alpha, SETTINGS)
    est = jnp.zeros(4)
    carry, ref_out = mpc_mod.mpc_tick(cfg, sched, sel, SETTINGS, problem,
                                      carry, snap, est)
    bad = carry._replace(warm_x=jnp.full_like(carry.warm_x, jnp.nan),
                         warm_y=jnp.full_like(carry.warm_y, jnp.nan))
    _, out = mpc_mod.mpc_tick(cfg, sched, sel, SETTINGS, problem, bad,
                              snap, est)
    assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
    np.testing.assert_allclose(np.asarray(out.throttle),
                               np.asarray(ref_out.throttle), atol=1e-3)


@pytest.mark.parametrize("guarded", [False, True])
def test_ns_skip_tol_matches_refresh_every_tick(guarded):
    """Probe-gated refresh skip (ADMMSettings.ns_skip_tol): with a
    per-tick relinearisation drift (snapshot jitter), skipping the
    carried-inverse refresh whenever the probe residual is inside the
    tolerance must keep every tick solved and the command stream within
    solver tolerance of the refresh-every-tick baseline — including
    across the 20-tick throttle-pin toggle (a ρ jump the probe must
    catch)."""
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    channels, alpha = make_test_trajectories()
    axis = admm.BATCH_GUARD_AXIS if guarded else None
    base = dataclasses.replace(SETTINGS, max_iter=120, pallas_mode="off",
                               guard_axis=axis)
    skip = dataclasses.replace(base, ns_skip_tol=0.02)
    est = jnp.zeros(4)
    snaps = [make_hover_snapshot(rng_seed=100 + k) for k in range(25)]

    def run(settings):
        problem, carry = mpc_mod.configure(cfg, sched, sel, snaps[0],
                                           channels, alpha, settings)
        if guarded:
            problem_b = jax.tree.map(lambda a: a, problem)
            carry = jax.tree.map(lambda a: jnp.stack([a, a]), carry)
            tick = jax.vmap(
                lambda c, s, e: mpc_mod.mpc_tick(cfg, sched, sel, settings,
                                                 problem_b, c, s, e),
                in_axes=(0, None, None), axis_name=admm.BATCH_GUARD_AXIS)
        else:
            def tick(c, s, e):
                return mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                        c, s, e)
        outs = []
        for snap in snaps:
            carry, out = tick(carry, snap, est)
            outs.append(out)
        return outs

    base_outs = run(base)
    skip_outs = run(skip)
    for ob, os_ in zip(base_outs, skip_outs):
        st_b = np.atleast_1d(np.asarray(ob.status))
        st_s = np.atleast_1d(np.asarray(os_.status))
        assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE) for s in st_b)
        assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE) for s in st_s)
        np.testing.assert_allclose(np.asarray(os_.throttle),
                                   np.asarray(ob.throttle), atol=5e-3)
        np.testing.assert_allclose(np.asarray(os_.joints_pos_ref),
                                   np.asarray(ob.joints_pos_ref), atol=5e-4)


def test_ns_skip_tol_validation():
    with pytest.raises(ValueError):
        admm.ADMMSettings(ns_skip_tol=0.1)
    with pytest.raises(ValueError):
        admm.ADMMSettings(ns_skip_tol=-1e-3)


@pytest.mark.parametrize("guarded", [False, True])
def test_term_check_early_exit_matches_fixed(guarded):
    """Early segment exit (ADMMSettings.term_check_every): chunked
    iteration with the all-lanes-converged skip must keep every tick
    solved and the command stream within solver tolerance of the
    fixed-iteration baseline, unbatched (plain cond) and under vmap with
    the psum-reduced predicate (guard_axis)."""
    cfg = MPCConfig()
    sched = build_schedule(cfg)
    sel = joint_selector(RobotConfig(), cfg)
    channels, alpha = make_test_trajectories()
    axis = admm.BATCH_GUARD_AXIS if guarded else None
    base = dataclasses.replace(SETTINGS, max_iter=120, pallas_mode="off",
                               guard_axis=axis)
    early = dataclasses.replace(base, term_check_every=8)
    est = jnp.zeros(4)
    snaps = [make_hover_snapshot(rng_seed=300 + k) for k in range(25)]

    def run(settings):
        problem, carry = mpc_mod.configure(cfg, sched, sel, snaps[0],
                                           channels, alpha, settings)
        if guarded:
            carry = jax.tree.map(lambda a: jnp.stack([a, a]), carry)
            tick = jax.vmap(
                lambda c, s, e: mpc_mod.mpc_tick(cfg, sched, sel, settings,
                                                 problem, c, s, e),
                in_axes=(0, None, None), axis_name=admm.BATCH_GUARD_AXIS)
        else:
            def tick(c, s, e):
                return mpc_mod.mpc_tick(cfg, sched, sel, settings, problem,
                                        c, s, e)
        outs = []
        for snap in snaps:
            carry, out = tick(carry, snap, est)
            outs.append(out)
        return outs

    base_outs = run(base)
    early_outs = run(early)
    for k, (ob, oe) in enumerate(zip(base_outs, early_outs)):
        st_b = np.atleast_1d(np.asarray(ob.status))
        st_e = np.atleast_1d(np.asarray(oe.status))
        assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE) for s in st_b)
        assert all(s in (admm.SOLVED, admm.SOLVED_INACCURATE)
                   for s in st_e), f"tick {k}: early-exit status {st_e}"
        # unlike ns_skip (same iterate, refreshed differently), early exit
        # STOPS at the OSQP termination criterion — the iterate is a
        # different, equally-valid solve, so compare at command-fidelity
        # tolerance (the full-vs-condensed criterion above), not bitwise
        np.testing.assert_allclose(np.asarray(oe.throttle),
                                   np.asarray(ob.throttle), atol=0.2)
        np.testing.assert_allclose(np.asarray(oe.joints_pos_ref),
                                   np.asarray(ob.joints_pos_ref), atol=2e-3)


def test_term_check_every_validation():
    with pytest.raises(ValueError):
        admm.ADMMSettings(term_check_every=-1)
