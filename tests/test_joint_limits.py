"""Joint-position constraint: the config-gated equivalent of the reference's
compiled-but-unregistered JointPositionConstraint (constraintsVSMPC.cpp:388-468,
declared rows nJoints*nIter, filled controlHorizon knots). Checks full/condensed
equivalence, bound respect, and constraint-row sizing."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import condensed, mpc as mpc_mod

from helpers import make_hover_snapshot, make_test_trajectories

SETTINGS = admm.ADMMSettings(max_iter=200)

# tight limits so the constraint is active from the first tick
TIGHT = dict(use_joint_position_constraint=True,
             joint_pos_min_deg=(-2.0,) * 8,
             joint_pos_max_deg=(2.0,) * 8)


def _run(cfg, n_ticks=8, rng_seed=11):
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
    return outs, sel


def test_row_sizing():
    cfg = dataclasses.replace(MPCConfig(), **TIGHT)
    base = MPCConfig()
    assert cfg.n_joint_position_constraints == cfg.n_ctrl_joints * cfg.n_iter
    assert base.n_joint_position_constraints == 0
    assert (cfg.n_constraints
            == base.n_constraints + cfg.n_ctrl_joints * cfg.n_iter)
    assert condensed.n_box(cfg) == (
        cfg.n_jets * cfg.n_throttle_knots
        + cfg.n_ctrl_joints * cfg.control_horizon)


@pytest.fixture(scope="module")
def limited_runs():
    full = _run(dataclasses.replace(MPCConfig(), qp_solver="full", **TIGHT))
    cond = _run(dataclasses.replace(MPCConfig(), qp_solver="condensed",
                                    **TIGHT))
    return full, cond


def test_solves_and_equivalence(limited_runs):
    (full, sel), (cond, _) = limited_runs
    for o in full + cond:
        assert int(o.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
    for k, (a, b) in enumerate(zip(full, cond)):
        np.testing.assert_allclose(
            np.asarray(a.joints_pos_ref), np.asarray(b.joints_pos_ref),
            atol=2e-3, err_msg=f"joint refs diverge at tick {k}")
        np.testing.assert_allclose(
            np.asarray(a.throttle), np.asarray(b.throttle), atol=0.5)


def test_limits_respected(limited_runs):
    """Integrated controlled-joint positions stay inside the deg box (the
    per-knot delta bound is measured from the running integrated position,
    so each commanded step cannot exit the box)."""
    (_, sel), (cond, _) = limited_runs
    q_min = np.deg2rad(-2.0) - 1e-4
    q_max = np.deg2rad(2.0) + 1e-4
    selA = np.asarray(sel)
    for o in cond:
        q = np.asarray(o.joints_pos_ref)[selA]
        assert np.all(q >= q_min) and np.all(q <= q_max), q


def test_unconstrained_unchanged():
    """With the flag off (default), behaviour is identical to before —
    the constraint must not perturb the stock problem."""
    base, _ = _run(MPCConfig(), n_ticks=4)
    wide, _ = _run(dataclasses.replace(
        MPCConfig(), use_joint_position_constraint=True,
        joint_pos_min_deg=(-360.0,) * 8, joint_pos_max_deg=(360.0,) * 8),
        n_ticks=4)
    for a, b in zip(base, wide):
        np.testing.assert_allclose(np.asarray(a.joints_pos_ref),
                                   np.asarray(b.joints_pos_ref), atol=5e-4)
        np.testing.assert_allclose(np.asarray(a.throttle),
                                   np.asarray(b.throttle), atol=0.2)
