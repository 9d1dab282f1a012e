"""Integration tests of the multi-rate MPC pipeline on a synthetic hover.

Structural oracles come from the reference sizing
(588 vars / 512 constraints, 20-tick multi-rate split); behavioural oracles
are physical: at hover with full gravity compensation the QP keeps thrust
near m·g/4 per jet and the throttle only changes at the large-step rate.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, joint_selector
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as mpc_mod

from helpers import HOVER_THRUST, MASS, make_hover_snapshot, make_test_trajectories

CFG = MPCConfig()
SCHED = build_schedule(CFG)
SEL = joint_selector(RobotConfig(), CFG)
SETTINGS = admm.ADMMSettings(max_iter=150, polish=True)


@pytest.fixture(scope="module")
def configured():
    snap = make_hover_snapshot()
    channels, alpha = make_test_trajectories()
    problem, carry = mpc_mod.configure(
        CFG, SCHED, SEL, snap, channels, alpha, SETTINGS)
    return snap, problem, carry


def test_configure_shapes_and_counters(configured):
    snap, problem, carry = configured
    assert problem.H.shape == (588, 588)
    # default solver is condensed: warm start lives in input space
    assert carry.warm_x.shape == (120,)
    assert carry.warm_y.shape == (24,)
    # configure leaves both modulo counters at 0 (first compute consumed the
    # saturated initial value)
    assert int(carry.ref_counter) == 0
    assert int(carry.throttle_counter) == 0
    # alphaGravity advanced exactly once at configure
    assert int(carry.alpha_traj_idx) == 1
    # reference window shifted once: cursor at 1
    assert int(carry.pos_traj_idx) == 1


def test_hessian_is_positive_semidefinite(configured):
    _, problem, _ = configured
    evals = np.linalg.eigvalsh(np.asarray(problem.H, np.float64))
    assert evals.min() > -1e-6
    # states knot 0 unweighted -> zero rows exist
    assert evals.min() < 1e-8


def test_single_tick_solves_hover(configured):
    snap, problem, carry = configured
    est_td = jnp.zeros(4)
    carry2, out = mpc_mod.mpc_tick(CFG, SCHED, SEL, SETTINGS, problem, carry,
                                   snap, est_td)
    assert int(out.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)
    # thrust prediction should stay near hover thrust
    np.testing.assert_allclose(np.asarray(out.thrust_des),
                               HOVER_THRUST, rtol=0.2)
    # joint reference stays near initial posture
    assert np.max(np.abs(np.asarray(out.joints_pos_ref))) < 0.2
    # throttle within physical limits
    assert np.all(np.asarray(out.throttle) >= 0.0)
    assert np.all(np.asarray(out.throttle) <= 100.0)


def test_multi_rate_throttle_hold(configured):
    """Throttle command only changes when the 20-tick counter wraps
    (constraintsVSMPC.cpp:351-360)."""
    snap, problem, carry = configured
    est_td = jnp.zeros(4)
    throttles = []
    for _ in range(22):
        carry, out = mpc_mod.mpc_tick(CFG, SCHED, SEL, SETTINGS, problem,
                                      carry, snap, est_td)
        throttles.append(np.asarray(out.throttle))
    throttles = np.stack(throttles)
    # ticks 0..18 pinned to the initial throttle value (first knot equality)
    first = throttles[0]
    for k in range(19):
        np.testing.assert_allclose(throttles[k], first, atol=0.5)
    # tick 19 (counter wrap) is free to move: hover requires thrust, so the
    # optimizer should raise throttle away from 0
    assert np.any(np.abs(throttles[19] - first) > 0.5)
    # and ticks 20, 21 hold the new value again
    np.testing.assert_allclose(throttles[20], throttles[19], atol=0.5)
    np.testing.assert_allclose(throttles[21], throttles[19], atol=0.5)


def test_reference_window_shifts_every_ratio_ticks(configured):
    snap, problem, carry = configured
    est_td = jnp.zeros(4)
    idx0 = int(carry.pos_traj_idx)
    for k in range(20):
        carry, _ = mpc_mod.mpc_tick(CFG, SCHED, SEL, SETTINGS, problem, carry,
                                    snap, est_td)
    # exactly one shift happened in 20 ticks
    assert int(carry.pos_traj_idx) == idx0 + 1


def test_tick_is_vmappable(configured):
    """The whole tick batches over scenarios (the primary TPU scale axis)."""
    snap, problem, carry = configured
    B = 3
    snaps = jax.tree.map(lambda a: jnp.stack([a] * B), snap)
    carries = jax.tree.map(lambda a: jnp.stack([a] * B), carry)
    est = jnp.zeros((B, 4))
    tick = jax.vmap(
        lambda c, s, e: mpc_mod.mpc_tick(CFG, SCHED, SEL, SETTINGS, problem,
                                         c, s, e))
    carries2, outs = tick(carries, snaps, est)
    assert outs.throttle.shape == (B, 4)
    # identical lanes -> identical outputs
    np.testing.assert_allclose(np.asarray(outs.thrust_des[0]),
                               np.asarray(outs.thrust_des[1]), rtol=1e-5)
