"""Tests for the variable-sampling horizon schedule.

Oracle: the verified warp-step sequence of the shipped config
([5, 8.1, 11.19, 14.29, 17.38, 20.48, 23.57] ms small steps summing to
0.1 s, then 100 ms large steps) and the input-blocking layout of
``constraintsVSMPC.cpp:76-131``.
"""

import numpy as np

from ironcub_mpc_tpu.core.config import MPCConfig
from ironcub_mpc_tpu.horizon import build_schedule


def test_warp_step_sequence_matches_reference():
    sched = build_schedule(MPCConfig())
    dts = np.array(sched.dts)
    expected_small = np.array(
        [5.0, 8.095238, 11.190476, 14.285714, 17.380952, 20.476190, 23.571429]) * 1e-3
    np.testing.assert_allclose(dts[:7], expected_small, rtol=1e-5)
    np.testing.assert_allclose(dts[7:], 0.1, rtol=1e-12)
    # small steps exactly tile one large step: w(n_s) = 0.1
    np.testing.assert_allclose(dts[:7].sum(), 0.1, rtol=1e-12)
    # monotone growth from the controller period
    assert np.all(np.diff(dts[:7]) > 0)
    np.testing.assert_allclose(sched.total_span, 1.1, rtol=1e-12)


def test_joint_blocking():
    sched = build_schedule(MPCConfig())
    jk = list(sched.joint_knot_of_step)
    # one knot per step up to controlHorizon=12, then hold the last knot
    assert jk[:12] == list(range(12))
    assert jk[12:] == [11] * 5


def test_throttle_blocking():
    sched = build_schedule(MPCConfig())
    tk = list(sched.throttle_knot_of_step)
    # all 7 small steps share knot 0; then one knot per step; hold after ch
    assert tk[:7] == [0] * 7
    assert tk[7:12] == [1, 2, 3, 4, 5]
    assert tk[12:] == [5] * 5
    # 6 throttle knots in total
    assert max(tk) + 1 == MPCConfig().n_throttle_knots == 6


def test_problem_sizes_match_reference():
    cfg = MPCConfig()
    # 588 vars, 512 constraints (variableSamplingMPC.cpp:44-45 + stacking)
    assert cfg.n_var == 588
    assert cfg.n_constraints == 512
    assert cfg.n_dynamics_constraints == 442
    assert cfg.n_throttle_constraints == 44
    assert cfg.joints_offset == 468
    assert cfg.throttle_offset == 564
    assert cfg.ratio_small_large == 20
    assert cfg.n_reference_knots == 11
