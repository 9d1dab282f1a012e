"""Bounded regression on the reference flight (VERDICT r2 item 1).

Flies the first 20 s of the converted reference mission — standing, the
35 s alphaGravity ramp's early portion, and the actual takeoff at ~16.6 s —
through the full closed loop (JAX plant + LSTM/EKF jets + multi-rate MPC,
runtime/flight.py) and asserts explicit tracking/solver bounds, so a
controller or plant regression that degrades flight quality fails CI
instead of only showing up in the committed full-length artifact
(FLIGHT_r03.json, produced by tools/fly_full_trajectory.py from the same
code path; reference driver: src/variable_sampling_mpc.py:106-194).

Measured on this 20 s slice with the calibrated 70 kg Mk3 model loaded
through the URDF path (CPU, f32): solved 4000/4000, CoM RMSE 9.3 mm /
max 30 mm, RPY RMSE 0.56° / max 0.84°, takeoff detected at 16.55 s.
Bounds are ~3x and also cover the earlier 42 kg-model measurements.
"""

import numpy as np
import pytest

from ironcub_mpc_tpu.runtime import flight

SECONDS = 20.0


@pytest.fixture(scope="module")
def flight_slice():
    tel, info = flight.run_flight(SECONDS, use_nn=True)
    loop, _, _ = flight.build_flight_loop()
    stats = flight.flight_stats(tel, loop.cfg.period_mpc,
                                total_mass=loop.kd.model.total_mass)
    return tel, info, stats


@pytest.mark.slow
def test_flight_slice_solves_every_tick(flight_slice):
    _, _, stats = flight_slice
    assert stats["finite"]
    assert stats["n_not_solved"] == 0, stats
    assert stats["ticks"] == int(SECONDS / 0.005)


@pytest.mark.slow
def test_flight_slice_tracking_bounds(flight_slice):
    _, _, stats = flight_slice
    assert stats["com_rmse_m"] < 0.06, stats
    assert stats["com_max_m"] < 0.15, stats
    assert stats["rpy_rmse_deg"] < 2.0, stats
    assert stats["rpy_max_deg"] < 6.0, stats


@pytest.mark.slow
def test_flight_slice_takes_off_on_schedule(flight_slice):
    """Total commanded thrust must cross 0.9·m·g near the end of the
    alphaGravity ramp — the mission's liftoff event (reference ramp:
    data/trajectories/alpha_gravity; ~35 s to full gravity compensation,
    thrust crosses 0.9 m g at ~16.6 s with the stock MPC weights)."""
    _, _, stats = flight_slice
    assert "takeoff_t_s" in stats, "never became airborne in 20 s"
    assert 10.0 < stats["takeoff_t_s"] < 20.0, stats
    assert stats["com_rmse_post_takeoff_m"] < 0.09, stats
