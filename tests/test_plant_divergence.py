"""Cross-engine plant divergence bound (VERDICT r2 item 2).

The production closed loop runs the JAX plant (penalty contacts, implicit-
damping semi-implicit Euler); the reference's plant is MuJoCo at 1 kHz with
LSTM jets + EKF (ironcub_mujoco_simulator.py:122-139). This test runs the
SAME controller from the SAME initial state on both engines — standing plus
the early alphaGravity ramp, NN jets + EKF on — and fails if their closed-
loop trajectories drift past stated bounds, i.e. if the penalty-contact/PD
model stops being a faithful stand-in for MuJoCo physics.

Measured on this scenario (3 s, CPU f32): CoM divergence max 20.6 mm /
mean 16 mm, RPY max 2.8°, base max 30 mm, thrust chains bit-identical,
both engines SOLVED on every tick. Bounds are ~3x those values. Where the
engines deliberately differ is documented in sim/validate.py's docstring.
"""

import pytest

from ironcub_mpc_tpu.sim.validate import compare_plants


@pytest.fixture(scope="module")
def report():
    pytest.importorskip("mujoco")
    return compare_plants(n_ticks=300, settle_s=1.0, use_nn=True,
                          alpha_ramp=True)


@pytest.mark.slow
def test_both_engines_solve_every_tick(report):
    assert report["finite"]
    assert report["jax_solved_frac"] == 1.0, report
    assert report["mujoco_solved_frac"] == 1.0, report


@pytest.mark.slow
def test_trajectory_divergence_bounded(report):
    assert report["com_div_max_m"] < 0.06, report
    assert report["rpy_div_max_deg"] < 8.0, report
    assert report["base_div_max_m"] < 0.09, report


@pytest.mark.slow
def test_jet_pipeline_identical_across_engines(report):
    """The LSTM+EKF thrust chain is shared code driven by throttle only —
    any divergence means the two sims stopped running the same jet model."""
    assert report["thrust_div_max_n"] < 1e-3, report
