"""Model-mismatch robustness (VERDICT r4 weak 5 / next 4): the plant flies
perturbed inertial parameters and jet placements while the controller keeps
linearising against the nominal model — the buildable half of the
real-asset gap, and the framework's sim-to-real margin probe. The
reference's only robustness mechanism is sensor noise
(ironcub_mujoco_simulator.py:263-288); it never separates controller model
from plant model."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, SimConfig
from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.parallel import (ScenarioConfig, make_batched_carry,
                                      make_mesh, run_sweep)
from ironcub_mpc_tpu.runtime.loop import ClosedLoop
from ironcub_mpc_tpu.sim.plant import Plant

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def loop_setup():
    import sys
    sys.path.insert(0, str(ROOT / "examples"))
    from closed_loop_demo import standing_state

    model = build_ironcub_model()
    kd = KinDyn(model)
    plant = Plant(kd, RobotConfig(), SimConfig(use_nn_jet_dynamics=False))
    loop = ClosedLoop(plant, MPCConfig(), admm.ADMMSettings(max_iter=60))
    s = standing_state(plant, SimConfig().initial_position_deg)
    s = jax.jit(lambda s: loop.settle(s, 0.2))(s)
    channels = {k: np.zeros((30, 3)) for k in
                ("positionCoM", "velocityCoM", "RPY", "RPYDot")}
    problem, carry = loop.configure(s, channels, np.full(600, 0.08))
    return loop, problem, carry


def test_nominal_mismatch_fields_change_nothing(loop_setup):
    """mass_scale=1 / jet_pos_offset=0 must be arithmetically transparent:
    a rollout with explicitly-set nominal fields equals the default."""
    loop, problem, carry = loop_setup
    c2 = carry._replace(plant=carry.plant._replace(
        mass_scale=jnp.ones_like(carry.plant.mass_scale),
        jet_pos_offset=jnp.zeros_like(carry.plant.jet_pos_offset)))
    _, tel_a = jax.jit(lambda c: loop.rollout(problem, c, 4))(carry)
    _, tel_b = jax.jit(lambda c: loop.rollout(problem, c, 4))(c2)
    np.testing.assert_array_equal(np.asarray(tel_a.com_position),
                                  np.asarray(tel_b.com_position))


def test_perturbed_plant_diverges_from_nominal(loop_setup):
    """A 15% heavier torso genuinely changes the plant trajectory (the
    mismatch hook reaches the true dynamics)."""
    loop, problem, carry = loop_setup
    ms = carry.plant.mass_scale.at[0].set(1.15)
    c2 = carry._replace(plant=carry.plant._replace(mass_scale=ms))
    _, tel_a = jax.jit(lambda c: loop.rollout(problem, c, 20))(carry)
    _, tel_b = jax.jit(lambda c: loop.rollout(problem, c, 20))(c2)
    d = np.abs(np.asarray(tel_a.com_position)
               - np.asarray(tel_b.com_position)).max()
    assert d > 1e-5, d
    assert np.isfinite(np.asarray(tel_b.com_position)).all()


def test_mismatch_sweep_degrades_gracefully(loop_setup):
    """Batched mismatch sweep: at ±10% segment masses + 1 cm jet placement
    the nominal controller must still track (no failures at this short
    horizon), with tracking error >= the matched-model sweep's."""
    loop, problem, carry = loop_setup
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    base_scen = ScenarioConfig(wind_force_std=0.0, thrust_scale_std=0.0,
                               base_vel_std=0.0, joint_pos_std=0.0)
    mm_scen = ScenarioConfig(wind_force_std=0.0, thrust_scale_std=0.0,
                             base_vel_std=0.0, joint_pos_std=0.0,
                             mass_scale_std=0.10, jet_pos_std_m=0.01)
    b0 = make_batched_carry(carry, 8, base_scen, seed=3)
    res0 = run_sweep(loop, problem, b0, n_ticks=8, mesh=mesh, scen=base_scen)
    b1 = make_batched_carry(carry, 8, mm_scen, seed=3)
    # matched-model lanes are identical draws except the mismatch fields
    assert float(jnp.abs(b1.plant.mass_scale - 1.0).max()) > 0.01
    res1 = run_sweep(loop, problem, b1, n_ticks=8, mesh=mesh, scen=mm_scen)
    assert int(res1.n_failed) == 0
    assert float(res1.solved_frac) > 0.99
    assert float(res1.mean_com_err) >= float(res0.mean_com_err)
