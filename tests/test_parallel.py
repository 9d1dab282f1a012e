"""Distributed-path tests on the virtual 8-device CPU mesh:
scenario-sharded Monte-Carlo sweeps and the row-sharded (tensor-parallel)
ADMM, both checked for equivalence against the single-device paths."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ironcub_mpc_tpu.core.config import MPCConfig, RobotConfig, SimConfig
from ironcub_mpc_tpu.dynamics import KinDyn, build_ironcub_model
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.parallel import (
    ScenarioConfig,
    make_batched_carry,
    make_mesh,
    run_sweep,
)
from ironcub_mpc_tpu.parallel.tp_admm import solve_tp
from ironcub_mpc_tpu.runtime.loop import ClosedLoop
from ironcub_mpc_tpu.sim.plant import Plant

ROOT = Path(__file__).resolve().parents[1]


def test_mesh_shapes(devices):
    mesh = make_mesh()
    assert mesh.shape["scenario"] * mesh.shape["kkt"] == len(devices)
    mesh2 = make_mesh(n_scenario=4, n_kkt=2)
    assert mesh2.shape == {"scenario": 4, "kkt": 2}


def test_tp_admm_matches_single_device():
    rng = np.random.default_rng(0)
    n, m = 24, 18
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    l = jnp.asarray(-np.abs(rng.normal(size=m)) - 0.05, jnp.float32)
    u = jnp.asarray(np.abs(rng.normal(size=m)) + 0.05, jnp.float32)
    s = admm.ADMMSettings(max_iter=300, polish=False)
    mesh = make_mesh(n_scenario=1, n_kkt=8)
    sol_tp = solve_tp(P, q, A, l, u, mesh, s)
    sol_ref = admm.solve(P, q, A, l, u, s)
    np.testing.assert_allclose(np.asarray(sol_tp.x), np.asarray(sol_ref.x),
                               atol=5e-3, rtol=1e-2)
    assert int(sol_tp.status) == admm.SOLVED


def test_tp_admm_row_padding():
    """m not divisible by shard count: zero-row padding must not change the
    solution."""
    rng = np.random.default_rng(1)
    n, m = 10, 5  # 5 rows over 8 shards -> 3 pad rows
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    l = jnp.asarray(-np.ones(m), jnp.float32)
    u = jnp.asarray(np.ones(m), jnp.float32)
    s = admm.ADMMSettings(max_iter=300, polish=False)
    mesh = make_mesh(n_scenario=1, n_kkt=8)
    sol_tp = solve_tp(P, q, A, l, u, mesh, s)
    sol_ref = admm.solve(P, q, A, l, u, s)
    np.testing.assert_allclose(np.asarray(sol_tp.x), np.asarray(sol_ref.x),
                               atol=5e-3, rtol=1e-2)
    assert sol_tp.y.shape == (m,)


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


def test_sharded_sweep_runs_and_is_sane(loop_setup):
    loop, problem, carry = loop_setup
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    scen = ScenarioConfig(wind_force_std=2.0, thrust_scale_std=0.02,
                          base_vel_std=0.01, joint_pos_std=0.002)
    batched = make_batched_carry(carry, 16, scen, seed=1)
    res = run_sweep(loop, problem, batched, n_ticks=6, mesh=mesh, scen=scen)
    assert int(res.n_scenarios) == 16
    assert int(res.n_failed) == 0
    assert float(res.solved_frac) > 0.99
    assert float(res.mean_com_err) < 0.05
    assert float(res.max_com_err) < 0.1


def test_sharded_sweep_matches_vmap(loop_setup):
    """The mesh-sharded statistics must equal a plain single-device vmap —
    sharding is an implementation detail, not a numerics change."""
    loop, problem, carry = loop_setup
    scen = ScenarioConfig(wind_force_std=2.0, thrust_scale_std=0.02,
                          base_vel_std=0.01, joint_pos_std=0.002)
    batched = make_batched_carry(carry, 8, scen, seed=2)
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    res = run_sweep(loop, problem, batched, n_ticks=4, mesh=mesh, scen=scen)

    # plain vmap reference
    def one(c):
        c, tel = loop.rollout(problem, c, 4)
        return jnp.max(jnp.linalg.norm(
            tel.com_position - tel.com_position_desired, axis=-1))
    errs = jax.vmap(one)(batched)
    np.testing.assert_allclose(float(res.max_com_err), float(jnp.max(errs)),
                               rtol=1e-4)
    np.testing.assert_allclose(float(res.mean_com_err), float(jnp.mean(errs)),
                               rtol=1e-4)


def test_failure_detection(loop_setup):
    """A scenario with absurd wind must be flagged failed, not averaged in."""
    loop, problem, carry = loop_setup
    scen = ScenarioConfig(wind_force_std=0.0, thrust_scale_std=0.0,
                          base_vel_std=0.0, joint_pos_std=0.0,
                          com_err_fail=0.04)
    batched = make_batched_carry(carry, 8, scen, seed=3)
    wind = batched.plant.wind_force.at[0].set(
        jnp.asarray([10000.0, 0.0, 0.0], batched.plant.wind_force.dtype))
    batched = batched._replace(plant=batched.plant._replace(wind_force=wind))
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    res = run_sweep(loop, problem, batched, n_ticks=12, mesh=mesh, scen=scen)
    assert int(res.n_failed) >= 1
    assert float(res.mean_com_err) < 0.04  # failed lane excluded from stats


def test_sweep_checkpoint_resume_equivalence(loop_setup, tmp_path):
    """Chunked sweep + checkpoint/resume (SURVEY §5): running 4+4 ticks with
    a simulated interruption after the first 4 (fresh run_sweep call against
    the same checkpoint dir) must produce exactly the statistics of an
    uninterrupted 8-tick run."""
    loop, problem, carry = loop_setup
    scen = ScenarioConfig(wind_force_std=2.0, com_err_fail=1.0)
    mesh = make_mesh(n_scenario=8, n_kkt=1)

    batched = make_batched_carry(carry, 8, scen, seed=5)
    ref = run_sweep(loop, problem, batched, n_ticks=8, mesh=mesh, scen=scen,
                    chunk_ticks=4)

    ck = tmp_path / "sweep_ck"
    batched2 = make_batched_carry(carry, 8, scen, seed=5)
    # "crash" after the first chunk: ask for only 4 ticks, checkpointed
    run_sweep(loop, problem, batched2, n_ticks=4, mesh=mesh, scen=scen,
              chunk_ticks=4, checkpoint_dir=str(ck))
    # resume: a fresh call continues from the persisted cursor to 8
    batched3 = make_batched_carry(carry, 8, scen, seed=5)
    res = run_sweep(loop, problem, batched3, n_ticks=8, mesh=mesh,
                    scen=scen, chunk_ticks=4, checkpoint_dir=str(ck))

    np.testing.assert_allclose(float(res.mean_com_err),
                               float(ref.mean_com_err), rtol=1e-6)
    np.testing.assert_allclose(float(res.max_com_err),
                               float(ref.max_com_err), rtol=1e-6)
    assert int(res.n_failed) == int(ref.n_failed)
    assert float(res.solved_frac) == float(ref.solved_frac)


def test_sweep_status_histogram(loop_setup):
    """Forensics: the per-status tick histogram must partition all
    (scenario, tick) pairs and agree with solved_frac."""
    loop, problem, carry = loop_setup
    scen = ScenarioConfig(wind_force_std=2.0, thrust_scale_std=0.02,
                          base_vel_std=0.01, joint_pos_std=0.002)
    batched = make_batched_carry(carry, 8, scen, seed=7)
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    res = run_sweep(loop, problem, batched, n_ticks=5, mesh=mesh, scen=scen)
    cnt = np.asarray(res.status_counts)
    assert cnt.shape == (6,)
    # the five status columns partition all ticks (guard column is extra)
    assert cnt[:5].sum() == 8 * 5
    np.testing.assert_allclose(
        (cnt[0] + cnt[1]) / (8 * 5), float(res.solved_frac), rtol=1e-6)
    assert res.lane_max_err.shape == (8,)
    assert res.lane_solver_bad.shape == (8,)


def test_sweep_recovery_fixes_bad_ticks(loop_setup):
    """Failure recovery (SURVEY §5): with a crippled primary solver
    (max_iter=3) most ticks are MAX_ITER; the psum-guarded retry with
    recovery_settings (fresh factorisation + iteration boost) must lift
    solved_frac to ~1 and report the retried/recovered counts."""
    import dataclasses

    loop, problem, carry = loop_setup
    scen = ScenarioConfig(wind_force_std=2.0, thrust_scale_std=0.02,
                          base_vel_std=0.01, joint_pos_std=0.002)
    mesh = make_mesh(n_scenario=8, n_kkt=1)
    old = loop.settings
    try:
        loop.settings = dataclasses.replace(old, max_iter=3,
                                            rho_update_iters=(),
                                            polish=False)
        batched = make_batched_carry(carry, 8, scen, seed=9)
        base = run_sweep(loop, problem, batched, n_ticks=4, mesh=mesh,
                         scen=scen)
        assert float(base.solved_frac) < 0.5  # the cripple works
        batched = make_batched_carry(carry, 8, scen, seed=9)
        rec = run_sweep(loop, problem, batched, n_ticks=4, mesh=mesh,
                        scen=scen, recover=True)
        assert int(rec.n_ticks_retried) > 0
        assert int(rec.n_ticks_recovered) > 0
        # post-recovery histogram reflects the retried outcomes
        assert float(rec.solved_frac) > float(base.solved_frac) + 0.4
        assert int(rec.n_ticks_recovered) <= int(rec.n_ticks_retried)
    finally:
        loop.settings = old
