"""Pipeline parallelism: the 4-stage condensed tick over a "pipe" mesh axis
must reproduce the monolithic vmapped tick exactly."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import __graft_entry__ as ge
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.parallel.pp_pipeline import N_STAGES, pipeline_tick
from ironcub_mpc_tpu.qp import mpc as vs_mpc


def _batched_inputs(cfg, carry, snap, batch, seed=0):
    carries = jax.tree.map(lambda a: jnp.stack([a] * batch), carry)
    snaps = jax.tree.map(lambda a: jnp.stack([a] * batch), snap)
    key = jax.random.PRNGKey(seed)
    snaps = snaps._replace(
        momentum_body=snaps.momentum_body + 0.2 * jax.random.normal(
            key, snaps.momentum_body.shape, snaps.momentum_body.dtype))
    est = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, 4))
    return carries, snaps, est


def test_pipeline_matches_vmapped_tick():
    settings = admm.ADMMSettings(max_iter=40, rho_update_iters=(15,),
                                 pallas_mode="off")
    cfg, sched, sel, settings, problem, carry, snap, _ = ge._setup(
        settings=settings)
    batch = 8
    carries, snaps, est = _batched_inputs(cfg, carry, snap, batch)

    ref_c, ref_o = jax.jit(jax.vmap(
        lambda c, s, e: vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                        c, s, e)))(carries, snaps, est)

    mesh = Mesh(np.asarray(jax.devices()[:N_STAGES]), ("pipe",))
    pp_c, pp_o = pipeline_tick(cfg, sched, sel, settings, problem,
                               carries, snaps, est, mesh)

    assert np.all(np.asarray(pp_o.status) == np.asarray(ref_o.status))

    def close(a, b, what, tol=1e-5):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1.0)
        err = np.abs(a - b).max() / scale
        assert err < tol, f"{what}: normalized max err {err:.2e}"

    for field in ("joints_pos_ref", "throttle", "thrust_des", "final_state"):
        close(getattr(pp_o, field), getattr(ref_o, field), field)
    # carries agree too (warm starts, integrated commands, counters)
    for field in ("joints_pos_ref", "throttle_cmd", "warm_x",
                  "throttle_counter", "pos_traj_idx"):
        close(getattr(pp_c, field), getattr(ref_c, field), field)


def test_pipeline_emits_debug_info():
    """enable_debug_log_mode flows through the pipelined tick like the
    monolithic one (same DebugInfo channels, same values)."""
    import dataclasses

    from ironcub_mpc_tpu.core.config import MPCConfig

    settings = admm.ADMMSettings(max_iter=30, rho_update_iters=(12,),
                                 pallas_mode="off")
    cfg = dataclasses.replace(MPCConfig(), enable_debug_log_mode=True)
    cfg, sched, sel, settings, problem, carry, snap, _ = ge._setup(
        cfg=cfg, settings=settings)
    batch = 4
    carries, snaps, est = _batched_inputs(cfg, carry, snap, batch)

    _, ref_o = jax.jit(jax.vmap(
        lambda c, s, e: vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                        c, s, e)))(carries, snaps, est)

    mesh = Mesh(np.asarray(jax.devices()[:N_STAGES]), ("pipe",))
    _, pp_o = pipeline_tick(cfg, sched, sel, settings, problem,
                            carries, snaps, est, mesh)
    assert pp_o.debug is not None
    np.testing.assert_allclose(np.asarray(pp_o.debug.block_costs),
                               np.asarray(ref_o.debug.block_costs),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pp_o.debug.constraint_ub),
                               np.asarray(ref_o.debug.constraint_ub),
                               atol=1e-6)
