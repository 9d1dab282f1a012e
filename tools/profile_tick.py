#!/usr/bin/env python
"""Break down one batched condensed MPC tick into stages and time each on
the real chip. Used to target Pallas work (not part of the test suite)."""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache_tpu"))

import __graft_entry__ as ge
from ironcub_mpc_tpu.ops import admm, jet_model as jm
from ironcub_mpc_tpu.qp import condensed, mpc as vs_mpc
from ironcub_mpc_tpu.core import constants as C

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = 20

settings = admm.ADMMSettings(max_iter=60, polish=True,
                             rho_update_iters=(15, 40))
cfg, sched, sel, settings, problem, carry, snap, _ = ge._setup(
    settings=settings)

carries = jax.tree.map(lambda a: jnp.stack([a] * BATCH), carry)
snaps = jax.tree.map(lambda a: jnp.stack([a] * BATCH), snap)
key = jax.random.PRNGKey(0)
snaps = snaps._replace(
    momentum_body=snaps.momentum_body
    + 0.1 * jax.random.normal(key, snaps.momentum_body.shape,
                              snaps.momentum_body.dtype))
est = jnp.zeros((BATCH, 4))


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.3f} ms  ({BATCH/dt:10.0f} /s)")
    return out


# stage 1: prep (reference shift + linearize + x0)
def prep_fn(carry, snap, est):
    return vs_mpc._tick_prep(cfg, sel, problem, carry, snap, est)


prep_j = jax.jit(jax.vmap(prep_fn))
carries2, preps = bench("tick_prep(linearize)", prep_j, carries, snaps, est)

q_diag = jnp.diagonal(problem.Q)


# stage 2: condense
def cond_fn(carry, prep):
    selA = jnp.asarray(sel)
    joint_reg_grad = cfg.weight_regularization_joint_pos * (
        carry.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl)
    throttle_init_grad = (-cfg.weight_initial_throttle
                          * jm.throttle_to_v(carry.throttle_cmd))
    return condensed.condense(
        cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag, problem.H_u,
        joint_reg_grad, throttle_init_grad, prep.pin, carry.throttle_cmd)


cond_j = jax.jit(jax.vmap(cond_fn))
qps = bench("condense", cond_j, carries2, preps)


# stage 3: solve
def solve_fn(qp, wx, wy):
    return condensed.solve(cfg, qp, settings, warm_u=wx, warm_y=wy)


solve_j = jax.jit(jax.vmap(solve_fn))
sols = bench("solve(admm+polish)", solve_j, qps, carries2.warm_x,
             carries2.warm_y)

# solve sub-stages
nosettings = settings


def solve_nopolish(qp, wx, wy):
    import dataclasses
    s = dataclasses.replace(nosettings, polish=False)
    return condensed.solve(cfg, qp, s, warm_u=wx, warm_y=wy)


bench("solve(no polish)", jax.jit(jax.vmap(solve_nopolish)), qps,
      carries2.warm_x, carries2.warm_y)


def solve_norho(qp, wx, wy):
    import dataclasses
    s = dataclasses.replace(nosettings, polish=False, rho_update_iters=())
    return condensed.solve(cfg, qp, s, warm_u=wx, warm_y=wy)


bench("solve(no polish, no rho)", jax.jit(jax.vmap(solve_norho)), qps,
      carries2.warm_x, carries2.warm_y)


def solve_iter_only(qp, wx, wy):
    import dataclasses
    s = dataclasses.replace(nosettings, polish=False, rho_update_iters=(),
                            scaling_iters=0)
    return condensed.solve(cfg, qp, s, warm_u=wx, warm_y=wy)


bench("solve(+no scaling)", jax.jit(jax.vmap(solve_iter_only)), qps,
      carries2.warm_x, carries2.warm_y)


# full tick for reference
def tick(carry, snap, est):
    return vs_mpc.mpc_tick(cfg, sched, sel, settings, problem, carry, snap,
                           est)


bench("FULL tick", jax.jit(jax.vmap(tick)), carries, snaps, est)
