#!/usr/bin/env python
"""Time the condensed-solve sub-kernels in isolation on the real chip:
Cholesky factor + explicit inverse, the ADMM scan segment, one Woodbury
rho update, and the Schur polish. Targets Pallas/algorithm work."""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache_tpu"))

import __graft_entry__ as ge
from ironcub_mpc_tpu.ops import admm, jet_model as jm
from ironcub_mpc_tpu.qp import condensed, mpc as vs_mpc

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
    print(f"{name:32s} {dt*1e3:8.3f} ms  ({BATCH/dt:10.0f} /s)")
    return out


prep_j = jax.jit(jax.vmap(
    lambda c, s, e: vs_mpc._tick_prep(cfg, sel, problem, c, s, e)))
carries2, preps = prep_j(carries, snaps, est)
q_diag = jnp.diagonal(problem.Q)
selA = jnp.asarray(sel)


def cond_fn(carry, prep, mode_cfg):
    joint_reg_grad = cfg.weight_regularization_joint_pos * (
        carry.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl)
    throttle_init_grad = (-cfg.weight_initial_throttle
                          * jm.throttle_to_v(carry.throttle_cmd))
    return condensed.condense(
        mode_cfg, sched, prep.lin, prep.x0, prep.state_ref, q_diag,
        problem.H_u, joint_reg_grad, throttle_init_grad, prep.pin,
        carry.throttle_cmd)


import dataclasses as _dc  # noqa: E402

for mode in ("sequential", "assoc"):
    mcfg = _dc.replace(cfg, condense_mode=mode)
    fn = jax.jit(jax.vmap(lambda c, p: cond_fn(c, p, mcfg)))
    qps = bench(f"condense ({mode})", fn, carries2, preps)

nU = qps.H.shape[1]
n_box = qps.lb.shape[1]
box0 = nU - n_box
dt_ = qps.H.dtype
sigma = settings.sigma


def factor_chol(H):
    K = H + sigma * jnp.eye(nU, dtype=dt_)
    K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(settings.rho)
    chol = jnp.linalg.cholesky(K)
    return jax.lax.linalg.triangular_solve(
        chol,
        jax.lax.linalg.triangular_solve(
            chol, jnp.eye(nU, dtype=dt_), left_side=True, lower=True),
        left_side=True, lower=True, transpose_a=True)


def chol_only(H):
    K = H + sigma * jnp.eye(nU, dtype=dt_)
    K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(settings.rho)
    return jnp.linalg.cholesky(K)


with jax.default_matmul_precision("highest"):
    Kinvs = bench("factor(chol+inv)", jax.jit(jax.vmap(factor_chol)), qps.H)
    bench("cholesky only", jax.jit(jax.vmap(chol_only)), qps.H)

    def scan60(Kinv, q, lb, ub):
        x = jnp.zeros((nU,), dt_)
        z = jnp.clip(x[box0:], lb, ub)
        y = jnp.zeros((n_box,), dt_)
        rho = settings.rho

        def body(carry, _):
            x, z, y = carry
            rhs = sigma * x - q
            rhs = rhs.at[box0:].add(rho * z - y)
            x_t = Kinv @ rhs
            z_t = x_t[box0:]
            x_n = settings.alpha * x_t + (1 - settings.alpha) * x
            z_rel = settings.alpha * z_t + (1 - settings.alpha) * z
            z_un = z_rel + y / rho
            z_n = jnp.clip(z_un, lb, ub)
            y_n = rho * (z_un - z_n)
            return (x_n, z_n, y_n), None

        (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=60)
        return x, z, y

    bench("scan 60 iters", jax.jit(jax.vmap(scan60)), Kinvs, qps.q,
          qps.lb, qps.ub)

    def one_woodbury(Kinv, H):
        rho_old = jnp.full((n_box,), settings.rho, dt_)
        rho_new = rho_old * 3.0
        d = rho_new - rho_old
        M = jnp.eye(n_box, dtype=dt_) + d[:, None] * Kinv[box0:, box0:]
        X = jnp.linalg.solve(M, d[:, None] * Kinv[box0:, :])
        Knew = Kinv - Kinv[:, box0:] @ X
        K = H + sigma * jnp.eye(nU, dtype=dt_)
        K = K.at[jnp.arange(box0, nU), jnp.arange(box0, nU)].add(rho_new)
        for _ in range(2):
            Knew = Knew @ (2.0 * jnp.eye(nU, dtype=dt_) - K @ Knew)
        return 0.5 * (Knew + Knew.T)

    bench("one woodbury(2xNS)", jax.jit(jax.vmap(one_woodbury)), Kinvs, qps.H)

    def ns_only(Kinv, H):
        K = H + sigma * jnp.eye(nU, dtype=dt_)
        Knew = Kinv
        for _ in range(2):
            Knew = Knew @ (2.0 * jnp.eye(nU, dtype=dt_) - K @ Knew)
        return Knew

    bench("2x newton-schulz", jax.jit(jax.vmap(ns_only)), Kinvs, qps.H)

    def small_solve(Kinv):
        d = jnp.full((n_box,), 2.0, dt_)
        M = jnp.eye(n_box, dtype=dt_) + d[:, None] * Kinv[box0:, box0:]
        return jnp.linalg.solve(M, d[:, None] * Kinv[box0:, :])

    bench("24x24 lin solve", jax.jit(jax.vmap(small_solve)), Kinvs)

# --- horizon-parallel condensing payoff at a LONG horizon -------------------
# The stock nIter=17 chain is too short for associative_scan to beat the
# sequential unroll; this section shows the crossover at nIter=128 (the
# horizon-parallel axis' measured win, not just an equivalence test).
# Synthetic linearisation at the same block structure; both modes share
# identical shapes, so the comparison isolates the scan algebra.
import numpy as _np  # noqa: E402

from ironcub_mpc_tpu.core.config import MPCConfig  # noqa: E402
from ironcub_mpc_tpu.horizon import build_schedule  # noqa: E402
from ironcub_mpc_tpu.qp.blocks import LinearizedDynamics  # noqa: E402

# batch 16: the sequential mode's unrolled 128-step chain rematerialises
# [B, 1, 26, nU] temporaries with a 128x-padding layout on chip — batch 64
# OOMs a v5e; 16 fits both modes and the comparison is per-scenario anyway
LONG_BATCH = min(BATCH, 16)
cfg128 = _dc.replace(MPCConfig(), n_iter=128, n_iter_small=64,
                     control_horizon=65)
sched128 = build_schedule(cfg128)
H_u128 = jnp.asarray(condensed.build_hu(cfg128), jnp.float32)
rng = _np.random.default_rng(0)
ns, nj, nt = cfg128.n_states, cfg128.n_ctrl_joints, cfg128.n_jets


def rand_lin(_):
    return LinearizedDynamics(
        Ac=jnp.asarray(0.05 * rng.standard_normal((ns, ns)), jnp.float32),
        BJ=jnp.asarray(rng.standard_normal((ns, nj)), jnp.float32),
        BT=jnp.asarray(rng.standard_normal((ns, nt)), jnp.float32),
        c=jnp.asarray(rng.standard_normal(ns), jnp.float32))


lins = jax.tree.map(lambda *a: jnp.stack(a),
                    *[rand_lin(i) for i in range(LONG_BATCH)])
x0s = jnp.asarray(rng.standard_normal((LONG_BATCH, ns)), jnp.float32)
refs = jnp.asarray(rng.standard_normal((LONG_BATCH, ns, cfg128.n_iter)),
                   jnp.float32)
q_diag128 = jnp.ones((ns,), jnp.float32)
jreg = jnp.zeros((nj,), jnp.float32)
tgrad = jnp.zeros((nt,), jnp.float32)
thr = jnp.full((4,), 60.0, jnp.float32)

for mode in ("sequential", "assoc"):
    mcfg = _dc.replace(cfg128, condense_mode=mode)
    fn = jax.jit(jax.vmap(lambda lin, x0, ref: condensed.condense(
        mcfg, sched128, lin, x0, ref, q_diag128, H_u128, jreg, tgrad,
        jnp.asarray(False), thr)))
    _save_b = BATCH
    BATCH = LONG_BATCH
    bench(f"condense nIter=128 ({mode})", fn, lins, x0s, refs)
    BATCH = _save_b
