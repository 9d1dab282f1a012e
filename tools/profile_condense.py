#!/usr/bin/env python
"""Condense-stage roofline: isolate the F/f chain from the H/q contraction
and measure candidate restructurings on the real chip.

Variants:
  seq-full        condense(condense_mode="sequential")   (shipped default)
  struct-full     condense(condense_mode="structured")   (scan-based)
  chain-seq       the 17-step dense chain alone
  chain-unrolled  structured recurrences with python-unrolled steps
  H-only          the H_c/q_c contraction alone (given F, f)

Prints ms per call and per-solve FLOP-derived effective TFLOP/s so the
docs/PERFORMANCE.md roofline table can cite measured numbers.
"""

import dataclasses
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
from ironcub_mpc_tpu.ops import jet_model as jm
from ironcub_mpc_tpu.qp import condensed, mpc as vs_mpc

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = 20

cfg, sched, sel, settings, problem, carry, snap, _ = ge._setup()
carry2, prep = vs_mpc._tick_prep(cfg, sel, problem, carry, snap, jnp.zeros(4))
q_diag = jnp.diagonal(problem.Q)
selA = jnp.asarray(sel)
carries = jax.tree.map(lambda a: jnp.stack([a] * BATCH), carry2)
preps = jax.tree.map(lambda a: jnp.stack([a] * BATCH), prep)

nU = condensed.n_inputs(cfg)
ns, nj, nt, ch, N = (cfg.n_states, cfg.n_ctrl_joints, cfg.n_jets,
                     cfg.control_horizon, cfg.n_iter)


def bench(name, fn, *args, flop_per_item=0.0):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    tfps = BATCH * flop_per_item / dt / 1e12 if flop_per_item else 0.0
    print(f"{name:16s} {dt*1e3:8.3f} ms  ({BATCH/dt:9.0f}/s)"
          + (f"  {tfps:6.2f} TFLOP/s" if flop_per_item else ""))
    return out


def cond_fn(carry, prep, mcfg):
    jrg = cfg.weight_regularization_joint_pos * (
        carry.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl)
    tig = (-cfg.weight_initial_throttle
           * jm.throttle_to_v(carry.throttle_cmd))
    return condensed.condense(mcfg, sched, prep.lin, prep.x0, prep.state_ref,
                              q_diag, problem.H_u, jrg, tig, prep.pin,
                              carry.throttle_cmd)


# FLOP accounting (per solve): chain = N * 2 * ns^2 * nU (Ad@F) plus the
# M adds; H = 2 * (N*18) * nU^2; q = 2 * (N*18) * nU.
FLOP_CHAIN = N * 2 * ns * ns * nU
FLOP_H = 2 * (N * 18) * nU * nU

for mode in ("sequential", "structured", "paired"):
    mcfg = dataclasses.replace(cfg, condense_mode=mode)
    bench(f"{mode[:10]}-full", jax.jit(jax.vmap(
        lambda c, p, m=mcfg: cond_fn(c, p, m))), carries, preps,
        flop_per_item=FLOP_CHAIN + FLOP_H)


def chain_seq(lin, x0):
    eye = jnp.eye(ns, dtype=lin.Ac.dtype)
    F = jnp.zeros((ns, nU), lin.Ac.dtype)
    f = x0
    Fs, fs = [], []
    for k in range(N):
        dtk = sched.dts[k]
        Ad = eye + dtk * lin.Ac
        Mk = jnp.zeros((ns, nU), lin.Ac.dtype)
        jc = sched.joint_knot_of_step[k] * nj
        Mk = Mk.at[:, jc:jc + nj].add(dtk * lin.BJ)
        tc = nj * ch + sched.throttle_knot_of_step[k] * nt
        Mk = Mk.at[:, tc:tc + nt].add(dtk * lin.BT)
        F = Ad @ F + Mk
        f = Ad @ f + dtk * lin.c
        Fs.append(F)
        fs.append(f)
    return jnp.stack(Fs), jnp.stack(fs)


def chain_struct(lin, x0):
    return condensed._structured_chain(cfg, sched, lin, x0)


def chain_paired(lin, x0):
    return condensed._paired_chain(cfg, sched, lin, x0)


with jax.default_matmul_precision("highest"):
    Ffs = bench("chain-seq", jax.jit(jax.vmap(chain_seq)),
                preps.lin, preps.x0, flop_per_item=FLOP_CHAIN)
    bench("chain-struct", jax.jit(jax.vmap(chain_struct)),
          preps.lin, preps.x0, flop_per_item=FLOP_CHAIN)
    bench("chain-paired", jax.jit(jax.vmap(chain_paired)),
          preps.lin, preps.x0, flop_per_item=FLOP_CHAIN)

    F_all, f_all = Ffs
    w_idx = jnp.asarray(condensed.weighted_state_indices(cfg))

    def h_only(F_all, f_all, ref):
        Fw = F_all[:, w_idx, :]
        qw = q_diag[w_idx]
        H = jnp.einsum("kan,a,kam->nm", Fw, qw, Fw)
        q = jnp.einsum("kan,a,ka->n", Fw, qw, (f_all - ref.T)[:, w_idx])
        return H, q

    def h_matmul(F_all, f_all, ref):
        # same contraction as one reshaped GEMM
        Fw = F_all[:, w_idx, :].reshape(-1, nU)
        qw = jnp.tile(q_diag[w_idx], N)
        H = Fw.T @ (qw[:, None] * Fw)
        q = Fw.T @ (qw * (f_all - ref.T)[:, w_idx].reshape(-1))
        return H, q

    refs = preps.state_ref
    bench("H-einsum", jax.jit(jax.vmap(h_only)), F_all, f_all, refs,
          flop_per_item=FLOP_H)
    bench("H-gemm", jax.jit(jax.vmap(h_matmul)), F_all, f_all, refs,
          flop_per_item=FLOP_H)
