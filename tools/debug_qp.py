#!/usr/bin/env python
"""printMatricesByTask analog (IMPCProblem.cpp:493-527): assemble the QP at
the default hover state and dump every block — per-cost Hessian/gradient,
per-constraint matrix + bounds, and the stacked recap — to an .npz plus a
console summary.

Usage:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/debug_qp.py [out.npz]
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import __graft_entry__ as ge
from ironcub_mpc_tpu.qp import assembly
from ironcub_mpc_tpu.qp import mpc as vs_mpc


def main():
    cfg, sched, sel, settings, problem, carry, snap, _ = ge._setup()
    est = jnp.zeros(4)
    carry, prep = vs_mpc._tick_prep(cfg, sel, problem, carry, snap, est)
    selA = jnp.asarray(sel)

    # --- per-cost blocks (full-size Hessians like IQPCost owns) ------------
    n = cfg.n_var
    ns, ni, ch = cfg.n_states, cfg.n_iter, cfg.control_horizon
    nj, nt = cfg.n_ctrl_joints, cfg.n_jets
    jo, to = cfg.joints_offset, cfg.throttle_offset
    Q = assembly.state_weight_matrix(cfg)

    H_track = np.zeros((n, n))
    for i in range(1, ni + 1):
        H_track[i * ns:(i + 1) * ns, i * ns:(i + 1) * ns] = Q
    g_track = np.zeros(n)
    state_ref = np.asarray(prep.state_ref)
    for i in range(1, ni + 1):
        g_track[i * ns:(i + 1) * ns] = -Q @ state_ref[:, i - 1]

    H_reg = np.zeros((n, n))
    for i in range(ch):
        blk = slice(jo + i * nj, jo + (i + 1) * nj)
        H_reg[blk, blk] = np.diag(cfg.weight_delta_joint)
    wt = cfg.weight_throttle * np.eye(nt)
    for i in range(ch - cfg.n_iter_small):
        a = slice(to + i * nt, to + (i + 1) * nt)
        b = slice(to + (i + 1) * nt, to + (i + 2) * nt)
        H_reg[a, a] += wt
        H_reg[b, b] += wt
        H_reg[a, b] -= wt
        H_reg[b, a] -= wt

    H_thr0 = np.zeros((n, n))
    H_thr0[to:to + nt, to:to + nt] = cfg.weight_initial_throttle * np.eye(nt)
    from ironcub_mpc_tpu.ops import jet_model as jm
    g_thr0 = np.zeros(n)
    g_thr0[to:to + nt] = np.asarray(
        -cfg.weight_initial_throttle * jm.throttle_to_v(carry.throttle_cmd))

    H_jreg = np.zeros((n, n))
    for i in range(ch):
        blk = slice(jo + i * nj, jo + (i + 1) * nj)
        H_jreg[blk, blk] = cfg.weight_regularization_joint_pos * np.eye(nj)
    g_jreg = np.zeros(n)
    jr = np.asarray(cfg.weight_regularization_joint_pos
                    * (carry.joints_pos_ref[selA] - problem.joint_pos_ref_ctrl))
    for i in range(ch):
        g_jreg[jo + i * nj:jo + (i + 1) * nj] = jr

    # --- per-constraint blocks ---------------------------------------------
    A_dyn, l_dyn, u_dyn = assembly.build_dynamics_rows(cfg, sched, prep.lin)
    A_init, l_init, u_init = assembly.build_initial_state_rows(cfg, prep.x0)
    A_thr, l_thr, u_thr = assembly.build_throttle_rows(
        cfg, prep.pin, carry.throttle_cmd, prep.x0.dtype)

    blocks = {
        "ReferenceTrackingCost": (H_track, g_track),
        "RegualarizationCost": (H_reg, np.zeros(n)),
        "ThrottleInitialValueCost": (H_thr0, g_thr0),
        "JointPositionRegularizationCost": (H_jreg, g_jreg),
    }
    constraints = {
        "ConstraintSystemDynamicVS": (A_dyn, l_dyn, u_dyn),
        "ConstraintInitialState": (A_init, l_init, u_init),
        "ThrottleConstraint": (A_thr, l_thr, u_thr),
    }

    payload = {}
    for name, (H, g) in blocks.items():
        print(f"========= {name} =========")
        print(f"  Hessian: {H.shape}, nnz={int(np.count_nonzero(H))}, "
              f"|H|max={np.abs(H).max():.4g}")
        print(f"  Gradient: |g|max={np.abs(np.asarray(g)).max():.4g}")
        payload[f"{name}_hessian"] = H
        payload[f"{name}_gradient"] = np.asarray(g)
    for name, (A, lb, ub) in constraints.items():
        A, lb, ub = map(np.asarray, (A, lb, ub))
        print(f"========= {name} =========")
        print(f"  A: {A.shape}, nnz={int(np.count_nonzero(A))}")
        print(f"  bounds: [{lb.min():.4g}, {ub.max():.4g}], "
              f"equality rows={int(np.sum(ub - lb < 1e-12))}")
        payload[f"{name}_matrix"] = A
        payload[f"{name}_lb"] = lb
        payload[f"{name}_ub"] = ub

    H_sum = sum(H for H, _ in blocks.values())
    g_sum = sum(np.asarray(g) for _, g in blocks.values())
    print("=========== Recap ===========")
    print(f"  N Optimization Variables : {cfg.n_var}")
    print(f"  N Constraints : {cfg.n_constraints}")
    np.testing.assert_allclose(H_sum, np.asarray(assembly.build_hessian(cfg)),
                               atol=1e-9)
    print("  sum(per-block H) == build_hessian  OK")
    payload["hessian"] = H_sum
    payload["gradient"] = g_sum

    out = sys.argv[1] if len(sys.argv) > 1 else "debug_qp_dump.npz"
    np.savez_compressed(out, **payload)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
