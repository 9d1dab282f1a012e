#!/usr/bin/env python
"""Record golden-QP cases: inputs + independent float64 oracle outputs.

For each case this records the exact inputs the QP assembly layer consumes at
one tick (snapshot primitives, post-shift reference window, multi-rate pin,
carried commands) and the full H, g, A, lb, ub plus condensed H_c, q_c
derived by the independent NumPy oracle (tests/golden_oracle.py — a fresh
float64 transcription of the reference equations sharing no code with the
library). Output: tests/golden/golden_qp.npz, consumed by
tests/test_golden_qp.py.

Run on CPU:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
             python tools/make_golden_qp.py
"""

import dataclasses
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import jax.numpy as jnp

import golden_oracle as oracle
import __graft_entry__ as ge
from ironcub_mpc_tpu.core.config import (MPCConfig, RobotConfig, SimConfig,
                                         joint_selector)
from ironcub_mpc_tpu.dynamics import (KinDyn, load_ironcub_model,
                                      compute_snapshot)
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.ops import admm
from ironcub_mpc_tpu.qp import mpc as vs_mpc


def build_snapshot(kd, rc, seed, q0):
    """A non-trivial robot state: rotated base, nonzero twist, uneven
    thrusts, perturbed posture."""
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-0.25, 0.25, 3)
    cr, sr = np.cos(rpy), np.sin(rpy)
    Rx = np.array([[1, 0, 0], [0, cr[0], -sr[0]], [0, sr[0], cr[0]]])
    Ry = np.array([[cr[1], 0, sr[1]], [0, 1, 0], [-sr[1], 0, cr[1]]])
    Rz = np.array([[cr[2], -sr[2], 0], [sr[2], cr[2], 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    base_p = np.array([0.1, -0.2, 0.9]) + 0.1 * rng.standard_normal(3)
    base_vel = 0.3 * rng.standard_normal(6)
    q = np.asarray(q0) + 0.15 * rng.standard_normal(len(q0))
    qd = 0.2 * rng.standard_normal(len(q0))
    thrusts = 90.0 + 25.0 * rng.standard_normal(4)
    return compute_snapshot(
        kd, rc.jets_list, jnp.asarray(R, jnp.float32),
        jnp.asarray(base_p, jnp.float32), jnp.asarray(base_vel, jnp.float32),
        jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32),
        jnp.asarray(thrusts, jnp.float32))


def record_case(cfg, sched, sel, settings, problem, carry, snap,
                est_thrust_dot, n_warm_ticks, warm_snap=None):
    """Run n_warm_ticks full ticks to evolve the carry, then capture the
    assembly inputs of the NEXT tick via _tick_prep."""
    warm_snap = snap if warm_snap is None else warm_snap
    for _ in range(n_warm_ticks):
        carry, _ = vs_mpc.mpc_tick(cfg, sched, sel, settings, problem,
                                   carry, warm_snap, est_thrust_dot)
    pre_carry = carry
    carry_aft, prep = vs_mpc._tick_prep(cfg, sel, problem, pre_carry, snap,
                                        est_thrust_dot)
    f64 = lambda a: np.asarray(a, np.float64)
    sel_np = np.asarray(sel, np.int64)
    d = dict(
        # snapshot primitives
        w_R_b=f64(snap.w_R_b),
        base_ang_vel_world=f64(snap.base_ang_vel_world),
        com_pos=f64(snap.com_pos),
        total_mass=float(snap.total_mass),
        momentum_body=f64(snap.momentum_body),
        inertia_locked=f64(snap.inertia_locked),
        jet_axes_world=f64(snap.jet_axes_world),
        jet_arms_world=f64(snap.jet_arms_world),
        jet_thrusts=f64(snap.jet_thrusts),
        rel_jac_lin=f64(snap.rel_jac_lin),
        rel_jac_ang=f64(snap.rel_jac_ang),
        jac_jets_lin_joints=f64(snap.jac_jets_lin_joints),
        jac_com_joints=f64(snap.jac_com_joints),
        # configure-time constants
        init_rel_jac_lin=f64(problem.lambda_init.rel_jac_lin),
        init_rel_jac_ang=f64(problem.lambda_init.rel_jac_ang),
        init_jet_axes_world=f64(problem.lambda_init.jet_axes_world),
        init_jet_arms_world=f64(problem.lambda_init.jet_arms_world),
        rpy_init=f64(problem.rpy_init),
        joint_pos_ref_ctrl=f64(problem.joint_pos_ref_ctrl),
        joint_sel=sel_np,
        # per-tick carried inputs (post reference-shift)
        win_pos=f64(carry_aft.pos_com_ref),
        win_lin=f64(carry_aft.lin_mom_ref),
        win_rpy=f64(carry_aft.rpy_ref),
        win_ang=f64(carry_aft.ang_mom_ref),
        pos_com_ref_now=f64(carry_aft.pos_com_ref_now),
        rpy_ref_now=f64(carry_aft.rpy_ref_now),
        alpha_gravity=float(carry_aft.alpha_gravity),
        rpy_unwrapped=f64(prep.x0[oracle.RPY]),
        thrust_des=f64(pre_carry.thrust_des),
        thrust_dot_des=f64(pre_carry.thrust_dot_des),
        throttle_cmd=f64(pre_carry.throttle_cmd),
        joint_pos_ctrl=f64(pre_carry.joints_pos_ref)[sel_np],
        est_thrust_dot=f64(est_thrust_dot),
        pin_first_knot=bool(prep.pin),
        # options
        lambda_option=cfg.joints_lambda_option,
        use_jet_dynamic=cfg.use_jet_dynamic,
        use_estimated_thrust=cfg.use_estimated_thrust,
    )
    ocfg = dict(
        n_iter=cfg.n_iter, n_iter_small=cfg.n_iter_small,
        control_horizon=cfg.control_horizon,
        dt_small=cfg.period_mpc_small_steps,
        dt_large=cfg.period_mpc_large_steps,
        w_com=np.asarray(cfg.weight_com_pos),
        w_com_err=np.asarray(cfg.weight_com_pos_error),
        w_lin=np.asarray(cfg.weight_lin_mom),
        w_rpy=np.asarray(cfg.weight_rpy),
        w_rpy_err=np.asarray(cfg.weight_rpy_error),
        w_ang=np.asarray(cfg.weight_ang_mom),
        w_dq=np.asarray(cfg.weight_delta_joint),
        w_throttle=cfg.weight_throttle,
        w_throttle0=cfg.weight_initial_throttle,
        w_jreg=cfg.weight_regularization_joint_pos,
        throttle_min=cfg.throttle_min, throttle_max=cfg.throttle_max,
    )
    out = oracle.assemble(d, ocfg)
    return d, ocfg, out


def main():
    rc = RobotConfig()
    model = load_ironcub_model()
    kd = KinDyn(model)
    q0 = np.radians(SimConfig().initial_position_deg)

    cases = []
    # case 0: stock config at configure-time hover state, no warm ticks
    cfg0 = MPCConfig()
    settings = admm.ADMMSettings(max_iter=40, rho_update_iters=(15,),
                                 pallas_mode="off")
    _, sched0, sel0, st0, problem0, carry0, snap0, _ = ge._setup(
        cfg=cfg0, settings=settings)
    cases.append(record_case(cfg0, sched0, sel0, st0, problem0, carry0,
                             snap0, jnp.zeros(4), 0))

    # case 1: stock config, perturbed state, 3 warm ticks (pin active)
    snap1 = build_snapshot(kd, rc, 11, q0)
    cases.append(record_case(cfg0, sched0, sel0, st0, problem0, carry0,
                             snap1, jnp.asarray([1.5, -2.0, 0.7, 3.1],
                                                jnp.float32), 3,
                             warm_snap=snap0))

    # case 2: stock config, 19 warm ticks — window shifted once and the
    # recording tick is the 20th (throttle-update tick: pin released)
    snap2 = build_snapshot(kd, rc, 22, q0)
    cases.append(record_case(cfg0, sched0, sel0, st0, problem0, carry0,
                             snap2, jnp.zeros(4), 19, warm_snap=snap0))

    # case 3: constant-lambda option + commanded (not estimated) thrust
    cfg3 = dataclasses.replace(cfg0, joints_lambda_option="constant",
                               use_estimated_thrust=False)
    _, sched3, sel3, st3, problem3, carry3, snap3, _ = ge._setup(
        cfg=cfg3, settings=settings)
    snap3b = build_snapshot(kd, rc, 33, q0)
    cases.append(record_case(cfg3, sched3, sel3, st3, problem3, carry3,
                             snap3b, jnp.zeros(4), 2, warm_snap=snap3))

    payload = {"n_cases": np.asarray(len(cases))}
    for k, (d, ocfg, out) in enumerate(cases):
        for name, val in d.items():
            if isinstance(val, (str, bool)):
                payload[f"c{k}_in_{name}"] = np.asarray(val)
            else:
                payload[f"c{k}_in_{name}"] = np.asarray(val)
        for name, val in ocfg.items():
            payload[f"c{k}_cfg_{name}"] = np.asarray(val)
        for name, val in out.items():
            payload[f"c{k}_out_{name}"] = np.asarray(val)
    dest = ROOT / "tests" / "golden" / "golden_qp.npz"
    dest.parent.mkdir(exist_ok=True)
    np.savez_compressed(dest, **payload)
    size_kb = dest.stat().st_size / 1024
    print(f"wrote {dest} ({len(cases)} cases, {size_kb:.0f} KiB)")


if __name__ == "__main__":
    main()
