"""Golden-QP oracle test (SURVEY §4 oracle (b)).

Cross-validates the library's QP assembly — linearize, build_hessian,
build_gradient, assemble_constraints, condense — against committed golden
matrices derived by an INDEPENDENT float64 NumPy transcription of the
reference equations (tests/golden_oracle.py; no shared code with
ironcub_mpc_tpu). A shared sign/frame error between qp/blocks.py and
qp/condensed.py that internal consistency tests cannot see fails here.

The .npz (tests/golden/golden_qp.npz, tools/make_golden_qp.py) stores for
each case both the recorded assembly inputs and the oracle outputs, so the
test also detects tampering/drift by re-running the oracle on the inputs.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

import golden_oracle as oracle
from ironcub_mpc_tpu.core.config import MPCConfig
from ironcub_mpc_tpu.horizon import build_schedule
from ironcub_mpc_tpu.core.types import RobotSnapshot
from ironcub_mpc_tpu.qp import assembly, condensed
from ironcub_mpc_tpu.qp.blocks import LambdaInit, linearize

GOLDEN = Path(__file__).parent / "golden" / "golden_qp.npz"


def _load_case(z, k):
    pre_in, pre_cfg, pre_out = f"c{k}_in_", f"c{k}_cfg_", f"c{k}_out_"
    d, ocfg, out = {}, {}, {}
    for key in z.files:
        if key.startswith(pre_in):
            v = z[key]
            d[key[len(pre_in):]] = v.item() if v.ndim == 0 else v
        elif key.startswith(pre_cfg):
            v = z[key]
            ocfg[key[len(pre_cfg):]] = v.item() if v.ndim == 0 else v
        elif key.startswith(pre_out):
            out[key[len(pre_out):]] = z[key]
    return d, ocfg, out


def _cases():
    z = np.load(GOLDEN, allow_pickle=False)
    return [(k, *_load_case(z, k)) for k in range(int(z["n_cases"]))]


def _mpc_config(d, ocfg):
    return dataclasses.replace(
        MPCConfig(),
        joints_lambda_option=str(d["lambda_option"]),
        use_jet_dynamic=bool(d["use_jet_dynamic"]),
        use_estimated_thrust=bool(d["use_estimated_thrust"]),
        n_iter=int(ocfg["n_iter"]), n_iter_small=int(ocfg["n_iter_small"]),
        control_horizon=int(ocfg["control_horizon"]),
    )


def _snapshot(d):
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    J = d["rel_jac_ang"].shape[2]
    return RobotSnapshot(
        w_R_b=f32(d["w_R_b"]), base_pos=jnp.zeros(3, jnp.float32),
        base_ang_vel_world=f32(d["base_ang_vel_world"]),
        com_pos=f32(d["com_pos"]),
        total_mass=jnp.asarray(d["total_mass"], jnp.float32),
        momentum_body=f32(d["momentum_body"]),
        inertia_locked=f32(d["inertia_locked"]),
        amom_jets_body=jnp.zeros((6, 4), jnp.float32),  # set by _linearized
        jet_axes_world=f32(d["jet_axes_world"]),
        jet_arms_world=f32(d["jet_arms_world"]),
        jac_jets_lin_joints=f32(d["jac_jets_lin_joints"]),
        jac_com_joints=f32(d["jac_com_joints"]),
        rel_jac_lin=f32(d["rel_jac_lin"]),
        rel_jac_ang=f32(d["rel_jac_ang"]),
        joint_pos=jnp.zeros(J, jnp.float32),
        jet_thrusts=f32(d["jet_thrusts"]),
    )


def _amom_body(d):
    """The library consumes amom_jets_body precomputed by the kinodynamics
    layer; rebuild it here the same way compute_snapshot does so the oracle's
    fully-from-axes/arms derivation cross-checks it."""
    axes, arms = d["jet_axes_world"], d["jet_arms_world"]
    amom_w = np.concatenate([axes.T, np.cross(arms, axes).T], axis=0)
    R = d["w_R_b"]
    return np.concatenate([R.T @ amom_w[:3], R.T @ amom_w[3:]], axis=0)


def _linearized(cfg, d):
    snap = _snapshot(d)._replace(
        amom_jets_body=jnp.asarray(_amom_body(d), jnp.float32))
    init = LambdaInit(
        rel_jac_lin=jnp.asarray(d["init_rel_jac_lin"], jnp.float32),
        rel_jac_ang=jnp.asarray(d["init_rel_jac_ang"], jnp.float32),
        jet_axes_world=jnp.asarray(d["init_jet_axes_world"], jnp.float32),
        jet_arms_world=jnp.asarray(d["init_jet_arms_world"], jnp.float32),
        rpy_init=jnp.asarray(d["rpy_init"], jnp.float32),
    )
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return linearize(
        cfg, snap, init, tuple(int(i) for i in d["joint_sel"]),
        alpha_gravity=f32(d["alpha_gravity"]),
        pos_com_ref_now=f32(d["pos_com_ref_now"]),
        est_thrust_dot=f32(d["est_thrust_dot"]),
        thrust_des=f32(d["thrust_des"]),
        thrust_dot_des=f32(d["thrust_dot_des"]),
        throttle_cmd=f32(d["throttle_cmd"]))


def _close(got, want, tol, what):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    scale = max(np.abs(want).max(), 1.0)
    err = np.abs(got - want).max() / scale
    assert err < tol, f"{what}: normalized max err {err:.3e} >= {tol}"


@pytest.mark.parametrize("k,d,ocfg,out", _cases(),
                         ids=lambda v: f"case{v}" if isinstance(v, int) else "")
def test_oracle_reproducible(k, d, ocfg, out):
    """Stored outputs == oracle(stored inputs): guards npz/oracle drift."""
    fresh = oracle.assemble(d, ocfg)
    for key in ("H", "g", "A", "lb", "ub", "Hc", "qc", "lbc", "ubc"):
        np.testing.assert_allclose(fresh[key], out[key], rtol=1e-12,
                                   atol=1e-12, err_msg=key)


@pytest.mark.parametrize("k,d,ocfg,out", _cases(),
                         ids=lambda v: f"case{v}" if isinstance(v, int) else "")
def test_linearization_matches_golden(k, d, ocfg, out):
    cfg = _mpc_config(d, ocfg)
    lin = _linearized(cfg, d)
    _close(lin.Ac, out["Ac"], 2e-5, "Ac")
    _close(lin.BJ, out["BJ"], 2e-5, "BJ")
    _close(lin.BT, out["BT"], 2e-5, "BT")
    _close(lin.c, out["c"], 2e-5, "c")


@pytest.mark.parametrize("k,d,ocfg,out", _cases(),
                         ids=lambda v: f"case{v}" if isinstance(v, int) else "")
def test_full_space_qp_matches_golden(k, d, ocfg, out):
    cfg = _mpc_config(d, ocfg)
    sched = build_schedule(cfg)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    H = assembly.build_hessian(cfg)
    _close(H, out["H"], 1e-9, "H")  # both sides assemble from config exactly

    state_ref = assembly.build_state_reference(
        cfg, f32(d["win_pos"]), f32(d["win_lin"]), f32(d["win_rpy"]),
        f32(d["win_ang"]))
    _close(state_ref.T, out["state_ref"].T, 1e-6, "state_ref")
    g = assembly.build_gradient(
        cfg, jnp.asarray(assembly.state_weight_matrix(cfg), jnp.float32),
        state_ref, f32(d["joint_pos_ctrl"]), f32(d["joint_pos_ref_ctrl"]),
        f32(d["throttle_cmd"]))
    _close(g, out["g"], 2e-6, "g")

    lin = _linearized(cfg, d)
    x0 = jnp.asarray(out["x0"], jnp.float32)
    A, lb, ub = assembly.assemble_constraints(
        cfg, sched, lin, x0, jnp.asarray(bool(d["pin_first_knot"])),
        f32(d["throttle_cmd"]))
    _close(A, out["A"], 2e-5, "A")
    _close(lb, out["lb"], 2e-5, "lb")
    _close(ub, out["ub"], 2e-5, "ub")


@pytest.mark.parametrize("k,d,ocfg,out", _cases(),
                         ids=lambda v: f"case{v}" if isinstance(v, int) else "")
def test_condensed_qp_matches_golden(k, d, ocfg, out):
    cfg = _mpc_config(d, ocfg)
    sched = build_schedule(cfg)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    lin = _linearized(cfg, d)
    state_ref = assembly.build_state_reference(
        cfg, f32(d["win_pos"]), f32(d["win_lin"]), f32(d["win_rpy"]),
        f32(d["win_ang"]))
    q_diag = jnp.diagonal(jnp.asarray(assembly.state_weight_matrix(cfg),
                                      jnp.float32))
    jreg = cfg.weight_regularization_joint_pos * (
        f32(d["joint_pos_ctrl"]) - f32(d["joint_pos_ref_ctrl"]))
    from ironcub_mpc_tpu.ops import jet_model as jm
    tgrad = -cfg.weight_initial_throttle * jm.throttle_to_v(
        f32(d["throttle_cmd"]))
    qp = condensed.condense(
        cfg, sched, lin, jnp.asarray(out["x0"], jnp.float32), state_ref,
        q_diag, jnp.asarray(condensed.build_hu(cfg), jnp.float32), jreg,
        tgrad, jnp.asarray(bool(d["pin_first_knot"])), f32(d["throttle_cmd"]))
    _close(qp.F, out["F"], 3e-5, "F")
    _close(qp.f, out["f"], 3e-5, "f")
    _close(qp.H, out["Hc"], 5e-5, "Hc")
    _close(qp.q, out["qc"], 5e-5, "qc")
    _close(qp.lb, out["lbc"], 1e-6, "lbc")
    _close(qp.ub, out["ubc"], 1e-6, "ubc")


@pytest.mark.parametrize("k,d,ocfg,out", _cases(),
                         ids=lambda v: f"case{v}" if isinstance(v, int) else "")
def test_solver_kkt_certificate(k, d, ocfg, out):
    """Command-fidelity proxy (BASELINE north star): solve the condensed QP
    and certify OPTIMALITY in float64 against the oracle matrices — KKT
    stationarity, primal feasibility and complementary slackness. Any
    solver that satisfies these on the same QP produces the same commands,
    so this pins our command sequence to the reference's QP solution
    without needing the reference binary."""
    from ironcub_mpc_tpu.ops import admm

    cfg = _mpc_config(d, ocfg)
    Hc = out["Hc"]
    qc = out["qc"]
    lbc, ubc = out["lbc"], out["ubc"]
    nU = Hc.shape[0]
    n_box = lbc.shape[0]
    box0 = nU - n_box

    qp = condensed.CondensedQP(
        H=jnp.asarray(Hc, jnp.float32), q=jnp.asarray(qc, jnp.float32),
        lb=jnp.asarray(lbc, jnp.float32), ub=jnp.asarray(ubc, jnp.float32),
        F=jnp.asarray(out["F"], jnp.float32),
        f=jnp.asarray(out["f"], jnp.float32))
    settings = admm.ADMMSettings(max_iter=250, rho_update_iters=(25, 75, 150),
                                 pallas_mode="off")
    sol = condensed.solve(cfg, qp, settings)
    assert int(sol.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)

    u = np.asarray(sol.u, np.float64)
    y = np.asarray(sol.y, np.float64)
    # KKT in float64 with the ORACLE H, q (independent of our assembly):
    # stationarity: H u + q + Sᵀ y = 0
    grad = Hc @ u + qc
    grad[box0:] += y
    g_scale = max(np.abs(qc).max(), 1.0)
    assert np.abs(grad).max() / g_scale < 2e-4, np.abs(grad).max() / g_scale
    # primal feasibility on the box
    ub_viol = (u[box0:] - ubc).max()
    lb_viol = (lbc - u[box0:]).max()
    assert max(ub_viol, lb_viol) < 1e-4, (lb_viol, ub_viol)
    # complementary slackness: y⁺(ub−z)=0, y⁻(z−lb)=0 (skip equality rows)
    z = np.clip(u[box0:], lbc, ubc)
    ineq = (ubc - lbc) > 1e-9
    comp_hi = np.abs(np.maximum(y, 0.0) * (ubc - z))[ineq].max() if \
        ineq.any() else 0.0
    comp_lo = np.abs(np.minimum(y, 0.0) * (z - lbc))[ineq].max() if \
        ineq.any() else 0.0
    assert max(comp_hi, comp_lo) < 2e-3, (comp_hi, comp_lo)
