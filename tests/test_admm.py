"""Tests for the batched OSQP-style ADMM solver.

Oracles: closed-form solutions (separable box QPs, equality-constrained KKT
systems solved with NumPy) and brute-force active-set enumeration for small
general QPs — no external QP library is assumed.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ironcub_mpc_tpu.ops import admm

SET = admm.ADMMSettings(max_iter=400)
F64 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def _solve_np_active_set(P, q, A, l, u):
    """Brute-force exact QP solve by active-set enumeration (small m only)."""
    m = A.shape[0]
    best, best_val = None, np.inf
    for mask in itertools.product([0, 1, 2], repeat=m):  # 0 free, 1 lower, 2 upper
        act = [i for i in range(m) if mask[i] != 0]
        b = np.array([l[i] if mask[i] == 1 else u[i] for i in act])
        Aa = A[act]
        n = P.shape[0]
        K = np.block([[P, Aa.T], [Aa, np.zeros((len(act), len(act)))]]) if act else P
        rhs = np.concatenate([-q, b]) if act else -q
        try:
            sol = np.linalg.solve(K, rhs)
        except np.linalg.LinAlgError:
            continue
        x = sol[:n]
        lam = sol[n:]
        Ax = A @ x
        if np.any(Ax < l - 1e-7) or np.any(Ax > u + 1e-7):
            continue
        # dual feasibility: lower-active => y<=0, upper-active => y>=0
        ok = True
        for k, i in enumerate(act):
            if mask[i] == 1 and lam[k] > 1e-7 and not np.isclose(l[i], u[i]):
                ok = False
            if mask[i] == 2 and lam[k] < -1e-7 and not np.isclose(l[i], u[i]):
                ok = False
        if not ok:
            continue
        val = 0.5 * x @ P @ x + q @ x
        if val < best_val - 1e-12:
            best_val, best = val, x
    return best


def test_separable_box_qp():
    diag = jnp.array([1.0, 2.0, 4.0, 0.5])
    P = jnp.diag(diag)
    q = jnp.array([1.0, -4.0, 0.5, 2.0])
    A = jnp.eye(4)
    l = jnp.array([-1.0, -1.0, -1.0, -1.0])
    u = jnp.array([1.0, 1.0, 1.0, 1.0])
    sol = admm.solve(P, q, A, l, u, SET)
    expected = np.clip(-np.asarray(q) / np.asarray(diag), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(sol.x), expected, atol=2e-3)
    assert int(sol.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)


def test_equality_constrained_matches_kkt():
    rng = np.random.default_rng(1)
    n, m = 8, 3
    M = rng.normal(size=(n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    xe = np.linalg.solve(K, np.concatenate([-q, b]))[:n]
    sol = admm.solve(jnp.asarray(P, F64), jnp.asarray(q, F64), jnp.asarray(A, F64),
                     jnp.asarray(b, F64), jnp.asarray(b, F64), SET)
    np.testing.assert_allclose(np.asarray(sol.x), xe, atol=5e-3, rtol=1e-3)
    assert int(sol.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)


def test_general_qp_matches_active_set_enumeration():
    rng = np.random.default_rng(2)
    n, m = 5, 4
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = -np.abs(rng.normal(size=m)) * 0.2
    u = np.abs(rng.normal(size=m)) * 0.2
    x_ref = _solve_np_active_set(P, q, A, l, u)
    assert x_ref is not None
    sol = admm.solve(*(jnp.asarray(v, F64) for v in (P, q, A, l, u)), SET)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=5e-3, rtol=1e-2)


def test_kkt_optimality_of_mpc_scale_problem():
    """A 588-var random sparse-structured QP: verify KKT residuals directly."""
    rng = np.random.default_rng(3)
    n, m = 120, 90
    M = rng.normal(size=(n, n)) * 0.1
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n)) * 0.5
    l = np.where(np.arange(m) < 40, rng.normal(size=m) * 0.1, -1.0)
    u = np.where(np.arange(m) < 40, l, 1.0)  # first 40 rows equalities
    sol = admm.solve(*(jnp.asarray(v, F64) for v in (P, q, A, l, u)),
                     admm.ADMMSettings(max_iter=600))
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    # stationarity
    station = P @ x + q + A.T @ y
    assert np.max(np.abs(station)) < 5e-2
    # primal feasibility
    Ax = A @ x
    assert np.all(Ax > l - 1e-2) and np.all(Ax < u + 1e-2)
    assert int(sol.status) in (admm.SOLVED, admm.SOLVED_INACCURATE)


def test_primal_infeasible_detection():
    P = jnp.eye(2)
    q = jnp.zeros(2)
    # x0 >= 1 and x0 <= -1 simultaneously: infeasible
    A = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    l = jnp.array([1.0, -1e20])
    u = jnp.array([1e20, -1.0])
    sol = admm.solve(P, q, A, l, u, admm.ADMMSettings(max_iter=400, polish=False))
    assert int(sol.status) == admm.PRIMAL_INFEASIBLE


def test_batched_vmap_solves():
    rng = np.random.default_rng(4)
    B, n, m = 8, 6, 5
    Ms = rng.normal(size=(B, n, n))
    P = jnp.asarray(np.einsum("bij,bkj->bik", Ms, Ms) + np.eye(n), F64)
    q = jnp.asarray(rng.normal(size=(B, n)), F64)
    A = jnp.asarray(rng.normal(size=(B, m, n)), F64)
    l = jnp.asarray(-np.abs(rng.normal(size=(B, m))), F64)
    u = jnp.asarray(np.abs(rng.normal(size=(B, m))), F64)
    batched = jax.jit(jax.vmap(lambda P, q, A, l, u: admm.solve(P, q, A, l, u, SET)))
    sols = batched(P, q, A, l, u)
    assert sols.x.shape == (B, n)
    for b in range(B):
        x_ref = _solve_np_active_set(*(np.asarray(v[b]) for v in (P, q, A, l, u)))
        if x_ref is not None:
            np.testing.assert_allclose(np.asarray(sols.x[b]), x_ref, atol=1e-2,
                                       rtol=5e-2)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(5)
    n, m = 20, 15
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), F64)
    q = jnp.asarray(rng.normal(size=n), F64)
    A = jnp.asarray(rng.normal(size=(m, n)), F64)
    l = jnp.asarray(-np.abs(rng.normal(size=m)), F64)
    u = jnp.asarray(np.abs(rng.normal(size=m)), F64)
    s = admm.ADMMSettings(max_iter=1000, polish=False)
    cold = admm.solve_adaptive(P, q, A, l, u, s, check_every=10)
    warm = admm.solve_adaptive(P, q, A, l, u, s, x0=cold.x, y0=cold.y,
                               check_every=10)
    assert int(warm.iterations) <= int(cold.iterations)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x), atol=5e-3)


def test_scaling_reuse():
    """prepare() with a precomputed scaling must equal fresh scaling result."""
    rng = np.random.default_rng(6)
    n, m = 6, 4
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), F64)
    q = jnp.asarray(rng.normal(size=n), F64)
    A = jnp.asarray(rng.normal(size=(m, n)), F64)
    l = jnp.asarray(-np.ones(m), F64)
    u = jnp.asarray(np.ones(m), F64)
    data1 = admm.prepare(P, q, A, l, u, SET)
    data2 = admm.prepare(P, q, A, l, u, SET, scaling=data1.scaling)
    np.testing.assert_allclose(np.asarray(data1.P), np.asarray(data2.P), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(data1.l), np.asarray(data2.l), rtol=1e-5)
    sol1 = admm.solve_prepared(data1, SET)
    sol2 = admm.solve_prepared(data2, SET)
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol2.x), atol=1e-4)
