"""Unit tests for the polynomial jet model.

Oracles: the closed-form expressions of the reference identified model
(utils/src/JetModel.cpp:29-109) re-evaluated in NumPy, plus autodiff
cross-checks of the hand partials.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ironcub_mpc_tpu.ops import jet_model as jm

C = jm.U2T_COEFF


def _f_ref(t, td):
    return C[0] + C[1] * t + C[2] * td + C[3] * t * td + C[4] * t**2 + C[5] * td**2


def _g_ref(t, td):
    return C[6] + C[7] * t + C[8] * td + C[9] * t * td + C[10] * t**2 + C[11] * td**2


@pytest.mark.parametrize("t,td", [(0.0, 0.0), (0.5, -0.3), (-1.2, 2.0), (2.0, 1.0)])
def test_polynomials_match_closed_form(t, td):
    np.testing.assert_allclose(jm.f(t, td), _f_ref(t, td), rtol=1e-6)
    np.testing.assert_allclose(jm.g(t, td), _g_ref(t, td), rtol=1e-6)


def test_hand_partials_match_autodiff():
    pts = np.random.default_rng(0).normal(size=(16, 2)).astype(np.float32)
    t, td = jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])
    # one compile: vmap all four grads over the batch of points
    @jax.jit
    def grads(t, td):
        gf0 = jax.vmap(jax.grad(jm.f, 0))(t, td)
        gf1 = jax.vmap(jax.grad(jm.f, 1))(t, td)
        gg0 = jax.vmap(jax.grad(jm.g, 0))(t, td)
        gg1 = jax.vmap(jax.grad(jm.g, 1))(t, td)
        return gf0, gf1, gg0, gg1
    gf0, gf1, gg0, gg1 = grads(t, td)
    np.testing.assert_allclose(jm.df_dt(t, td), gf0, rtol=1e-4)
    np.testing.assert_allclose(jm.df_dtd(t, td), gf1, rtol=1e-4)
    np.testing.assert_allclose(jm.dg_dt(t, td), gg0, rtol=1e-4)
    np.testing.assert_allclose(jm.dg_dtd(t, td), gg1, rtol=1e-4)


def test_dh_partials_match_autodiff_in_physical_units():
    h = jm.thrust_ddot
    T = jnp.array([10.0, 100.0, 220.0])
    Td = jnp.array([0.0, 30.0, -10.0])
    u = jnp.array([20.0, 60.0, 95.0])
    @jax.jit
    def grads(T, Td, u):
        return (jax.vmap(jax.grad(h, 0))(T, Td, u),
                jax.vmap(jax.grad(h, 1))(T, Td, u))
    g0, g1 = grads(T, Td, u)
    # dh/dT and dh/dTd are dimensionless; autodiff of the Newton-space h.
    np.testing.assert_allclose(jm.dh_dthrust(T, Td, u), g0, rtol=1e-3)
    np.testing.assert_allclose(jm.dh_dthrust_dot(T, Td, u), g1, rtol=1e-3)


def test_throttle_roundtrip():
    u = jnp.linspace(0.0, 100.0, 21)
    v_std = jm.throttle_to_v(u)
    u_back = jm.destandardize_throttle(v_std)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-3)


def test_throttle_inversion_clamps():
    # far out-of-range v values must clamp to [0, 100] (JetModel.cpp:99-107)
    lo = jm.destandardize_throttle(jm.throttle_to_v(jnp.array(-50.0)))
    hi = jm.destandardize_throttle(jm.throttle_to_v(jnp.array(150.0)))
    assert float(lo) == 0.0
    assert float(hi) == 100.0


def test_standardization_roundtrip():
    T = jnp.array([0.0, 50.0, 220.0])
    np.testing.assert_allclose(
        np.asarray(jm.destandardize_thrust(jm.standardize_thrust(T))), np.asarray(T),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jm.destandardize_thrust_dot(jm.standardize_thrust_dot(T))),
        np.asarray(T), rtol=1e-6)


def test_vectorized_over_batch():
    T = jnp.ones((32, 4)) * 50.0
    Td = jnp.zeros((32, 4))
    u = jnp.ones((32, 4)) * 40.0
    out = jm.thrust_ddot(T, Td, u)
    assert out.shape == (32, 4)
    # all batch entries identical
    np.testing.assert_allclose(np.asarray(out), np.asarray(out)[0, 0], rtol=1e-6)


def test_step_jacobians_finite():
    x = jnp.array([50.0, 5.0])
    A, B = jm.step_jacobians(x, jnp.array(40.0), 0.001)
    assert A.shape == (2, 2) and B.shape == (2,)
    assert np.all(np.isfinite(np.asarray(A)))
    # T row: dT/dT ~ 1 + O(dt^2), dT/dTd ~ dt
    np.testing.assert_allclose(A[0, 0], 1.0, atol=1e-2)
    np.testing.assert_allclose(A[0, 1], 0.001, atol=1e-4)
