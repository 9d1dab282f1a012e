"""Batched extended Kalman filter over per-jet (T, Ṫ) states.

The reference builds one CasADi EKF per jet with symbolic Jacobians of the
discrete 13-coefficient jet model and loops them in Python
(mujoco_lib/jet_kalman_filter.py:4-81). Here a single EKF is written once,
Jacobians come from ``jax.jacfwd`` of the same discrete model
(:func:`ironcub_mpc_tpu.ops.jet_model.step`), and `vmap` runs all 4 jets —
and all scenarios — in lockstep.

Measurement model: z = [T, Ṫ] from the LSTM plant model, H = I
(jet_kalman_filter.py:56-65).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import jet_model as jm


class EKFState(NamedTuple):
    x: jnp.ndarray   # [..., 4, 2] per-jet (T, Ṫ)
    P: jnp.ndarray   # [..., 4, 2, 2] covariances


class JetEKF:
    """Per-jet EKF; R/Q/P0 diagonal scales match the reference defaults
    (ironcub_mujoco_simulator.py:54-57)."""

    def __init__(self, dt: float, r=0.5, q=0.1, p0=0.1, dtype=jnp.float32):
        self.dt = dt
        self.R = jnp.eye(2, dtype=dtype) * r
        self.Q = jnp.eye(2, dtype=dtype) * q
        self.P0 = jnp.eye(2, dtype=dtype) * p0
        self.dtype = dtype

    def init(self, thrust0) -> EKFState:
        x = jnp.stack([jnp.asarray(thrust0, self.dtype),
                       jnp.zeros_like(jnp.asarray(thrust0, self.dtype))], axis=-1)
        P = jnp.broadcast_to(self.P0, x.shape[:-1] + (2, 2))
        return EKFState(x=x, P=P)

    def _update_one(self, x, P, u, z):
        """Predict + correct for one jet (vmapped over the jet axis)."""
        x_pred = jnp.stack(jm.step(x[0], x[1], u, self.dt))
        A, _ = jm.step_jacobians(x_pred, u, self.dt)
        # reference quirk: the Jacobian is evaluated at the *predicted* state
        # (jet_kalman_filter.py:58-59 calls A(x,u) after x = f(x,u))
        P_pred = A @ P @ A.T + self.Q
        err = z - x_pred
        S = P_pred + self.R
        # closed-form 2x2 inverse: jnp.linalg.inv lowers batched tiny
        # matrices to a dispatch-bound sequential LU on TPU (this runs per
        # jet per 1 kHz substep inside vmapped sweeps)
        det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
        S_inv = jnp.array([[S[1, 1], -S[0, 1]],
                           [-S[1, 0], S[0, 0]]], P_pred.dtype) / det
        K = P_pred @ S_inv
        x_new = x_pred + K @ err
        P_new = (jnp.eye(2, dtype=P.dtype) - K) @ P_pred
        return x_new, P_new

    def update(self, state: EKFState, throttle, z_thrust, z_thrust_dot):
        """All jets at once: throttle [...,4], measurements [...,4]."""
        z = jnp.stack([z_thrust, z_thrust_dot], axis=-1)
        fn = self._update_one
        for _ in range(state.x.ndim - 1):  # map jet axis + any batch axes
            fn = jax.vmap(fn)
        x, P = fn(state.x, state.P, throttle, z)
        return EKFState(x=x, P=P)
