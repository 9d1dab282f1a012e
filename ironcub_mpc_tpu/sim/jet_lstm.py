"""Learned plant-side jet dynamics: LSTM(2→80) + FC(80→1), batched over jets.

Re-expression of the reference's torch model (mujoco_lib/nn_jet_model.py:3-30):
per step the network sees [thrust_norm, throttle_norm] with a *zero* initial
hidden state (the reference feeds seq_len=1 with no carried state, so the
LSTM degenerates to a gated feedforward cell), predicts normalised Ṫ, and T
integrates explicitly.

The reference loops jets sequentially in torch (nn_jet_model.py:95-107); here
the cell is one fused matmul over all jets at once — and over arbitrary
scenario batches via broadcasting, which is what the Monte-Carlo sweeps need.
Weights load from ``data/jet_lstm_weights.npz`` (converted from the
reference checkpoint by tools/convert_data.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class LSTMJetModel:
    """Stateless (per reference semantics) LSTM jet-thrust model."""

    def __init__(self, weights_path: str = "data/jet_lstm_weights.npz",
                 dtype=jnp.float32):
        raw = np.load(weights_path)
        self.w_ih = jnp.asarray(raw["w_ih"], dtype)      # [4H, 2]
        self.w_hh = jnp.asarray(raw["w_hh"], dtype)      # [4H, H]
        self.b = jnp.asarray(raw["b_ih"] + raw["b_hh"], dtype)  # [4H]
        self.fc_w = jnp.asarray(raw["fc_w"], dtype)      # [1, H]
        self.fc_b = jnp.asarray(raw["fc_b"], dtype)      # [1]
        self.thrust_mean = float(raw["thrust_mean"])
        self.thrust_std = float(raw["thrust_std"])
        self.throttle_mean = float(raw["throttle_mean"])
        self.throttle_std = float(raw["throttle_std"])
        self.hidden = self.w_hh.shape[1]

    def _cell(self, x):
        """Zero-state LSTM cell + FC head. x: [..., 2] -> Ṫ_norm [...]."""
        gates = x @ self.w_ih.T + self.b                  # [..., 4H]
        H = self.hidden
        i = jnp.reciprocal(1.0 + jnp.exp(-gates[..., 0:H]))
        # forget gate unused with zero cell state
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jnp.reciprocal(1.0 + jnp.exp(-gates[..., 3 * H:4 * H]))
        c = i * g
        h = o * jnp.tanh(c)
        return (h @ self.fc_w[0] + self.fc_b[0])

    def step(self, thrust, throttle, dt):
        """One 1 kHz step: (T[N], u[N]) -> (T_next[N], Ṫ[N]) in Newtons.

        Broadcasts over leading axes (jets, scenario batches).
        """
        t_n = (thrust - self.thrust_mean) / self.thrust_std
        u_n = (throttle - self.throttle_mean) / self.throttle_std
        x = jnp.stack([t_n, u_n], axis=-1)
        td_n = self._cell(x)
        t_next_n = t_n + td_n * dt
        return (t_next_n * self.thrust_std + self.thrust_mean,
                td_n * self.thrust_std)
