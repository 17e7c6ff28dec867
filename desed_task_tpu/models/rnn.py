"""Bidirectional GRU for TPU (flax.linen + lax.scan).

Re-designs desed_task/nnet/RNN.py (BidirectionalGRU :7-31, a cuDNN nn.GRU
wrapper) as a TPU-friendly scan:

  * The input projection x @ W_ih^T + b_ih for ALL timesteps is hoisted out of
    the recurrence into one large [B*T, in] x [in, 3H] GEMM (MXU-friendly);
    the scan body only contains the [B, H] x [H, 3H] recurrent GEMM and the
    elementwise gate math, which XLA fuses into a single loop step.
  * Gate math matches torch.nn.GRU exactly (r/z/n gate order,
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))), so reference checkpoints
    convert weight-for-weight.
  * Parameters use torch's uniform(-1/sqrt(H), 1/sqrt(H)) init.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_uniform(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


def gru_scan(
    x_gates: jnp.ndarray,  # [B, T, 3H] precomputed input gates (+ b_ih)
    h0: jnp.ndarray,  # [B, H]
    w_hh: jnp.ndarray,  # [3H, H] (torch layout)
    b_hh: jnp.ndarray,  # [3H]
    reverse: bool = False,
) -> jnp.ndarray:
    """Run the GRU recurrence. Returns hidden states [B, T, H]."""
    hidden = h0.shape[-1]
    w_hh_t = w_hh.T  # [H, 3H]

    def step(h, xg):
        hg = h @ w_hh_t + b_hh  # [B, 3H]
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(x_gates, 0, 1)  # [T, B, 3H]
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    del hidden
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


class GRULayer(nn.Module):
    """Single direction GRU layer (torch parameter layout)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):  # x: [B, T, in]
        in_dim = x.shape[-1]
        scale = 1.0 / (self.hidden**0.5)
        w_ih = self.param("weight_ih", _torch_uniform(scale), (3 * self.hidden, in_dim))
        w_hh = self.param("weight_hh", _torch_uniform(scale), (3 * self.hidden, self.hidden))
        b_ih = self.param("bias_ih", _torch_uniform(scale), (3 * self.hidden,))
        b_hh = self.param("bias_hh", _torch_uniform(scale), (3 * self.hidden,))
        x_gates = x @ w_ih.T + b_ih  # hoisted GEMM over all timesteps
        h0 = jnp.zeros((x.shape[0], self.hidden), x.dtype)
        return gru_scan(x_gates, h0, w_hh, b_hh, reverse=self.reverse)


class BidirectionalGRU(nn.Module):
    """Multi-layer bidirectional GRU, output = concat(fwd, bwd) per layer.

    Matches torch.nn.GRU(batch_first=True, bidirectional=True): layer l > 0
    consumes the concatenated bidirectional output of layer l-1; inter-layer
    dropout applies to every layer's output except the last.
    """

    hidden: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for layer in range(self.num_layers):
            fwd = GRULayer(self.hidden, reverse=False, name=f"l{layer}_fwd")(x)
            bwd = GRULayer(self.hidden, reverse=True, name=f"l{layer}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class BidirectionalLSTMCellMath(nn.Module):
    """Single-direction LSTM layer with torch gate order (i, f, g, o)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        scale = 1.0 / (self.hidden**0.5)
        w_ih = self.param("weight_ih", _torch_uniform(scale), (4 * self.hidden, in_dim))
        w_hh = self.param("weight_hh", _torch_uniform(scale), (4 * self.hidden, self.hidden))
        b_ih = self.param("bias_ih", _torch_uniform(scale), (4 * self.hidden,))
        b_hh = self.param("bias_hh", _torch_uniform(scale), (4 * self.hidden,))
        x_gates = x @ w_ih.T + b_ih
        w_hh_t = w_hh.T

        def step(carry, xg):
            h, c = carry
            g = xg + h @ w_hh_t + b_hh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            c = f * c + i * jnp.tanh(gg)
            h = o * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        init = (jnp.zeros((B, self.hidden), x.dtype), jnp.zeros((B, self.hidden), x.dtype))
        xs = jnp.swapaxes(x_gates, 0, 1)
        _, ys = jax.lax.scan(step, init, xs, reverse=self.reverse)
        return jnp.swapaxes(ys, 0, 1)


class BidirectionalLSTM(nn.Module):
    """Parity with reference BidirectionalLSTM (RNN.py:33-53): BiLSTM with
    hidden nHidden//2 per direction followed by a linear embedding to n_out."""

    hidden: int
    n_out: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.hidden // 2
        for layer in range(self.num_layers):
            fwd = BidirectionalLSTMCellMath(h, False, name=f"l{layer}_fwd")(x)
            bwd = BidirectionalLSTMCellMath(h, True, name=f"l{layer}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.n_out)(x)
