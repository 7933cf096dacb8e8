"""LSTM/GRU built on lax.scan (mirrors /root/reference/models/rnn.py).

The reference's stateful 'step' mode becomes an explicit carry; 'batch' mode
is a scan over time (optionally bidirectional).  Gate math matches
torch.nn.LSTMCell / GRUCell so torch checkpoints import directly
(see models/torch_import.py for the gate-ordering mapping).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mlp import torch_linear_init, torch_linear_bias_init


class LSTMCell(nn.Module):
    """torch.nn.LSTMCell-compatible cell: gates ordered (i, f, g, o)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        z = nn.Dense(4 * self.hidden_dim, name="ih",
                     kernel_init=torch_linear_init,
                     bias_init=torch_linear_bias_init)(x) \
            + nn.Dense(4 * self.hidden_dim, name="hh",
                       kernel_init=torch_linear_init,
                       bias_init=torch_linear_bias_init)(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * nn.tanh(g)
        h = nn.sigmoid(o) * nn.tanh(c)
        return (h, c), h


class GRUCell(nn.Module):
    """torch.nn.GRUCell-compatible cell: gates ordered (r, z, n)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, carry, x):
        (h,) = carry
        zi = nn.Dense(3 * self.hidden_dim, name="ih",
                      kernel_init=torch_linear_init,
                      bias_init=torch_linear_bias_init)(x)
        zh = nn.Dense(3 * self.hidden_dim, name="hh",
                      kernel_init=torch_linear_init,
                      bias_init=torch_linear_bias_init)(h)
        ri, zi_, ni = jnp.split(zi, 3, axis=-1)
        rh, zh_, nh = jnp.split(zh, 3, axis=-1)
        r = nn.sigmoid(ri + rh)
        z = nn.sigmoid(zi_ + zh_)
        n = nn.tanh(ni + r * nh)
        h = (1 - z) * n + z * h
        return (h,), h


class RNN(nn.Module):
    """Sequence RNN.  __call__ runs batch mode over (T, B, D) -> (T, B, out);
    ``step`` applies one cell step with an explicit carry (the reference's
    'step' mode, rnn.py:29-36)."""
    input_dim: int
    out_dim: int
    cell_type: str = "lstm"
    bi_dir: bool = False

    @property
    def hidden_dim(self) -> int:
        return self.out_dim // 2 if self.bi_dir else self.out_dim

    def init_carry(self, batch_shape=(), dtype=jnp.float32):
        h = jnp.zeros(batch_shape + (self.hidden_dim,), dtype)
        if self.cell_type == "lstm":
            return (h, h)
        return (h,)

    def setup(self):
        cls = LSTMCell if self.cell_type == "lstm" else GRUCell
        self.rnn_f = cls(self.hidden_dim)
        if self.bi_dir:
            self.rnn_b = cls(self.hidden_dim)

    def _scan_dir(self, cell, x, reverse):
        carry = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, x.shape[1:-1] + a.shape).astype(x.dtype),
            self.init_carry())
        scan = nn.scan(lambda c, carry, xt: c(carry, xt),
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=0, out_axes=0, reverse=reverse)
        _, out = scan(cell, carry, x)
        return out

    def __call__(self, x: jax.Array) -> jax.Array:
        out_f = self._scan_dir(self.rnn_f, x, reverse=False)
        if not self.bi_dir:
            return out_f
        out_b = self._scan_dir(self.rnn_b, x, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1)

    def step(self, carry, x: jax.Array):
        """One forward-cell step (the reference's 'step' mode)."""
        return self.rnn_f(carry, x)
