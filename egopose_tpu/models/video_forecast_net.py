"""Video context network for ego-forecast (mirrors
/root/reference/models/video_forecast_net.py).

Context = the final hidden state of a causal LSTM/TCN over only the
``v_margin`` *past* video frames (fixed per episode, unless ``dynamic_v``),
optionally combined with a per-step state-LSTM (``s_net``).  The reference's
test/train stateful duality becomes two pure entry points:

- ``encode_video(windows)``: (B, margin, feat) -> (B, v_hdim) context
- ``s_step(carry, state)``: one s-LSTM step (used inside the rollout scan)
- ``s_batch(states)``: (T, B, state_dim) -> (T, B, s_hdim) (update phase)
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .rnn import RNN
from .tcn import TemporalConvNet


class VideoForecastNet(nn.Module):
    cnn_feat_dim: int
    state_dim: int
    v_hdim: int = 128
    v_margin: int = 10
    v_net_type: str = "lstm"
    v_net_param: dict | None = None
    s_hdim: int | None = None
    s_net_type: str = "id"
    dynamic_v: bool = False

    @property
    def s_dim(self) -> int:
        return self.state_dim if self.s_hdim is None else self.s_hdim

    @property
    def out_dim(self) -> int:
        return self.v_hdim + self.s_dim

    def setup(self):
        if self.v_net_type == "lstm":
            self.v_net = RNN(self.cnn_feat_dim, self.v_hdim, "lstm",
                             bi_dir=False)
        elif self.v_net_type == "tcn":
            param = self.v_net_param or {}
            size = param.get("size", [64, 128])
            assert size[-1] == self.v_hdim
            self.v_net = TemporalConvNet(size, param.get("kernel_size", 3),
                                         param.get("dropout", 0.2),
                                         causal=True)
        if self.s_net_type == "lstm":
            self.s_net = RNN(self.state_dim, self.s_dim, "lstm", bi_dir=False)

    def _v_seq(self, x):
        """(T, B, feat) -> (T, B, v_hdim)."""
        if self.v_net_type == "lstm":
            return self.v_net(x)
        return self.v_net(x.transpose(1, 0, 2)).transpose(1, 0, 2)

    def encode_video(self, windows: jax.Array) -> jax.Array:
        """(B, W, feat) past-frame windows -> fixed (B, v_hdim) context
        (video_forecast_net.py:58-59: last hidden over v_margin past frames).
        With dynamic_v, returns the full (B, W - v_margin, v_hdim) unroll
        starting at the episode (video_forecast_net.py:97-99)."""
        seq = self._v_seq(windows.transpose(1, 0, 2))  # (W,B,vh)
        if self.dynamic_v:
            return seq[self.v_margin:].transpose(1, 0, 2)
        return seq[-1]

    def s_init_carry(self, batch_shape=(), dtype=jnp.float32):
        if self.s_net_type != "lstm":
            return ()
        h = jnp.zeros(batch_shape + (self.s_dim,), dtype)
        return (h, h)  # LSTM (h, c)

    def s_step(self, carry, state: jax.Array):
        """One per-step s-LSTM step (test mode, video_forecast_net.py:89-92)."""
        if self.s_net_type != "lstm":
            return carry, state
        return self.s_net.step(carry, state)

    def s_batch(self, states: jax.Array) -> jax.Array:
        """(T, B, state_dim) -> (T, B, s_dim) (train mode batch unroll)."""
        if self.s_net_type != "lstm":
            return states
        return self.s_net(states)
