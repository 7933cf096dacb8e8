"""Video context network for ego-mimic (mirrors
/root/reference/models/video_state_net.py).

The reference's stateful test/train mode duality collapses into one pure
function: encode a window of per-frame CNN features into per-step context
vectors, trimming ``v_margin`` frames on both sides.  In this framework every
episode window has a uniform static length (the sampler re-anchors episodes
at segment boundaries), so the reference's ragged scatter/gather packing
(video_state_net.py:40-59) is unnecessary.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .rnn import RNN
from .tcn import TemporalConvNet


class VideoStateNet(nn.Module):
    cnn_feat_dim: int
    v_hdim: int = 128
    v_margin: int = 10
    v_net_type: str = "lstm"
    v_net_param: dict | None = None
    causal: bool = False

    def setup(self):
        if self.v_net_type == "lstm":
            self.v_net = RNN(self.cnn_feat_dim, self.v_hdim, "lstm",
                             bi_dir=not self.causal)
        elif self.v_net_type == "tcn":
            param = self.v_net_param or {}
            size = param.get("size", [64, 128])
            assert size[-1] == self.v_hdim
            self.v_net = TemporalConvNet(size, param.get("kernel_size", 3),
                                         param.get("dropout", 0.2),
                                         self.causal)
        else:
            raise ValueError(self.v_net_type)

    def __call__(self, windows: jax.Array, deterministic: bool = True) -> jax.Array:
        """(N, W, feat) windows -> (N, W - 2*v_margin, v_hdim) context."""
        if self.v_net_type == "lstm":
            out = self.v_net(windows.transpose(1, 0, 2)).transpose(1, 0, 2)
        else:
            out = self.v_net(windows, deterministic)
        return out[:, self.v_margin:-self.v_margin]

    def causal_encode(self, feats: jax.Array) -> jax.Array:
        """Online-inference context: at step t the net sees video only up to
        frame ``t + 2*v_margin`` (v_margin frames of lookahead), matching the
        reference's per-step re-initialization
        (ego_mimic_eval.py:143-145: initialize(cnn_feat[:t+2m+1]); net.t=t).

        The reference recomputes the whole context per step -- O(T^2).  For a
        causal net a prefix run equals the full run at every kept position,
        so the full pass IS the answer; for a bi-LSTM only the backward pass
        depends on the prefix end, and restarting it from a zero carry
        ``v_margin`` frames ahead of each output position reproduces the
        per-step recomputation exactly in O(T * v_margin).
        """
        m = self.v_margin
        if self.causal:
            return self(feats)
        if self.v_net_type != "lstm":
            raise NotImplementedError(
                "--causal with a non-causal TCN context net would need the "
                "reference's per-prefix recomputation; use causal: true")
        x = feats.transpose(1, 0, 2)               # (T, N, F)
        t_len, n = x.shape[0], x.shape[1]
        l_out = t_len - 2 * m
        out_f = self.v_net._scan_dir(self.v_net.rnn_f, x, reverse=False)
        # windows x[i+m : i+2m+1] for each output position i -> backward scan
        idx = jnp.arange(l_out)[:, None] + m + jnp.arange(m + 1)[None]
        win = x[idx]                                # (L, m+1, N, F)
        win = win.transpose(1, 0, 2, 3).reshape(m + 1, l_out * n, -1)
        carry = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (l_out * n,) + a.shape).astype(x.dtype),
            self.v_net.init_carry())
        h = None
        for j in range(m, -1, -1):                  # backward over the window
            carry, h = self.v_net.rnn_b(carry, win[j])
        out_b = h.reshape(l_out, n, -1)
        out = jnp.concatenate([out_f[m:t_len - m], out_b], axis=-1)
        return out.transpose(1, 0, 2)               # (N, L, v_hdim)
