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

from .rnn import RNN
from .tcn import TemporalConvNet


class VideoStateNet(nn.Module):
    cnn_feat_dim: int
    v_hdim: int = 128
    v_margin: int = 10
    v_net_type: str = "lstm"
    v_net_param: dict | None = None
    causal: bool = False

    @nn.compact
    def __call__(self, windows: jax.Array, deterministic: bool = True) -> jax.Array:
        """(N, W, feat) windows -> (N, W - 2*v_margin, v_hdim) context."""
        if self.v_net_type == "lstm":
            net = RNN(self.cnn_feat_dim, self.v_hdim, "lstm",
                      bi_dir=not self.causal, name="v_net")
            out = net(windows.transpose(1, 0, 2)).transpose(1, 0, 2)
        elif self.v_net_type == "tcn":
            param = self.v_net_param or {}
            size = param.get("size", [64, 128])
            assert size[-1] == self.v_hdim
            net = TemporalConvNet(size, param.get("kernel_size", 3),
                                  param.get("dropout", 0.2), self.causal,
                                  name="v_net")
            out = net(windows, deterministic)
        else:
            raise ValueError(self.v_net_type)
        return out[:, self.v_margin:-self.v_margin]
