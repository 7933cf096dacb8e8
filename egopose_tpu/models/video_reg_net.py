"""VideoRegNet: the state-regression model (mirrors
/root/reference/models/video_reg_net.py).

video frames (or precomputed CNN features when no_cnn) -> per-frame CNN
features -> temporal net (bi-LSTM or TCN) -> MLP -> linear state output.
Layout: time-major sequences (T, B, ...) like the reference; frames NHWC.
"""
from __future__ import annotations

import flax.linen as nn
import jax

from .mlp import MLP
from .mobile_net import MobileNet
from .resnet import ResNet18
from .rnn import RNN
from .tcn import TemporalConvNet


class VideoRegNet(nn.Module):
    out_dim: int
    v_hdim: int = 128
    cnn_fdim: int = 128
    no_cnn: bool = False
    frame_shape: tuple = (224, 224, 3)
    mlp_dim: tuple = (300, 200)
    cnn_type: str = "resnet"
    v_net_type: str = "lstm"
    v_net_param: dict | None = None
    causal: bool = False

    def setup(self):
        if self.no_cnn:
            self.cnn = None
        elif self.cnn_type == "resnet":
            self.cnn = ResNet18(self.cnn_fdim)
        elif self.cnn_type == "mobile":
            self.cnn = MobileNet(self.cnn_fdim)
        if self.v_net_type == "lstm":
            self.v_net = RNN(self.cnn_fdim, self.v_hdim, "lstm",
                             bi_dir=not self.causal)
        elif self.v_net_type == "tcn":
            param = self.v_net_param or {}
            size = param.get("size", [64, 128])
            assert size[-1] == self.v_hdim
            self.v_net = TemporalConvNet(size, param.get("kernel_size", 3),
                                         param.get("dropout", 0.2),
                                         self.causal)
        self.mlp = MLP(tuple(self.mlp_dim), "relu")
        self.linear = nn.Dense(self.out_dim)

    def _temporal(self, feats, train, t_mask=None):
        # feats: (T, B, cnn_fdim); t_mask (T,) flags true-sequence positions
        # when running on a time-shard (parallel/seqpar.py)
        if self.v_net_type == "lstm":
            return self.v_net(feats)
        return self.v_net(feats.transpose(1, 0, 2),
                          deterministic=not train,
                          t_mask=t_mask).transpose(1, 0, 2)

    def cnn_feature(self, frames, train: bool = False):
        """(N, H, W, C) frames -> (N, cnn_fdim) features
        (VideoRegNet.get_cnn_feature, video_reg_net.py:58-59)."""
        return self.cnn(frames, train)

    def __call__(self, x, train: bool = False, t_mask=None):
        """x: (T, B, H, W, C) frames, or (T, B, cnn_fdim) when no_cnn.
        Returns (T, B, out_dim)."""
        if self.cnn is not None:
            t, b = x.shape[:2]
            feats = self.cnn(x.reshape((t * b,) + tuple(self.frame_shape)),
                             train).reshape(t, b, self.cnn_fdim)
        else:
            feats = x
        h = self._temporal(feats, train, t_mask)
        h = self.mlp(h)
        return self.linear(h)
