"""Temporal convolutional network (mirrors /root/reference/models/tcn.py).

Dilated residual conv blocks with weight normalization; ``causal`` selects
asymmetric (left-only) padding like the reference's Chomp1d.  Layout is
(batch, time, channels) -- the reference's NCL permutes
(video_state_net.py:73-78) are layout choices, not semantics, and disappear.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


class TemporalBlock(nn.Module):
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float
    causal: bool

    @nn.compact
    def __call__(self, x, deterministic: bool = True, t_mask=None):
        pad = (self.kernel_size - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad // 2)]
        conv_init = nn.initializers.normal(0.01)  # tcn.py:42-46

        def conv(name):
            return nn.WeightNorm(nn.Conv(
                self.n_outputs, (self.kernel_size,),
                kernel_dilation=(self.dilation,), padding=padding,
                kernel_init=conv_init, name=name))

        # t_mask (T,) zeroes positions outside the true sequence, restoring
        # the per-layer zero-padding semantics when the block runs on a
        # time-shard with fake edge frames (parallel/seqpar.py): each conv's
        # neighbourhood reads must see zeros there, exactly like padding
        msk = ((lambda v: v * t_mask[None, :, None])
               if t_mask is not None else (lambda v: v))
        out = msk(nn.relu(conv("conv1")(x)))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.relu(conv("conv2")(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if x.shape[-1] != self.n_outputs:
            res = nn.Conv(self.n_outputs, (1,), kernel_init=conv_init,
                          name="downsample")(x)
        else:
            res = x
        return msk(nn.relu(out + res))


class TemporalConvNet(nn.Module):
    """Stack of TemporalBlocks with dilation 2^i (tcn.py:54-70)."""
    num_channels: Sequence[int]
    kernel_size: int = 3
    dropout: float = 0.2
    causal: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, t_mask=None):
        assert self.kernel_size % 2 == 1
        if t_mask is not None:
            x = x * t_mask[None, :, None]
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(ch, self.kernel_size, 2 ** i, self.dropout,
                              self.causal, name=f"block{i}")(x, deterministic,
                                                             t_mask)
        return x
