"""MobileNet-v1 backbone in flax (mirrors /root/reference/models/
mobile_net.py): depthwise-separable conv stack + fc head, NHWC layout."""
from __future__ import annotations

import flax.linen as nn
import jax


class MobileNet(nn.Module):
    out_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(y, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                name=name)(y)

        def conv_bn(y, oup, stride, name):
            y = nn.Conv(oup, (3, 3), strides=(stride, stride), padding=1,
                        use_bias=False, name=f"{name}_conv")(y)
            return nn.relu(bn(y, f"{name}_bn"))

        def conv_dw(y, oup, stride, name):
            inp = y.shape[-1]
            y = nn.Conv(inp, (3, 3), strides=(stride, stride), padding=1,
                        feature_group_count=inp, use_bias=False,
                        name=f"{name}_dw")(y)
            y = nn.relu(bn(y, f"{name}_dwbn"))
            y = nn.Conv(oup, (1, 1), use_bias=False, name=f"{name}_pw")(y)
            return nn.relu(bn(y, f"{name}_pwbn"))

        x = conv_bn(x, 32, 2, "c0")
        plan = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
                (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
                (1024, 1)]
        for i, (oup, stride) in enumerate(plan):
            x = conv_dw(x, oup, stride, f"dw{i}")
        # global average pool (equals the reference's AvgPool2d(7) for the
        # 224x224 input it assumes, and generalizes to other resolutions)
        x = x.mean(axis=(-3, -2))
        return nn.Dense(self.out_dim, name="fc")(x)
