"""ResNet-18 backbone in flax (mirrors /root/reference/models/resnet.py,
which wraps torchvision resnet18 with a replaced fc head).

NHWC layout (TPU-native).  BatchNorm running statistics live in the
'batch_stats' collection.  torchvision pretrained weights are not available
in this environment (no torchvision); the import mapping in torch_import.py
handles reference checkpoints when provided.
"""
from __future__ import annotations

import flax.linen as nn
import jax


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Standard resnet18 trunk + out_dim fc head (NHWC input)."""
    out_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (filters, blocks, stride) in enumerate(
                [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]):
            for b in range(blocks):
                x = BasicBlock(filters, stride if b == 0 else 1,
                               name=f"layer{i+1}_{b}")(x, train)
        x = x.mean(axis=(-3, -2))  # global average pool
        return nn.Dense(self.out_dim, name="fc")(x)
