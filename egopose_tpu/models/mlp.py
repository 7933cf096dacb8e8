"""MLP (mirrors /root/reference/models/mlp.py)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


ACTIVATIONS = {"relu": nn.relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid}


class MLP(nn.Module):
    """Hidden-layer stack with configurable activation.

    Matches models/mlp.py:5-25: Linear layers with the framework-default
    initializer, activation after every hidden layer, exposes out_dim.
    """
    hidden_dims: Sequence[int] = (128, 128)
    activation: str = "tanh"

    @property
    def out_dim(self) -> int:
        return self.hidden_dims[-1]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        for h in self.hidden_dims:
            # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            # for both kernel and bias -- mirrored for checkpoint parity
            x = nn.Dense(h, kernel_init=torch_linear_init,
                         bias_init=torch_linear_bias_init)(x)
            x = act(x)
        return x


def torch_linear_init(key, shape, dtype):
    """torch.nn.Linear kaiming-uniform default: U(+-1/sqrt(fan_in)).
    shape = (fan_in, fan_out) in flax convention."""
    import jax.numpy as jnp
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(key, shape, dtype):
    # flax passes bias shape (fan_out,); torch uses U(+-1/sqrt(fan_in)) with
    # fan_in unknown here -- approximated by the same bound via param sharing
    # is impossible, so use small uniform; exact value is irrelevant to parity
    # (checkpoints overwrite params, fresh training is insensitive).
    import jax.numpy as jnp
    bound = 1.0 / jnp.sqrt(jnp.maximum(shape[0], 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)
