"""Policy and value networks (mirror core/policy_gaussian.py, core/critic.py,
core/policy_disc.py)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.mlp import MLP, torch_linear_init


def _scaled_init(scale):
    def init(key, shape, dtype):
        return torch_linear_init(key, shape, dtype) * scale
    return init


class PolicyGaussian(nn.Module):
    """Gaussian policy: MLP trunk -> mean head (0.1-scaled init) +
    state-independent learnable action_log_std
    (core/policy_gaussian.py:7-23)."""
    action_dim: int
    hidden_dims: Sequence[int] = (300, 200)
    activation: str = "relu"
    log_std_init: float = 0.0
    fix_std: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        h = MLP(self.hidden_dims, self.activation, name="net")(x)
        mean = nn.Dense(self.action_dim, name="action_mean",
                        kernel_init=_scaled_init(0.1),
                        bias_init=nn.initializers.zeros)(h)
        # float32 to match flax's Dense param_dtype (mixed param dtypes break
        # flat-vector TRPO math under jax_enable_x64)
        log_std = self.param("action_log_std",
                             lambda k, s: jnp.full(s, self.log_std_init,
                                                   jnp.float32),
                             (self.action_dim,))
        if self.fix_std:
            log_std = jax.lax.stop_gradient(log_std)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class PolicyDiscrete(nn.Module):
    """Softmax policy head (core/policy_disc.py:7-18)."""
    action_num: int
    hidden_dims: Sequence[int] = (300, 200)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array):
        h = MLP(self.hidden_dims, self.activation, name="net")(x)
        logits = nn.Dense(self.action_num, name="action_head",
                          kernel_init=_scaled_init(0.1),
                          bias_init=nn.initializers.zeros)(h)
        return logits


class Value(nn.Module):
    """Critic: MLP trunk -> scalar head with 0.1-scaled init
    (core/critic.py:5-18)."""
    hidden_dims: Sequence[int] = (300, 200)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = MLP(self.hidden_dims, self.activation, name="net")(x)
        v = nn.Dense(1, name="value_head", kernel_init=_scaled_init(0.1),
                     bias_init=nn.initializers.zeros)(h)
        return v[..., 0]
