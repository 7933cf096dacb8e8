"""Action distributions (mirrors /root/reference/core/distributions.py) as
pure functions over (mean, log_std) / logits."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def diag_gaussian_log_prob(x, mean, log_std):
    """Sum-reduced log density (distributions.py:21-22)."""
    var = jnp.exp(2.0 * log_std)
    ld = -((x - mean) ** 2) / (2 * var) - 0.5 * jnp.log(2 * jnp.pi) - log_std
    return jnp.sum(ld, axis=-1)


def diag_gaussian_sample(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)


def diag_gaussian_kl(mean, log_std):
    """Detached-against-self KL used by TRPO (distributions.py:12-19):
    KL(sg[p] || p) whose gradient at equality drives the Fisher product."""
    mean0 = jax.lax.stop_gradient(mean)
    log_std0 = jax.lax.stop_gradient(log_std)
    std0 = jnp.exp(log_std0)
    std1 = jnp.exp(log_std)
    kl = log_std - log_std0 + (std0 ** 2 + (mean0 - mean) ** 2) / (2 * std1 ** 2) - 0.5
    return jnp.sum(kl, axis=-1)


def diag_gaussian_entropy(log_std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + log_std, axis=-1)


def categorical_log_prob(action, logits):
    logp = jax.nn.log_softmax(logits)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits)
