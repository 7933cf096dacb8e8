"""GAE advantage estimation as a reverse lax.scan.

Mirrors /root/reference/core/common.py:5-25 (which deliberately runs its
reverse loop on CPU); here the scan runs on device over (T, ...) arrays with
arbitrary batch dims, masked at episode boundaries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_advantages(rewards, masks, values, gamma, tau,
                        valid=None, axis0_time=True):
    """GAE over time-major arrays (T, ...): returns (advantages, returns).

    masks[t] = 0 terminates the episode at t (no bootstrap across it),
    exactly like core/common.py:14-19.  ``valid`` (optional, same shape)
    restricts the final advantage normalization to real transitions.
    """
    def body(carry, x):
        prev_value, prev_adv = carry
        r, m, v = x
        delta = r + gamma * prev_value * m - v
        adv = delta + gamma * tau * prev_adv * m
        return (v, adv), adv

    (_, _), advantages = jax.lax.scan(
        body, (jnp.zeros_like(values[0]), jnp.zeros_like(values[0])),
        (rewards, masks, values), reverse=True)
    returns = values + advantages
    # normalization matches the reference exactly: torch .std() is the
    # sample std (ddof=1) over all steps (core/common.py:22); with ``valid``
    # the statistics are restricted to real transitions
    if valid is None:
        n = advantages.size
        mean = advantages.mean()
        var = jnp.sum((advantages - mean) ** 2)
    else:
        n = jnp.maximum(valid.sum(), 2.0)
        mean = jnp.sum(advantages * valid) / n
        var = jnp.sum(valid * (advantages - mean) ** 2)
    std = jnp.sqrt(jnp.maximum(var / (n - 1), 1e-12))
    advantages = (advantages - mean) / std
    return advantages, returns
