"""Running observation normalization (ZFilter) as a pure pytree.

Mirrors /root/reference/utils/zfilter.py (Welford RunningStat + clipped
z-normalization), extended with a batched parallel update (Chan et al.) so a
whole rollout batch folds into the statistics in one fused op on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunningStat(NamedTuple):
    n: jax.Array      # scalar count (float for device math)
    mean: jax.Array   # (D,)
    s: jax.Array      # (D,) sum of squared deviations


def init_stat(dim: int, dtype=jnp.float32) -> RunningStat:
    return RunningStat(n=jnp.zeros((), dtype),
                       mean=jnp.zeros(dim, dtype),
                       s=jnp.zeros(dim, dtype))


def push_batch(stat: RunningStat, x: jax.Array,
               weight: jax.Array | None = None) -> RunningStat:
    """Fold a batch (B, D) into the stats (optionally weighted per row).
    Chan parallel-Welford merge; equivalent to the reference's sequential
    push over rows (zfilter.py:12-22)."""
    if weight is None:
        weight = jnp.ones(x.shape[:-1], x.dtype)
    w = weight[..., None]
    nb = jnp.sum(weight)
    safe_nb = jnp.maximum(nb, 1.0)
    mb = jnp.sum(x * w, axis=tuple(range(x.ndim - 1))) / safe_nb
    sb = jnp.sum(w * (x - mb) ** 2, axis=tuple(range(x.ndim - 1)))
    n = stat.n + nb
    safe_n = jnp.maximum(n, 1.0)
    delta = mb - stat.mean
    mean = stat.mean + delta * nb / safe_n
    s = stat.s + sb + delta ** 2 * stat.n * nb / safe_n
    # empty batch: no change
    keep = nb > 0
    return RunningStat(n=jnp.where(keep, n, stat.n),
                       mean=jnp.where(keep, mean, stat.mean),
                       s=jnp.where(keep, s, stat.s))


def std(stat: RunningStat) -> jax.Array:
    var = jnp.where(stat.n > 1, stat.s / jnp.maximum(stat.n - 1, 1.0),
                    jnp.square(stat.mean))
    return jnp.sqrt(var)


def apply(stat: RunningStat, x: jax.Array, demean=True, destd=True,
          clip=5.0) -> jax.Array:
    """Normalize x with the current stats (zfilter.py:56-67)."""
    if demean:
        x = x - stat.mean
    if destd:
        x = x / (std(stat) + 1e-8)
    if clip:
        x = jnp.clip(x, -clip, clip)
    return x
