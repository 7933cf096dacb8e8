"""Batched kinematic math used across envs / rewards / metrics.

TPU-native, vectorized equivalents of /root/reference/utils/math.py.
All functions accept leading batch dimensions and are jit/vmap friendly.
Quaternions are wxyz.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quat import (
    quat_mul,
    quat_inv,
    quat_normalize,
    quat_rotate_inv,
    rotvec_from_quat,
)

_EPS = 1e-12


def get_heading_q(q: jax.Array) -> jax.Array:
    """Heading (yaw-only) quaternion: zero the x,y components and renormalize.
    Mirrors utils/math.py:62-67."""
    hq = q * jnp.array([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    return quat_normalize(hq)


def get_heading(q: jax.Array) -> jax.Array:
    """Heading angle (rad).  Mirrors utils/math.py:70-77 including the sign
    canonicalization on the z component."""
    hq = q * jnp.array([1.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    hq = jnp.where(hq[..., 3:4] < 0, -hq, hq)
    hq = quat_normalize(hq)
    return 2.0 * jnp.arccos(jnp.clip(hq[..., 0], -1.0, 1.0))


def de_heading(q: jax.Array) -> jax.Array:
    """Remove heading: q_deheaded = heading(q)^-1 * q (utils/math.py:80-81)."""
    return quat_mul(quat_inv(get_heading_q(q)), q)


def transform_vec(v: jax.Array, q: jax.Array, coord: str = "root") -> jax.Array:
    """Express world vector v in the root frame of q ('root') or in its
    heading frame ('heading').  Mirrors utils/math.py:47-59 (R^T v)."""
    if coord == "root":
        return quat_rotate_inv(q, v)
    elif coord == "heading":
        return quat_rotate_inv(get_heading_q(q), v)
    raise ValueError(f"unknown coord {coord}")


def rotvec_world_to_root(rv: jax.Array, q: jax.Array) -> jax.Array:
    """Angular velocity world->root frame (used by get_qvel_fd)."""
    return quat_rotate_inv(q, rv)


def get_qvel_fd(cur_qpos: jax.Array, next_qpos: jax.Array, dt, transform: str | None = None) -> jax.Array:
    """Finite-difference generalized velocity between qpos frames.

    Layout matches MuJoCo free-root models and utils/math.py:20-35:
    [linear vel (3, world or `transform` frame), angular vel (3, root frame),
     joint vel (nq-7,)].
    """
    v = (next_qpos[..., :3] - cur_qpos[..., :3]) / dt
    qrel = quat_mul(next_qpos[..., 3:7], quat_inv(cur_qpos[..., 3:7]))
    rv = rotvec_from_quat(qrel) / dt
    rv = rotvec_world_to_root(rv, cur_qpos[..., 3:7])
    jvel = (next_qpos[..., 7:] - cur_qpos[..., 7:]) / dt
    if transform is not None:
        v = transform_vec(v, cur_qpos[..., 3:7], transform)
    return jnp.concatenate([v, rv, jvel], axis=-1)


def multi_quat_diff(nq1: jax.Array, nq0: jax.Array) -> jax.Array:
    """Relative quaternions q1 * q0^-1 for N stacked joints (flat (...,4N)).
    Mirrors utils/math.py:84-93 but vectorized."""
    shape = nq1.shape[:-1] + (nq1.shape[-1] // 4, 4)
    d = quat_mul(nq1.reshape(shape), quat_inv(nq0.reshape(shape)))
    return d.reshape(nq1.shape)


def multi_quat_norm(nq: jax.Array) -> jax.Array:
    """Rotation magnitude per joint = arccos(|w| clipped).  Mirrors
    utils/math.py:96-100 (arccos of the scalar part)."""
    w = nq[..., ::4]
    return jnp.arccos(jnp.clip(w, -1.0, 1.0))


def get_angvel_fd(prev_bquat: jax.Array, cur_bquat: jax.Array, dt) -> jax.Array:
    """Per-joint finite-difference angular velocity from stacked body quats
    (flat (...,4N) -> (...,3N)).  Mirrors utils/math.py:38-44."""
    qd = multi_quat_diff(cur_bquat, prev_bquat)
    shape = qd.shape[:-1] + (qd.shape[-1] // 4, 4)
    rv = rotvec_from_quat(qd.reshape(shape)) / dt
    return rv.reshape(qd.shape[:-1] + (qd.shape[-1] // 4 * 3,))


def normal_log_density(x: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
    """Diagonal-gaussian log density summed over the last axis
    (utils/math.py:14-17)."""
    var = jnp.exp(2.0 * log_std)
    ld = -((x - mean) ** 2) / (2 * var) - 0.5 * jnp.log(2 * jnp.pi) - log_std
    return jnp.sum(ld, axis=-1)


def normal_entropy(log_std: jax.Array) -> jax.Array:
    """Diagonal-gaussian entropy summed over last axis (utils/math.py:8-11)."""
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + log_std, axis=-1)
