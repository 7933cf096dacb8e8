"""Batched quaternion / rotation ops (wxyz convention, matches MuJoCo).

TPU-first re-design of the scalar quaternion helpers the reference uses
(/root/reference/utils/math.py, /root/reference/utils/transformation.py):
every op here accepts arbitrary leading batch dimensions and is jit/vmap
friendly (no data-dependent control flow, no in-place mutation).

All quaternions are (..., 4) arrays laid out as (w, x, y, z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    """Return the unit quaternion along q (safe for ~zero norm)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b.  Mirrors transformations.quaternion_multiply
    (/root/reference/utils/transformation.py:1379) but batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Quaternion inverse q* / |q|^2 (matches transformations.quaternion_inverse)."""
    return quat_conj(q) / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (...,3) by quaternion(s) q (...,4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q^-1 (world -> local for a body with orientation q)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> unit quaternion, branch-free (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best via where
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)
    cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4,4)
    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """(axis (...,3) must be unit, angle (...)) -> quaternion.
    Mirrors transformations.quaternion_about_axis."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_to_axis_angle(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit quaternion -> (unit axis (...,3), angle in [0, 2*pi)).

    Matches transformations.rotation_from_quaternion semantics used by the
    reference (/root/reference/utils/math.py:23): angle = 2*acos(w), axis from
    the vector part, with a safe fallback axis when the rotation is ~identity.
    """
    s2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1)
    s = jnp.sqrt(jnp.maximum(s2, _EPS))
    # atan2 form: numerically stable near identity (arccos(w) loses ~half the
    # significant digits for small rotations); same [0, 2*pi) range as 2*acos(w)
    angle = 2.0 * jnp.arctan2(s, q[..., 0])
    safe = s2 > 1e-14
    axis = jnp.where(safe[..., None], q[..., 1:] / s[..., None],
                     jnp.array([1.0, 0.0, 0.0], dtype=q.dtype))
    return axis, jnp.where(safe, angle, 0.0)


def rotvec_from_quat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector (axis*angle), angle wrapped to (-pi, pi].

    The reference wraps angles >pi / <-pi (utils/math.py:24-27) before scaling;
    this does the same in a branch-free way.
    """
    axis, angle = quat_to_axis_angle(q)
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    return axis * angle[..., None]


def quat_from_expmap(e: jax.Array) -> jax.Array:
    """Exponential map (...,3) -> quaternion.  Mirrors utils/math.py:115-121."""
    angle = jnp.linalg.norm(e, axis=-1)
    safe = angle > 1e-12
    axis = jnp.where(safe[..., None], e / jnp.maximum(angle, _EPS)[..., None],
                     jnp.array([1.0, 0.0, 0.0], dtype=e.dtype))
    return axis_angle_to_quat(axis, angle)


def quat_from_euler(ex, ey, ez):
    """Euler 'sxyz' (static x-y-z) -> quaternion.

    Matches transformations.quaternion_from_euler(ex, ey, ez) defaults used by
    get_body_quat (/root/reference/ego_pose/envs/humanoid_v1.py:122) and the
    MuJoCo composition of three sequential hinge joints about x, y, z.
    """
    ex, ey, ez = jnp.asarray(ex), jnp.asarray(ey), jnp.asarray(ez)
    zeros = jnp.zeros_like(ex)
    qx = axis_angle_to_quat(jnp.stack([jnp.ones_like(ex), zeros, zeros], -1), ex)
    qy = axis_angle_to_quat(jnp.stack([zeros, jnp.ones_like(ey), zeros], -1), ey)
    qz = axis_angle_to_quat(jnp.stack([zeros, zeros, jnp.ones_like(ez)], -1), ez)
    # extrinsic x-then-y-then-z composes as R = Rz @ Ry @ Rx
    # (verified against the reference's vendored transformations.py and
    # scipy Rotation.from_euler('xyz') in tests/test_quat.py)
    return quat_mul(qz, quat_mul(qy, qx))


def euler_from_quat_zyx(q: jax.Array) -> jax.Array:
    """Quaternion -> euler angles (ex, ey, ez) such that R = Rx(ex)Ry(ey)Rz(ez)
    does NOT hold -- this is the 'rzyx'/'szyx'-style decomposition the metrics
    module needs; see egopose_tpu.utils.metrics for usage."""
    # standard ZYX (yaw-pitch-roll) extraction
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_integrate(q: jax.Array, omega_local: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by local-frame angular velocity over dt.

    Matches MuJoCo's mj_integratePos for free joints (angular velocity of a
    free joint's qvel is expressed in the child/body frame)."""
    return quat_normalize(quat_mul(q, quat_from_expmap(omega_local * dt)))


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation between unit quaternions (the
    transformations.quaternion_slerp the reference vendors), batched and
    branch-free: takes the short arc, falls back to lerp near alignment."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(jnp.clip(d, -1.0, 1.0))
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta)
                   / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(near, t, jnp.sin(t * theta)
                   / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)
