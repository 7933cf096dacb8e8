"""Golden tests for batched quaternion ops against scipy.spatial.transform.

scipy uses xyzw ordering; ours (like MuJoCo and the reference) is wxyz.
Reference semantics under test: /root/reference/utils/math.py and the
quaternion subset of /root/reference/utils/transformation.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from egopose_tpu.ops import quat as Q
from egopose_tpu.ops import math_utils as M

rng = np.random.RandomState(0)


def rand_quat(n=64):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q):  # wxyz -> xyzw
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def test_quat_mul_matches_scipy():
    a, b = rand_quat(), rand_quat()
    got = np.asarray(Q.quat_mul(jnp.array(a), jnp.array(b)))
    want = (R.from_quat(to_scipy(a)) * R.from_quat(to_scipy(b))).as_quat()
    want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
    # sign ambiguity: compare rotations
    flip = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * flip, want, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q, v = rand_quat(), rng.randn(64, 3)
    got = np.asarray(Q.quat_rotate(jnp.array(q), jnp.array(v)))
    want = R.from_quat(to_scipy(q)).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_rotate_inv_is_transpose():
    q, v = rand_quat(), rng.randn(64, 3)
    got = np.asarray(Q.quat_rotate_inv(jnp.array(q), jnp.array(v)))
    want = R.from_quat(to_scipy(q)).apply(v, inverse=True)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_mat_roundtrip():
    q = rand_quat()
    m = Q.quat_to_mat(jnp.array(q))
    np.testing.assert_allclose(np.asarray(m), R.from_quat(to_scipy(q)).as_matrix(), atol=1e-12)
    q2 = np.asarray(Q.mat_to_quat(m))
    flip = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * flip, q, atol=1e-9)


def test_axis_angle_roundtrip():
    axis = rng.randn(64, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0.01, np.pi - 0.01, 64)
    q = Q.axis_angle_to_quat(jnp.array(axis), jnp.array(angle))
    a2, ang2 = Q.quat_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(a2), axis, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ang2), angle, atol=1e-9)


def test_rotvec_matches_scipy():
    q = rand_quat()
    got = np.asarray(Q.rotvec_from_quat(jnp.array(q)))
    want = R.from_quat(to_scipy(q)).as_rotvec()
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_expmap_matches_scipy():
    e = rng.randn(64, 3)
    q = np.asarray(Q.quat_from_expmap(jnp.array(e)))
    want = R.from_rotvec(e).as_quat()
    want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
    flip = np.sign(np.sum(q * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * flip, want, atol=1e-12)


def test_quat_from_euler_static_xyz():
    # Gohlke quaternion_from_euler(ai,aj,ak) default 'sxyz' == scipy extrinsic 'xyz'
    e = rng.uniform(-1.5, 1.5, (64, 3))
    got = np.asarray(Q.quat_from_euler(jnp.array(e[:, 0]), jnp.array(e[:, 1]), jnp.array(e[:, 2])))
    want = R.from_euler("xyz", e).as_quat()
    want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
    flip = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * flip, want, atol=1e-12)


def test_heading_ops():
    q = rand_quat()
    hq = np.asarray(M.get_heading_q(jnp.array(q)))
    # heading quat has zero x,y and unit norm
    np.testing.assert_allclose(hq[:, 1:3], 0, atol=1e-15)
    np.testing.assert_allclose(np.linalg.norm(hq, axis=-1), 1, atol=1e-12)
    # de-headed quaternion recomposes: heading * deheaded == q
    dq = M.de_heading(jnp.array(q))
    rec = np.asarray(Q.quat_mul(jnp.array(hq), dq))
    flip = np.sign(np.sum(rec * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(rec * flip, q, atol=1e-9)
    # heading of the de-headed quat is ~0 (or 2*pi)
    h = np.asarray(M.get_heading(dq))
    h = np.minimum(h, 2 * np.pi - h)
    np.testing.assert_allclose(h, 0, atol=1e-6)


def test_transform_vec_root_and_heading():
    q, v = rand_quat(), rng.randn(64, 3)
    got = np.asarray(M.transform_vec(jnp.array(v), jnp.array(q), "root"))
    want = np.einsum("nij,nj->ni", R.from_quat(to_scipy(q)).as_matrix().transpose(0, 2, 1), v)
    np.testing.assert_allclose(got, want, atol=1e-12)
    got_h = np.asarray(M.transform_vec(jnp.array(v), jnp.array(q), "heading"))
    hq = q.copy()
    hq[:, 1] = 0
    hq[:, 2] = 0
    hq /= np.linalg.norm(hq, axis=-1, keepdims=True)
    want_h = np.einsum("nij,nj->ni", R.from_quat(to_scipy(hq)).as_matrix().transpose(0, 2, 1), v)
    np.testing.assert_allclose(got_h, want_h, atol=1e-12)


def test_get_qvel_fd_consistency():
    # integrate a known qvel then finite-difference it back
    dt = 1.0 / 30.0
    nq = 59
    qpos = np.zeros(nq)
    qpos[3] = 1.0
    qpos[7:] = rng.uniform(-0.5, 0.5, nq - 7)
    v = rng.randn(3) * 0.5
    w_root = rng.randn(3) * 0.5  # root-frame angular velocity
    jv = rng.randn(nq - 7) * 0.5
    next_qpos = qpos.copy()
    next_qpos[:3] += v * dt
    q0 = jnp.array(qpos[3:7])
    w_world = np.asarray(Q.quat_rotate(q0, jnp.array(w_root)))
    dq = Q.quat_from_expmap(jnp.array(w_world * dt))
    next_qpos[3:7] = np.asarray(Q.quat_mul(dq, q0))
    next_qpos[7:] += jv * dt
    qvel = np.asarray(M.get_qvel_fd(jnp.array(qpos), jnp.array(next_qpos), dt))
    np.testing.assert_allclose(qvel[:3], v, atol=1e-9)
    np.testing.assert_allclose(qvel[3:6], w_root, atol=1e-6)
    np.testing.assert_allclose(qvel[6:], jv, atol=1e-9)


def test_multi_quat_norm_diff():
    n = 8
    q1 = rand_quat(n).reshape(-1)
    q0 = rand_quat(n).reshape(-1)
    d = np.asarray(M.multi_quat_diff(jnp.array(q1), jnp.array(q0)))
    nrm = np.asarray(M.multi_quat_norm(jnp.array(d)))
    for i in range(n):
        r1 = R.from_quat(to_scipy(q1[4 * i:4 * i + 4]))
        r0 = R.from_quat(to_scipy(q0[4 * i:4 * i + 4]))
        rel = r1 * r0.inv()
        w = np.clip(d[4 * i], -1, 1)
        assert abs(nrm[i] - np.arccos(w)) < 1e-9
        # arccos(w) is half the geodesic angle
        ang = rel.magnitude()
        assert abs(2 * min(nrm[i], np.pi - nrm[i]) - min(ang, 2 * np.pi - ang)) < 1e-6


def test_normal_log_density():
    x = rng.randn(16, 52)
    mean = rng.randn(16, 52)
    log_std = rng.randn(52) * 0.1
    got = np.asarray(M.normal_log_density(jnp.array(x), jnp.array(mean), jnp.array(log_std)))
    from scipy.stats import norm
    want = norm.logpdf(x, mean, np.exp(log_std)).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_quat_slerp_matches_scipy():
    from scipy.spatial.transform import Slerp
    q = rand_quat(2)
    for t in (0.0, 0.3, 0.7, 1.0):
        got = np.asarray(Q.quat_slerp(jnp.array(q[0]), jnp.array(q[1]), t))
        sl = Slerp([0, 1], R.from_quat(to_scipy(q)))
        want = sl([t]).as_quat()[0]
        want = np.concatenate([want[3:], want[:3]])
        flip = np.sign(np.sum(got * want))
        np.testing.assert_allclose(got * flip, want, atol=1e-9)
