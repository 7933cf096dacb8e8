"""Evaluation metrics (mirrors /root/reference/ego_pose/utils/metrics.py),
vectorized over frames."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import quat as Q
from ..ops import math_utils as M


def get_joint_angles(poses: np.ndarray) -> np.ndarray:
    """Root euler (sxyz, yaw zeroed) + joint angles (metrics.py:5-13)."""
    e = np.array(Q.euler_from_quat_zyx(jnp.asarray(poses[:, 3:7])))
    e[:, 2] = 0.0
    return np.hstack([e, poses[:, 7:]])


def get_joint_vels(poses: np.ndarray, dt: float) -> np.ndarray:
    """Finite-diff generalized velocities in heading frame (metrics.py:16-22)."""
    v = M.get_qvel_fd(jnp.asarray(poses[:-1]), jnp.asarray(poses[1:]), dt,
                      "heading")
    return np.asarray(v)


def get_joint_accels(vels: np.ndarray, dt: float) -> np.ndarray:
    return np.diff(vels, axis=0) / dt


def get_mean_dist(x: np.ndarray, y: np.ndarray) -> float:
    return float(np.linalg.norm(x - y, axis=1).mean())


def get_mean_abs(x: np.ndarray) -> float:
    return float(np.abs(x).mean())
