"""Trajectory alignment helpers (mirror /root/reference/ego_pose/utils/
tools.py and utils/tools.py align_human_state)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import quat as Q
from ..ops import math_utils as M


def _np(x):
    return np.asarray(x)


def normalize_traj(qpos_traj, qvel_traj):
    """Heading-normalize a trajectory (ego_pose/utils/tools.py:5-15)."""
    qp = jnp.asarray(qpos_traj)
    qv = jnp.asarray(qvel_traj)
    new_qv = qv.at[:, :3].set(M.transform_vec(qv[:, :3], qp[:, 3:7], "heading"))
    new_qp = qp.at[:, 3:7].set(M.de_heading(qp[:, 3:7]))
    return _np(new_qp), _np(new_qv)


def sync_traj(qpos_traj, qvel_traj, ref_qpos):
    """Re-anchor a trajectory's heading/position to a reference qpos
    (ego_pose/utils/tools.py:18-32)."""
    qp = jnp.asarray(qpos_traj)
    qv = jnp.asarray(qvel_traj)
    ref = jnp.asarray(ref_qpos)
    rel_heading = Q.quat_mul(M.get_heading_q(ref[3:7]),
                             Q.quat_inv(M.get_heading_q(qp[0, 3:7])))
    start_pos = jnp.concatenate([qp[0, :2], ref[2:3]])
    rh = jnp.broadcast_to(rel_heading, (qp.shape[0], 4))
    new_xy = Q.quat_rotate(rh, qp[:, :3] - start_pos)[:, :2] + ref[:2]
    new_qp = qp.at[:, :2].set(new_xy)
    new_qp = new_qp.at[:, 3:7].set(Q.quat_mul(rh, qp[:, 3:7]))
    new_qv = qv.at[:, :3].set(Q.quat_rotate(rh, qv[:, :3]))
    return _np(new_qp), _np(new_qv)


def remove_noisy_hands(results):
    """Zero the hand dims in-place (ego_pose/utils/tools.py:35-40).

    Arrays fresh off the device (np.asarray over a jax array) are
    read-only views; those are replaced with writable copies."""
    for traj in results.values():
        for take in traj.keys():
            arr = traj[take]
            if not arr.flags.writeable:
                arr = arr.copy()
                traj[take] = arr
            arr[..., 32:35] = 0
            arr[..., 42:45] = 0


def align_human_state(qpos, qvel, ref_qpos):
    """In-place re-anchor a single state to a reference's xy + heading
    (utils/tools.py:71-75)."""
    qpos[:2] = ref_qpos[:2]
    hq = np.asarray(M.get_heading_q(jnp.asarray(ref_qpos[3:7])))
    qpos[3:7] = np.asarray(Q.quat_mul(jnp.asarray(hq), jnp.asarray(qpos[3:7])))
    qvel[:3] = np.asarray(Q.quat_rotate(jnp.asarray(hq), jnp.asarray(qvel[:3])))
