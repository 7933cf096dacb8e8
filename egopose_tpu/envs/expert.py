"""Expert feature generation: batched kinematic replay of mocap trajectories.

TPU-native equivalent of /root/reference/ego_pose/data_process/gen_expert.py:
the reference replays ground-truth qpos through the MuJoCo sim frame by frame
(env.data.qpos[:] = ...; env.sim.forward()); here the whole take is replayed
as one vmapped forward-kinematics call, and finite-difference velocity
features are computed vectorized over time.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import math_utils as M
from ..physics import engine
from ..physics.model import PhysicsModel
from ..physics.spec import ModelSpec
from .humanoid import BodyTables, EnvParams, ExpertBatch, get_body_quat, \
    get_ee_pos, get_obs


def zero_hands(spec: ModelSpec, qpos: np.ndarray) -> np.ndarray:
    """Zero the noisy hand joints (gen_expert.py:40-42; also
    utils/tools.py:35-40 remove_noisy_hands)."""
    qaddr = spec.body_qposaddr()
    qpos = np.array(qpos)
    for name in ("LeftHand", "RightHand"):
        s, e = qaddr[name]
        qpos[..., s:e] = 0.0
    return qpos


def gen_expert_features(model: PhysicsModel, p: EnvParams, tables: BodyTables,
                        qpos_traj: jax.Array, dt: float) -> dict:
    """Per-frame expert features for one take (gen_expert.py:28-100).

    Returns a dict of (T, ...) arrays with the reference's field names.
    The reference's expert obs is computed with zero velocities (the replay
    never writes data.qvel), mirrored here.
    """
    qpos_traj = jnp.asarray(qpos_traj)
    t_len = qpos_traj.shape[0]
    zero_qvel = jnp.zeros(model.ndof, qpos_traj.dtype)
    zero_t = jnp.zeros((), jnp.int32)

    def frame(qpos):
        kin = engine.fk(model, qpos)
        return dict(
            obs=get_obs(p, qpos, zero_qvel, zero_t),
            ee_pos=get_ee_pos(tables, kin, qpos, p.obs_coord),
            ee_wpos=get_ee_pos(tables, kin, qpos, None),
            bquat=get_body_quat(tables, qpos),
            com=engine.subtree_com(model, kin),
            head_pos=kin.xpos[tables.head_body],
            rq_rmh=M.de_heading(qpos[3:7]),
        )

    feats = jax.vmap(frame)(qpos_traj)

    # finite-difference velocities; frame 0 duplicates frame 1's value
    qvel = jax.vmap(lambda a, b: M.get_qvel_fd(a, b, dt))(
        qpos_traj[:-1], qpos_traj[1:])
    qvel = jnp.concatenate([qvel[:1], qvel], axis=0)
    rlinv = qvel[:, :3]
    rlinv_local = jax.vmap(lambda v, q: M.transform_vec(v, q, p.obs_coord))(
        qvel[:, :3], qpos_traj[:, 3:7])
    rangv = qvel[:, 3:6]
    bangvel = jax.vmap(lambda a, b: M.get_angvel_fd(a, b, dt))(
        feats["bquat"][:-1], feats["bquat"][1:])
    bangvel = jnp.concatenate([bangvel[:1], bangvel], axis=0)

    return dict(qpos=qpos_traj, qvel=qvel, rlinv=rlinv,
                rlinv_local=rlinv_local, rangv=rangv, bangvel=bangvel,
                **feats, len=t_len)


def stack_experts(experts: Sequence[dict]) -> ExpertBatch:
    """Pad and stack per-take expert dicts into one ExpertBatch."""
    tmax = max(int(e["len"]) for e in experts)

    def pad(key):
        outs = []
        for e in experts:
            a = np.asarray(e[key])
            padded = np.zeros((tmax,) + a.shape[1:], a.dtype)
            padded[: a.shape[0]] = a
            padded[a.shape[0]:] = a[-1]  # repeat last frame into the padding
            outs.append(padded)
        return jnp.asarray(np.stack(outs))

    lens = jnp.asarray(np.array([int(e["len"]) for e in experts], np.int32))
    qpos = pad("qpos")
    head = pad("head_pos")
    return ExpertBatch(
        qpos=qpos, qvel=pad("qvel"), rlinv_local=pad("rlinv_local"),
        rangv=pad("rangv"), rq_rmh=pad("rq_rmh"), ee_pos=pad("ee_pos"),
        ee_wpos=pad("ee_wpos"), bquat=pad("bquat"), bangvel=pad("bangvel"),
        com=pad("com"), head_pos=head, obs=pad("obs"), lens=lens,
        height_lb=jnp.asarray(np.array(
            [np.asarray(e["qpos"])[:, 2].min() for e in experts])),
        head_height_lb=jnp.asarray(np.array(
            [np.asarray(e["head_pos"])[:, 2].min() for e in experts])),
    )


def synthetic_experts(model: PhysicsModel, p: EnvParams, tables: BodyTables,
                      spec: ModelSpec, n_takes: int = 2, t_len: int = 400,
                      seed: int = 0, dt: float = 1.0 / 30.0) -> ExpertBatch:
    """Synthetic mocap stand-in for tests/benches when the EgoPose dataset is
    unavailable: smooth sinusoidal joint motion on a standing root."""
    rng = np.random.RandomState(seed)
    experts = []
    for i in range(n_takes):
        t = np.arange(t_len) * dt
        qpos = np.zeros((t_len, spec.nq))
        qpos[:, 2] = 0.92 + 0.02 * np.sin(2 * np.pi * 0.5 * t)
        qpos[:, 3] = 1.0
        lo = np.clip(spec.jnt_range[:, 0], -0.6, 0.0)
        hi = np.clip(spec.jnt_range[:, 1], 0.0, 0.6)
        amp = 0.25 * (hi - lo) * rng.uniform(0.2, 1.0, spec.nq - 7)
        center = 0.5 * (lo + hi)
        freq = rng.uniform(0.2, 0.7, spec.nq - 7)
        phase = rng.uniform(0, 2 * np.pi, spec.nq - 7)
        qpos[:, 7:] = center + amp * np.sin(2 * np.pi * freq * t[:, None] + phase)
        qpos = zero_hands(spec, qpos)
        experts.append(jax.device_get(
            gen_expert_features(model, p, tables, jnp.asarray(qpos), dt)))
    return stack_experts(experts)
