"""Functional humanoid imitation environment (pure reset/step over pytrees).

TPU-native re-design of /root/reference/ego_pose/envs/humanoid_v1.py: instead
of a stateful gym env around the MuJoCo C sim, the environment is a set of
pure functions over an explicit ``EnvState`` pytree, so thousands of rollout
lanes run as one ``vmap``ped ``lax.scan`` on device.  Experts (mocap feature
tracks) live in stacked padded device arrays instead of pickled dicts.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quat as Q
from ..ops import math_utils as M
from ..physics import engine
from ..physics.model import PhysicsModel
from ..physics.spec import ModelSpec


# ---------------------------------------------------------------------------
# expert store
# ---------------------------------------------------------------------------

class ExpertBatch(NamedTuple):
    """All experts stacked into padded (E, Tmax, ...) device arrays.

    Field meanings mirror gen_expert.py (/root/reference/ego_pose/
    data_process/gen_expert.py:28-100)."""
    qpos: jax.Array          # (E,T,nq)
    qvel: jax.Array          # (E,T,nv)
    rlinv_local: jax.Array   # (E,T,3) root linear vel, obs_coord frame
    rangv: jax.Array         # (E,T,3) root angular vel, root frame
    rq_rmh: jax.Array        # (E,T,4) de-headed root quat
    ee_pos: jax.Array        # (E,T,15) end-effectors, obs_coord-relative
    ee_wpos: jax.Array       # (E,T,15) end-effectors, world
    bquat: jax.Array         # (E,T,4*nb) stacked body quats
    bangvel: jax.Array       # (E,T,3*nb) finite-diff body angular velocities
    com: jax.Array           # (E,T,3)
    head_pos: jax.Array      # (E,T,3)
    obs: jax.Array           # (E,T,obs_dim)
    lens: jax.Array          # (E,) valid lengths
    height_lb: jax.Array     # (E,)
    head_height_lb: jax.Array  # (E,)


class EnvState(NamedTuple):
    """Carried state of one environment lane."""
    qpos: jax.Array
    qvel: jax.Array
    cur_t: jax.Array        # int32 control steps since episode start
    expert_ind: jax.Array   # int32
    start_ind: jax.Array    # int32
    prev_qpos: jax.Array
    prev_bquat: jax.Array
    bquat: jax.Array
    done: jax.Array         # bool


class StepOut(NamedTuple):
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    fail: jax.Array
    end: jax.Array
    reward_info: jax.Array  # (5,) per-component rewards


@partial(jax.tree_util.register_dataclass,
         data_fields=["jkp", "jkd", "a_ref", "a_scale", "torque_lim",
                      "env_init_noise", "w", "k", "b_diffw"],
         meta_fields=["obs_coord", "obs_vel", "obs_heading", "obs_phase",
                      "root_deheading", "env_episode_len", "fr_margin",
                      "env_start_first", "action_type", "frame_skip",
                      "reward_id", "reward_decay", "v_ord", "nq", "nv", "nu",
                      "obs_dim", "contact", "random_cur_t"])
@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Device-side environment configuration (subset of the YAML config the
    env math needs; mirrors egomimic_config.py fields)."""
    # static
    obs_coord: str
    obs_vel: str
    obs_heading: bool
    obs_phase: bool
    root_deheading: bool
    env_episode_len: int
    fr_margin: int
    env_start_first: bool
    action_type: str
    frame_skip: int
    reward_id: str
    reward_decay: bool
    v_ord: int
    random_cur_t: bool
    nq: int
    nv: int
    nu: int
    obs_dim: int
    # numeric
    jkp: jax.Array
    jkd: jax.Array
    a_ref: jax.Array
    a_scale: jax.Array
    torque_lim: jax.Array
    env_init_noise: jax.Array
    w: jax.Array        # (5,) reward weights w_p, w_v, w_e, w_rp, w_rv
    k: jax.Array        # (7,) kernel scales k_p, k_v, k_e, k_rh, k_rq, k_rl, k_ra
    b_diffw: jax.Array  # (nb-1,) per-body pose-diff weights
    contact: engine.ContactParams


# static per-model tables used by obs/bquat/ee (host side, computed once)
class BodyTables(NamedTuple):
    euler_idx: np.ndarray    # (nb-1,3) padded qpos index per non-root body
    ee_body: np.ndarray      # (5,) body indices of the end effectors
    head_body: int


EE_NAMES = ["LeftFoot", "RightFoot", "LeftHand", "RightHand", "Head"]


def make_body_tables(spec: ModelSpec) -> BodyTables:
    qaddr = spec.body_qposaddr()
    euler_idx = np.full((spec.nbody - 1, 3), spec.nq, dtype=np.int32)
    for i, name in enumerate(spec.body_names[1:]):
        start, end = qaddr[name]
        for k in range(end - start):
            euler_idx[i, k] = start + k
    ee_body = np.array([spec.body_names.index(n) for n in EE_NAMES], dtype=np.int32)
    return BodyTables(euler_idx=euler_idx, ee_body=ee_body,
                      head_body=spec.body_names.index("Head"))


# ---------------------------------------------------------------------------
# feature extractors (mirror humanoid_v1.py accessors)
# ---------------------------------------------------------------------------

def get_body_quat(tables: BodyTables, qpos: jax.Array) -> jax.Array:
    """Stacked body quaternions, exactly mirroring get_body_quat
    (humanoid_v1.py:113-125): root quat followed by per-body
    quaternion_from_euler over that body's hinge angles *in slot order*
    (including the reference's behavior of always assigning slot k to euler
    axis k regardless of the actual hinge axis)."""
    qpos_pad = jnp.concatenate([qpos, jnp.zeros(1, qpos.dtype)])
    e = qpos_pad[jnp.asarray(tables.euler_idx)]      # (nb-1,3)
    bq = Q.quat_from_euler(e[:, 0], e[:, 1], e[:, 2])
    return jnp.concatenate([qpos[3:7], bq.reshape(-1)])


def get_ee_pos(tables: BodyTables, kin: engine.Kin, qpos: jax.Array,
               transform: str | None) -> jax.Array:
    """End-effector positions (humanoid_v1.py:98-111): body frame origins,
    optionally root-relative in the given coordinate frame."""
    pos = kin.xpos[jnp.asarray(tables.ee_body)]      # (5,3)
    if transform is None:
        return pos.reshape(-1)
    root_pos = qpos[:3]
    root_q = qpos[3:7]
    rel = M.transform_vec(pos - root_pos, jnp.broadcast_to(root_q, (5, 4)),
                          transform)
    return rel.reshape(-1)


def get_obs(p: EnvParams, qpos: jax.Array, qvel: jax.Array,
            cur_t: jax.Array) -> jax.Array:
    """Observation builder mirroring get_full_obs (humanoid_v1.py:73-96)."""
    v = M.transform_vec(qvel[:3], qpos[3:7], p.obs_coord)
    qvel_t = jnp.concatenate([v, qvel[3:]])
    parts = []
    if p.obs_heading:
        parts.append(M.get_heading(qpos[3:7])[None])
    root_q = M.de_heading(qpos[3:7]) if p.root_deheading else qpos[3:7]
    parts.append(qpos[2:3])
    parts.append(root_q)
    parts.append(qpos[7:])
    if p.obs_vel == "root":
        parts.append(qvel_t[:6])
    elif p.obs_vel == "full":
        parts.append(qvel_t)
    if p.obs_phase:
        phase = jnp.minimum(cur_t.astype(qpos.dtype) / p.env_episode_len, 1.0)
        parts.append(phase[None])
    return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# rewards (mirror ego_pose/core/reward_function.py)
# ---------------------------------------------------------------------------

def quat_space_reward_v3(p: EnvParams, expert: ExpertBatch, state: EnvState,
                         cur_ee: jax.Array, dt, end_reward, is_end):
    """quat_space_reward_v3 (reward_function.py:4-60), vectorization of the
    weighted product-of-exponential-kernels imitation reward.  ``cur_ee`` is
    the current sim end-effector vector in obs_coord frame (computed by step
    from the post-step kinematics)."""
    w_p, w_v, w_e, w_rp, w_rv = p.w
    k_p, k_v, k_e, k_rh, k_rq, k_rl, k_ra = p.k
    ind = state.start_ind + state.cur_t
    e = state.expert_ind

    cur_qpos = state.qpos
    cur_qvel = M.get_qvel_fd(state.prev_qpos, cur_qpos, dt, p.obs_coord)
    cur_rlinv_local = cur_qvel[:3]
    cur_rangv = cur_qvel[3:6]
    cur_rq_rmh = M.de_heading(cur_qpos[3:7])
    cur_bquat = state.bquat
    cur_bangvel = M.get_angvel_fd(state.prev_bquat, cur_bquat, dt)

    e_qpos = expert.qpos[e, ind]
    e_rlinv_local = expert.rlinv_local[e, ind]
    e_rangv = expert.rangv[e, ind]
    e_rq_rmh = expert.rq_rmh[e, ind]
    e_ee = expert.ee_pos[e, ind]
    e_bquat = expert.bquat[e, ind]
    e_bangvel = expert.bangvel[e, ind]

    # pose reward (ignores root: bquat[4:])
    pose_diff = M.multi_quat_norm(M.multi_quat_diff(cur_bquat[4:], e_bquat[4:]))
    pose_diff = pose_diff * p.b_diffw
    pose_dist = jnp.linalg.norm(pose_diff)
    pose_reward = jnp.exp(-k_p * pose_dist ** 2)
    # velocity reward (ignores root: bangvel[3:])
    vel_dist = jnp.linalg.norm(cur_bangvel[3:] - e_bangvel[3:], ord=p.v_ord)
    vel_reward = jnp.exp(-k_v * vel_dist ** 2)
    # end-effector reward
    ee_dist = jnp.linalg.norm(cur_ee - e_ee)
    ee_reward = jnp.exp(-k_e * ee_dist ** 2)
    # root pose reward
    root_height_dist = cur_qpos[2] - e_qpos[2]
    root_quat_dist = M.multi_quat_norm(M.multi_quat_diff(cur_rq_rmh, e_rq_rmh))[0]
    root_pose_reward = jnp.exp(-k_rh * root_height_dist ** 2
                               - k_rq * root_quat_dist ** 2)
    # root velocity reward
    root_linv_dist = jnp.linalg.norm(cur_rlinv_local - e_rlinv_local)
    root_angv_dist = jnp.linalg.norm(cur_rangv - e_rangv)
    root_vel_reward = jnp.exp(-k_rl * root_linv_dist ** 2
                              - k_ra * root_angv_dist ** 2)

    reward = (w_p * pose_reward + w_v * vel_reward + w_e * ee_reward
              + w_rp * root_pose_reward + w_rv * root_vel_reward)
    reward = reward / (w_p + w_v + w_e + w_rp + w_rv)
    if p.reward_decay:
        reward = reward * (1.0 - state.cur_t.astype(reward.dtype)
                           / p.env_episode_len)
    reward = reward + jnp.where(is_end, end_reward, 0.0)
    comps = jnp.stack([pose_reward, vel_reward, ee_reward, root_pose_reward,
                       root_vel_reward])
    return reward, comps


def constant_reward(p, expert, state, cur_ee, dt, end_reward, is_end):
    """constant_reward (reward_function.py:63-67)."""
    r = 1.0 + jnp.where(is_end, end_reward, 0.0)
    return r, jnp.zeros(5, state.qpos.dtype)


def pose_dist_reward(p, expert, state, cur_ee, dt, end_reward, is_end):
    """pose_dist_reward (reward_function.py:70-75)."""
    ind = state.start_ind + state.cur_t
    diff = expert.qpos[state.expert_ind, ind] - state.qpos
    pose_dist = jnp.linalg.norm(diff[2:])
    r = 5.0 - 3.0 * pose_dist + jnp.where(is_end, end_reward, 0.0)
    return r, jnp.concatenate([pose_dist[None], jnp.zeros(4, state.qpos.dtype)])


REWARD_FUNCS = {"quat_v3": quat_space_reward_v3,
                "constant": constant_reward,
                "pose_dist": pose_dist_reward}


# ---------------------------------------------------------------------------
# reset / step
# ---------------------------------------------------------------------------

def reset(model: PhysicsModel, p: EnvParams, tables: BodyTables,
          expert: ExpertBatch, key: jax.Array,
          fix_expert_ind: jax.Array | None = None,
          fix_start_ind: jax.Array | None = None) -> EnvState:
    """Episode initialization mirroring reset_model (humanoid_v1.py:201-231):
    sample an expert take and start frame, initialize from the expert state
    with joint noise."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_expert = expert.qpos.shape[0]
    if fix_expert_ind is None:
        expert_ind = jax.random.randint(k1, (), 0, n_expert)
    else:
        expert_ind = jnp.asarray(fix_expert_ind)
    if fix_start_ind is None:
        if p.env_start_first:
            start_ind = jnp.zeros((), jnp.int32)
        else:
            hi = expert.lens[expert_ind] - p.env_episode_len - p.fr_margin
            start_ind = jax.random.randint(k2, (), p.fr_margin,
                                           jnp.maximum(hi, p.fr_margin + 1))
    else:
        start_ind = jnp.asarray(fix_start_ind)

    # random_cur_t (humanoid_v1.py:218-220): start mid-episode; the expert
    # index start_ind + cur_t keeps the same window contract
    if p.random_cur_t and fix_start_ind is None:
        cur_t0 = jax.random.randint(k4, (), 0, p.env_episode_len)
    else:
        cur_t0 = jnp.zeros((), jnp.int32)
    init_ind = start_ind + cur_t0
    qpos = expert.qpos[expert_ind, init_ind]
    qvel = expert.qvel[expert_ind, init_ind]
    noise = p.env_init_noise * jax.random.normal(k3, (p.nq - 7,), qpos.dtype)
    qpos = qpos.at[7:].add(noise)
    bq = get_body_quat(tables, qpos)
    return EnvState(qpos=qpos, qvel=qvel,
                    cur_t=cur_t0.astype(jnp.int32),
                    expert_ind=expert_ind.astype(jnp.int32),
                    start_ind=start_ind.astype(jnp.int32),
                    prev_qpos=qpos, prev_bquat=bq, bquat=bq,
                    done=jnp.zeros((), bool))


def apply_action(p: EnvParams, action: jax.Array) -> jax.Array:
    """Action -> PD target / torque (humanoid_v1.py:176-177)."""
    return p.a_ref + action * p.a_scale


def step(model: PhysicsModel, p: EnvParams, tables: BodyTables,
         expert: ExpertBatch, state: EnvState, action: jax.Array,
         end_reward=0.0, fix_len: int | None = None,
         fix_head_lb: jax.Array | None = None):
    """One 30 Hz control step mirroring HumanoidEnv.step
    (humanoid_v1.py:179-199): 15 stable-PD physics substeps, then obs,
    custom reward, and fail/end detection."""
    ctrl = apply_action(p, action)
    if p.action_type == "position":
        qpos, qvel = engine.pd_control_step(
            model, state.qpos, state.qvel, ctrl, p.jkp, p.jkd, p.torque_lim,
            p.frame_skip, p.contact)
    else:
        qpos, qvel = engine.torque_control_step(
            model, state.qpos, state.qvel, ctrl, p.torque_lim, p.frame_skip,
            p.contact)
    return finish_step(model, p, tables, expert, state, qpos, qvel,
                       end_reward, fix_len, fix_head_lb)


def finish_step(model: PhysicsModel, p: EnvParams, tables: BodyTables,
                expert: ExpertBatch, state: EnvState, qpos: jax.Array,
                qvel: jax.Array, end_reward=0.0, fix_len: int | None = None,
                fix_head_lb: jax.Array | None = None):
    """Post-physics half of ``step``: bookkeeping, fail/end detection,
    reward, observation.  Split out so an external physics engine (the
    MuJoCo C oracle in the cross-engine parity harness, envs/mujoco_oracle
    .py) can drive the identical env semantics from its own (qpos, qvel).

    Divergence guard: MuJoCo C flags a diverged simulation via engine
    warnings (mjWARN_BADQACC / values over mjMAXVAL) before state ever
    reaches the learner; a batched jitted rollout has no warning channel,
    and a NaN lane is invisible to the head-height fail check (NaN
    comparisons are False), so one blown-up lane would poison the whole
    PPO update through the batch mean (observed once: forecast warm-start
    run, iter 593).  Here a non-finite or absurd-velocity (|qvel| > 1e8)
    state terminates the episode as a failure and the stored state is
    sanitized to the pre-step qpos / zero qvel so every downstream
    consumer (obs, reward, GAE) stays finite."""
    dt = model.timestep * p.frame_skip
    cur_t = state.cur_t + 1
    diverged = ~(jnp.isfinite(qpos).all() & jnp.isfinite(qvel).all()) \
        | (jnp.max(jnp.abs(qvel)) > 1e8)
    qpos = jnp.where(diverged, state.qpos, qpos)
    qvel = jnp.where(diverged, jnp.zeros_like(qvel), qvel)
    bq = get_body_quat(tables, qpos)
    new_state = EnvState(qpos=qpos, qvel=qvel, cur_t=cur_t,
                         expert_ind=state.expert_ind,
                         start_ind=state.start_ind,
                         prev_qpos=state.qpos, prev_bquat=state.bquat,
                         bquat=bq, done=state.done)

    kin = engine.fk(model, qpos)
    head_z = kin.xpos[tables.head_body, 2]
    if fix_head_lb is not None:
        fail = head_z < fix_head_lb
    else:
        fail = head_z < expert.head_height_lb[state.expert_ind] - 0.1
    fail = fail | diverged
    ep_len = p.env_episode_len if fix_len is None else fix_len
    end = cur_t >= ep_len
    done = fail | end

    cur_ee = get_ee_pos(tables, kin, qpos, p.obs_coord)
    reward_fn = REWARD_FUNCS[p.reward_id]
    reward, comps = reward_fn(p, expert, new_state, cur_ee, dt, end_reward, end)
    # a diverged step carries no learning signal (the reference's MuJoCo
    # warning would have discarded it); its sanitized state already keeps
    # the math finite, the zero reward keeps it meaningless
    reward = jnp.where(diverged, 0.0, reward)
    comps = jax.tree_util.tree_map(
        lambda c: jnp.where(diverged, 0.0, c), comps)

    obs = get_obs(p, qpos, qvel, cur_t)
    new_state = new_state._replace(done=done)
    return new_state, StepOut(obs=obs, reward=reward, done=done, fail=fail,
                              end=end, reward_info=comps)


def observe(p: EnvParams, state: EnvState) -> jax.Array:
    """Observation of the current state (used after reset)."""
    return get_obs(p, state.qpos, state.qvel, state.cur_t)


def step_autoreset(model: PhysicsModel, p: EnvParams, tables: BodyTables,
                   expert: ExpertBatch, state: EnvState, action: jax.Array,
                   key: jax.Array, end_reward=0.0):
    """step + masked auto-reset: when the previous step ended the episode the
    lane re-initializes instead of stepping.  This replaces the per-worker
    while-loop episode structure of the reference sampler
    (agents/agent.py:36-70) with a fixed-shape batched rollout."""
    fresh = reset(model, p, tables, expert, key)
    stepped, out = step(model, p, tables, expert, state, action, end_reward)
    was_done = state.done
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(was_done, a, b), fresh, stepped)
    obs = jnp.where(was_done, observe(p, fresh), out.obs)
    # a reset step yields no transition: mask it out of the batch via `valid`
    out = out._replace(obs=obs,
                       reward=jnp.where(was_done, 0.0, out.reward),
                       done=jnp.where(was_done, False, out.done))
    return new_state, out, was_done
