"""Batched on-device rollout sampler.

Replaces the reference's fork-based multiprocess sampling
(/root/reference/agents/agent.py:87-111) with a single jitted
``lax.scan``-over-time of vmapped (policy o env.step) lanes.

Episode structure: lanes run in synchronized fixed-length segments of
``env_episode_len`` steps.  Each segment starts with a batched reset and one
batched bidirectional-LSTM pass over the per-episode CNN-feature windows (the
reference's VideoStateNet test-mode initialize, video_state_net.py:37-39).
When a lane fails mid-segment (head below the expert bound) it is re-anchored
to the expert pose at its current frame -- a new episode in the same context
window, recorded with mask=0 at the failure step so GAE never bootstraps
across the boundary.  Every step of every lane is therefore a valid
transition (the reference's variable-length episodes without the waste of
dead lanes).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .. import envs
from ..ops import running_norm
from .distributions import diag_gaussian_sample


class SegmentBatch(NamedTuple):
    """One segment of transitions, time-major (T, B, ...)."""
    states: jax.Array    # (T,B,obs) z-filtered observations
    actions: jax.Array   # (T,B,nu)
    rewards: jax.Array   # (T,B)
    masks: jax.Array     # (T,B) 0 where the episode ended at this step
    exps: jax.Array      # (T,B) 1 where the action was sampled (exploration)
    valids: jax.Array    # (T,B) 1 for real transitions
    reward_info: jax.Array  # (T,B,5)
    expert_ind: jax.Array   # (B,)
    start_ind: jax.Array    # (B,)
    fails: jax.Array        # (T,B)


def gather_windows(cnn_feat: jax.Array, expert_ind: jax.Array,
                   start_ind: jax.Array, margin: int, ep_len: int) -> jax.Array:
    """Per-lane CNN-feature windows [start-margin, start+ep_len+margin)."""
    w = ep_len + 2 * margin

    def one(e, s):
        take = cnn_feat[e]
        return jax.lax.dynamic_slice_in_dim(take, s - margin, w, axis=0)

    return jax.vmap(one)(expert_ind, start_ind)


def rollout_segment(model, p: envs.EnvParams, tables, expert: envs.ExpertBatch,
                    cnn_feat: jax.Array,
                    policy_apply: Callable, policy_params: Any,
                    policy_vs_apply: Callable, policy_vs_params: Any,
                    zstat: running_norm.RunningStat,
                    key: jax.Array, batch: int, noise_rate,
                    mean_action: bool = False, end_reward=0.0,
                    z_clip: float = 5.0, lane_shard=None):
    """Sample one synchronized segment of `env_episode_len` steps from
    ``batch`` lanes.  Returns (SegmentBatch, new_zstat).

    ``lane_shard``: optional ``NamedSharding`` whose first axis is the data
    axis of a device mesh.  Constraining the per-lane reset keys seeds GSPMD's
    propagation so the whole rollout (env states, policy evals, recorded
    segment) is partitioned lane-wise across the mesh -- the data-parallel
    replacement for the reference's worker fan-out (agents/agent.py:93-105).
    """
    t_len = p.env_episode_len
    k_reset, k_scan = jax.random.split(key)
    reset_keys = jax.random.split(k_reset, batch)
    if lane_shard is not None:
        reset_keys = jax.lax.with_sharding_constraint(reset_keys, lane_shard)
    state = jax.vmap(lambda k: envs.reset(model, p, tables, expert, k))(reset_keys)

    windows = gather_windows(cnn_feat, state.expert_ind, state.start_ind,
                             p.fr_margin, t_len)
    v_out = policy_vs_apply(policy_vs_params, windows)      # (B, T, v_hdim)

    obs0 = jax.vmap(lambda s: envs.observe(p, s))(state)
    zstat = running_norm.push_batch(zstat, obs0)
    zobs0 = running_norm.apply(zstat, obs0, clip=z_clip)

    def reanchor(st: envs.EnvState, key) -> envs.EnvState:
        """Restart a failed lane from the expert pose at its current frame
        (same take, same context window; env_init_noise on the joints).
        A random_cur_t 'end' mid-segment restarts at cur_t = 0."""
        cur_t = jnp.where(st.cur_t >= p.env_episode_len,
                          jnp.zeros((), jnp.int32), st.cur_t)
        ind = st.start_ind + cur_t
        qpos = expert.qpos[st.expert_ind, ind]
        qvel = expert.qvel[st.expert_ind, ind]
        noise = p.env_init_noise * jax.random.normal(key, (p.nq - 7,),
                                                     qpos.dtype)
        qpos = qpos.at[7:].add(noise)
        bq = envs.get_body_quat(tables, qpos)
        return st._replace(qpos=qpos, qvel=qvel, prev_qpos=qpos,
                           prev_bquat=bq, bquat=bq, cur_t=cur_t,
                           done=jnp.zeros((), bool))

    def step_fn(carry, xs):
        st, zobs, zst = carry
        t, key = xs
        k_gate, k_act, k_anchor = jax.random.split(key, 3)

        policy_in = jnp.concatenate([v_out[:, t], zobs], axis=-1)
        mean, log_std = policy_apply(policy_params, policy_in)
        gate = jax.random.bernoulli(k_gate, noise_rate, (batch,))
        exp = jnp.zeros(batch, bool) if mean_action else gate
        sampled = diag_gaussian_sample(k_act, mean, log_std)
        action = jnp.where(exp[:, None], sampled, mean)

        new_st, out = jax.vmap(
            lambda s, a: envs.step(model, p, tables, expert, s, a, end_reward)
        )(st, action)
        # failed lanes restart from the expert at their current frame;
        # with random_cur_t, mid-segment 'end' also restarts (new episode)
        trigger = out.done if p.random_cur_t else out.fail
        anchor_keys = jax.random.split(k_anchor, batch)
        anchored = jax.vmap(reanchor)(new_st, anchor_keys)
        new_st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                trigger.reshape((batch,) + (1,) * (a.ndim - 1)), a, b),
            anchored, new_st)

        next_obs = jnp.where(trigger[:, None],
                             jax.vmap(lambda s: envs.observe(p, s))(new_st),
                             out.obs)
        zst = running_norm.push_batch(zst, next_obs)
        next_zobs = running_norm.apply(zst, next_obs, clip=z_clip)

        rec = SegmentBatch(
            states=zobs, actions=action, rewards=out.reward,
            masks=jnp.where(out.done, 0.0, 1.0),
            exps=exp.astype(zobs.dtype),
            valids=jnp.ones(batch, zobs.dtype),
            reward_info=out.reward_info,
            expert_ind=st.expert_ind, start_ind=st.start_ind,
            fails=trigger.astype(zobs.dtype))
        return (new_st, next_zobs, zst), rec

    keys = jax.random.split(k_scan, t_len)
    (state, _, zstat), recs = jax.lax.scan(
        step_fn, (state, zobs0, zstat),
        (jnp.arange(t_len), keys))
    recs = recs._replace(expert_ind=recs.expert_ind[0],
                         start_ind=recs.start_ind[0])
    return recs, zstat
