"""AgentForecast: PPO for ego-forecasting (mirrors ego_forecast.py's use of
AgentEgo with VideoForecastNet context nets).

Differences from ego-mimic: the video context is the *final hidden state* of
a causal LSTM over only the fr_margin past frames (fixed per episode), and an
optional per-step state-LSTM runs inside the rollout scan (step mode) /
batch-unrolls in the update (train mode) -- video_forecast_net.py:58-107.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import envs
from ..models.video_forecast_net import VideoForecastNet
from ..ops import running_norm
from . import ppo
from .agent_ego import AgentEgo
from .distributions import diag_gaussian_sample
from .rollout import SegmentBatch


def gather_past_windows(cnn_feat, expert_ind, start_ind, margin):
    """Per-lane past-only CNN windows [start-margin, start)."""
    def one(e, s):
        return jax.lax.dynamic_slice_in_dim(cnn_feat[e], s - margin, margin,
                                            axis=0)
    return jax.vmap(one)(expert_ind, start_ind)


def rollout_segment_forecast(model, p, tables, expert, cnn_feat,
                             policy_apply, policy_params,
                             vs_net: VideoForecastNet, vs_params,
                             zstat, key, batch, noise_rate,
                             mean_action=False, end_reward=0.0, z_clip=5.0,
                             lane_shard=None):
    """Forecast sampler: fixed per-episode video context + s-LSTM carry.

    ``lane_shard``: as in rollout.rollout_segment -- constraining the reset
    keys seeds GSPMD's lane-wise partitioning of the whole rollout."""
    t_len = p.env_episode_len
    k_reset, k_scan = jax.random.split(key)
    reset_keys = jax.random.split(k_reset, batch)
    if lane_shard is not None:
        reset_keys = jax.lax.with_sharding_constraint(reset_keys, lane_shard)
    state = jax.vmap(lambda k: envs.reset(model, p, tables, expert, k))(reset_keys)

    windows = gather_past_windows(cnn_feat, state.expert_ind, state.start_ind,
                                  p.fr_margin)
    v_out = vs_net.apply(vs_params, windows, method=vs_net.encode_video)

    obs0 = jax.vmap(lambda s: envs.observe(p, s))(state)
    zstat = running_norm.push_batch(zstat, obs0)
    zobs0 = running_norm.apply(zstat, obs0, clip=z_clip)
    s_carry0 = vs_net.s_init_carry((batch,), obs0.dtype)

    def reanchor(st, key):
        ind = st.start_ind + st.cur_t
        qpos = expert.qpos[st.expert_ind, ind]
        qvel = expert.qvel[st.expert_ind, ind]
        noise = p.env_init_noise * jax.random.normal(key, (p.nq - 7,),
                                                     qpos.dtype)
        qpos = qpos.at[7:].add(noise)
        bq = envs.get_body_quat(tables, qpos)
        return st._replace(qpos=qpos, qvel=qvel, prev_qpos=qpos,
                           prev_bquat=bq, bquat=bq,
                           done=jnp.zeros((), bool))

    def step_fn(carry, xs):
        st, zobs, zst, s_carry = carry
        t, key = xs
        k_gate, k_act, k_anchor = jax.random.split(key, 3)

        s_carry, s_out = vs_net.apply(vs_params, s_carry, zobs,
                                      method=vs_net.s_step)
        vctx = v_out[:, t] if v_out.ndim == 3 else v_out
        policy_in = jnp.concatenate([vctx, s_out], axis=-1)
        mean, log_std = policy_apply(policy_params, policy_in)
        gate = jax.random.bernoulli(k_gate, noise_rate, (batch,))
        exp = jnp.zeros(batch, bool) if mean_action else gate
        sampled = diag_gaussian_sample(k_act, mean, log_std)
        action = jnp.where(exp[:, None], sampled, mean)

        new_st, out = jax.vmap(
            lambda s, a: envs.step(model, p, tables, expert, s, a, end_reward)
        )(st, action)
        anchor_keys = jax.random.split(k_anchor, batch)
        anchored = jax.vmap(reanchor)(new_st, anchor_keys)
        new_st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                out.fail.reshape((batch,) + (1,) * (a.ndim - 1)), a, b),
            anchored, new_st)
        # the s-LSTM state resets with the episode (reference re-initializes
        # per episode, agent_ego pre_episode)
        fresh_carry = vs_net.s_init_carry((batch,), zobs.dtype)
        s_carry = jax.tree_util.tree_map(
            lambda a, b: jnp.where(out.fail[:, None], a, b),
            fresh_carry, s_carry) if s_carry != () else s_carry

        next_obs = jnp.where(out.fail[:, None],
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
            fails=out.fail.astype(zobs.dtype))
        return (new_st, next_zobs, zst, s_carry), rec

    keys = jax.random.split(k_scan, t_len)
    (state, _, zstat, _), recs = jax.lax.scan(
        step_fn, (state, zobs0, zstat, s_carry0),
        (jnp.arange(t_len), keys))
    recs = recs._replace(expert_ind=recs.expert_ind[0],
                         start_ind=recs.start_ind[0])
    return recs, zstat


def warmstart_from_mimic(train_state, mimic_cp):
    """Initialize forecast policy/value from an ego-mimic checkpoint,
    dropping the first hidden layer when input dims differ
    (ego_forecast.py:60-69 + utils/torch.py filter_state_dict)."""
    def merge(dst, src):
        out = jax.tree_util.tree_map(lambda x: x, dst)
        def walk(d, s):
            for k, v in s.items():
                if k not in d:
                    continue
                if isinstance(v, dict):
                    walk(d[k], v)
                elif d[k].shape == v.shape:
                    d[k] = jnp.asarray(v)
        walk(out["params"], src["params"])
        return out

    return train_state._replace(
        policy=merge(train_state.policy, mimic_cp["policy_dict"]),
        value=merge(train_state.value, mimic_cp["value_dict"]))


def make_forecast_agent(model, spec, params, tables, expert, cnn_feat, cfg,
                        batch_lanes=1024, seed=1, dtype=jnp.float32,
                        mesh=None):
    """Build an AgentEgo-compatible orchestrator for forecasting.

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel training --
    same contract as AgentEgo (lanes sharded on the first mesh axis, params
    replicated)."""
    agent = AgentEgo.__new__(AgentEgo)
    agent.model, agent.spec, agent.p, agent.tables = model, spec, params, tables
    agent.expert, agent.cnn_feat = expert, jnp.asarray(cnn_feat, dtype)
    agent.cfg = cfg
    agent.dtype = dtype
    agent.batch_lanes = batch_lanes
    agent.end_reward = 0.0
    agent.noise_rate = 1.0
    agent.mesh = mesh
    agent._lane_shard = None
    if mesh is not None:
        from ..parallel import mesh as meshlib
        from jax.sharding import NamedSharding, PartitionSpec
        n_dev = len(list(mesh.devices.flat))
        if batch_lanes % n_dev != 0:
            raise ValueError(f"batch_lanes={batch_lanes} not divisible by "
                             f"mesh size {n_dev}")
        agent._lane_shard = NamedSharding(mesh,
                                          PartitionSpec(mesh.axis_names[0]))
        agent.expert = meshlib.replicate(mesh, agent.expert)
        agent.cnn_feat = meshlib.replicate(mesh, agent.cnn_feat)
    agent._update_key = jax.random.PRNGKey(seed + 17)
    mbs = getattr(cfg, "mini_batch_size", None)
    agent.mini_batch_lanes = 0
    if mbs and mbs < batch_lanes * params.env_episode_len:
        agent.mini_batch_lanes = max(1, int(mbs) // params.env_episode_len)
    cnn_fdim = int(agent.cnn_feat.shape[-1])
    obs_dim = params.obs_dim

    from .nets import PolicyGaussian, Value
    policy_vs = VideoForecastNet(cnn_fdim, obs_dim, cfg.policy_v_hdim,
                                 cfg.fr_margin, cfg.policy_v_net,
                                 cfg.policy_v_net_param, cfg.policy_s_hdim,
                                 cfg.policy_s_net, cfg.policy_dyn_v)
    value_vs = VideoForecastNet(cnn_fdim, obs_dim, cfg.value_v_hdim,
                                cfg.fr_margin, cfg.value_v_net,
                                cfg.value_v_net_param, cfg.value_s_hdim,
                                cfg.value_s_net, cfg.value_dyn_v)
    agent.policy_vs_net, agent.value_vs_net = policy_vs, value_vs
    agent.policy_net = PolicyGaussian(
        action_dim=spec.nu, hidden_dims=tuple(cfg.policy_hsize),
        activation=cfg.policy_htype, log_std_init=cfg.log_std,
        fix_std=cfg.fix_std)
    agent.value_net = Value(hidden_dims=tuple(cfg.value_hsize),
                            activation=cfg.value_htype)

    k = jax.random.PRNGKey(seed)
    kp, kv, kpv, kvv, ks = jax.random.split(k, 5)
    dummy_win = jnp.zeros((1, cfg.fr_margin, cnn_fdim), dtype)
    dummy_state = jnp.zeros((2, 1, obs_dim), dtype)

    def init_forecast(net, key):
        v = net.init(key, dummy_win, method=net.encode_video)
        if net.s_net_type == "lstm":
            v2 = net.init(key, dummy_state, method=net.s_batch)
            v = {"params": {**v["params"], **v2["params"]}}
        return v

    p_pvs = init_forecast(policy_vs, kpv)
    p_vvs = init_forecast(value_vs, kvv)
    p_pol = agent.policy_net.init(kp, jnp.zeros((1, policy_vs.out_dim), dtype))
    p_val = agent.value_net.init(kv, jnp.zeros((1, value_vs.out_dim), dtype))

    agent.opt_p, agent.opt_v = ppo.make_optimizers(
        cfg.policy_lr, cfg.value_lr, grad_clip=40.0,
        policy_weight_decay=cfg.policy_weightdecay,
        value_weight_decay=cfg.value_weightdecay)
    agent.train_state = ppo.TrainState(
        policy=p_pol, policy_vs=p_pvs, value=p_val, value_vs=p_vvs,
        opt_policy=agent.opt_p.init((p_pol, p_pvs)),
        opt_value=agent.opt_v.init((p_val, p_vvs)))
    agent.zstat = running_norm.init_stat(obs_dim, dtype)
    agent.hyper = ppo.PPOHyper(
        gamma=cfg.gamma, tau=cfg.tau,
        clip_epsilon=cfg.clip_epsilon,
        num_epochs=cfg.num_optim_epoch,
        kl_target=float(getattr(cfg, "policy_kl_target", 0.0) or 0.0))
    if mesh is not None:
        from ..parallel import mesh as meshlib
        agent.train_state = meshlib.replicate(mesh, agent.train_state)
        agent.zstat = meshlib.replicate(mesh, agent.zstat)

    policy_apply = lambda p, x: agent.policy_net.apply(p, x)
    value_apply = lambda p, x: agent.value_net.apply(p, x)

    def fctx(net):
        def apply(p_vs, windows, states):
            v = net.apply(p_vs, windows, method=net.encode_video)  # (B,vh)
            t_len = states.shape[0]
            if v.ndim == 2:
                v = jnp.broadcast_to(v[None], (t_len,) + v.shape)
            else:
                v = v.transpose(1, 0, 2)
            s = net.apply(p_vs, states, method=net.s_batch)
            return jnp.concatenate([v, s], -1)
        return apply

    pctx_apply, vctx_apply = fctx(policy_vs), fctx(value_vs)
    agent._applies = (policy_apply, None, value_apply, None)
    agent._ctx_applies = (pctx_apply, vctx_apply)

    def sample_fn(p_env, expert_arg, cnn_arg, p_pol, p_pvs, zstat, key,
                  noise_rate, mean_action, end_reward):
        return rollout_segment_forecast(
            model, p_env, tables, expert_arg, cnn_arg, policy_apply,
            p_pol, policy_vs, p_pvs, zstat, key, batch_lanes, noise_rate,
            mean_action, end_reward, lane_shard=agent._lane_shard)

    agent._sample_fn = jax.jit(sample_fn, static_argnames=("mean_action",))

    agent.objective = getattr(cfg, "policy_objective", None) or "ppo"
    if agent.objective not in ("ppo", "a2c", "trpo"):
        raise ValueError(f"policy_objective must be ppo|a2c|trpo, got "
                         f"{agent.objective!r}")

    if agent.objective == "trpo":
        from . import trpo as _trpo
        t_hyper = _trpo.TRPOHyper(
            max_kl=float(getattr(cfg, "max_kl", None) or 1e-2),
            damping=float(getattr(cfg, "cg_damping", None) or 1e-2),
            cg_iters=int(getattr(cfg, "cg_iters", None) or 10))

        def update_fn(ts, batch, windows, key):
            return _trpo.trpo_update(ts, agent.opt_v, agent.hyper, t_hyper,
                                     batch, windows, policy_apply,
                                     pctx_apply, value_apply, vctx_apply)
    else:
        def update_fn(ts, batch, windows, key):
            return ppo.ppo_update(ts, agent.opt_p, agent.opt_v, agent.hyper,
                                  batch, windows, policy_apply, pctx_apply,
                                  value_apply, vctx_apply, key=key,
                                  mini_batch_lanes=agent.mini_batch_lanes,
                                  objective=agent.objective)

    agent._update_fn = jax.jit(update_fn)

    def update_params(batch):
        windows = gather_past_windows(agent.cnn_feat, batch.expert_ind,
                                      batch.start_ind, params.fr_margin)
        agent._update_key, sub = jax.random.split(agent._update_key)
        if mesh is not None:
            from ..parallel import mesh as meshlib
            sub = meshlib.replicate(mesh, sub)
        agent.train_state, metrics = agent._update_fn(agent.train_state,
                                                      batch, windows, sub)
        return {k: float(v) for k, v in metrics.items()}

    agent.update_params = update_params
    return agent
