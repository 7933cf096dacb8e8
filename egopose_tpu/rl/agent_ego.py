"""AgentEgo: orchestrates video-conditioned PPO (sampling + updates).

The TPU-native counterpart of /root/reference/ego_pose/core/agent_ego.py +
agents/agent_ppo.py: one jitted batched sampler (replacing the fork-based
worker pool) and one jitted multi-epoch PPO update, with the video context
nets threaded through both exactly like trans_policy/trans_value.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs
from ..models.video_state_net import VideoStateNet
from ..ops import running_norm
from . import ppo, rollout
from .nets import PolicyGaussian, Value


def _restore_like(template, data):
    """Rebuild ``template``'s pytree (optax namedtuples, dicts, sequences)
    from an orbax-restored nested dict, associating leaves by *path* -- field
    names for namedtuples, keys for dicts, indices for sequences -- never by
    flatten order."""
    if data is None:
        return template
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        return type(template)(*[
            _restore_like(getattr(template, f), data[f] if f in data else None)
            for f in template._fields])
    if isinstance(template, (list, tuple)):
        if isinstance(data, dict):  # orbax may key sequences by index
            data = [data.get(str(i), data.get(i))
                    for i in range(len(template))]
        return type(template)(
            _restore_like(t, d) for t, d in zip(template, data))
    if isinstance(template, dict):
        return {k: _restore_like(template[k],
                                 data[k] if k in data else None)
                for k in template}
    return jnp.asarray(data)


class SampleLog(NamedTuple):
    num_steps: float
    num_episodes: float
    avg_episode_len: float
    avg_c_reward: float
    min_c_reward: float
    max_c_reward: float
    avg_c_info: np.ndarray
    fail_rate: float
    sample_time: float = 0.0


class AgentEgo:
    """Host-side orchestrator holding params, optimizers and jitted fns."""

    def __init__(self, model, spec, params: envs.EnvParams, tables,
                 expert: envs.ExpertBatch, cnn_feat, cfg, batch_lanes=1024,
                 seed=1, dtype=jnp.float32, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` for data-parallel training
        -- rollout lanes and update batches are sharded on the mesh's first
        axis, parameters/statistics replicated; XLA inserts the ICI
        collectives.  The distributed replacement for the reference's
        fork-based worker pool (agents/agent.py:93-105)."""
        self.model, self.spec, self.p, self.tables = model, spec, params, tables
        self.expert, self.cnn_feat = expert, jnp.asarray(cnn_feat, dtype)
        self.cfg = cfg
        self.dtype = dtype
        self.batch_lanes = batch_lanes
        self.mesh = mesh
        self._lane_shard = None
        if mesh is not None:
            from ..parallel import mesh as meshlib
            axis = mesh.axis_names[0]
            n_lane_dev = int(mesh.shape[axis])
            if batch_lanes % n_lane_dev != 0:
                raise ValueError(
                    f"batch_lanes={batch_lanes} not divisible by the "
                    f"{axis!r} mesh axis ({n_lane_dev})")
            from jax.sharding import NamedSharding, PartitionSpec
            self._lane_shard = NamedSharding(mesh, PartitionSpec(axis))
            self.expert = meshlib.replicate(mesh, self.expert)
            self.cnn_feat = meshlib.replicate(mesh, self.cnn_feat)
        self.end_reward = 0.0
        self.noise_rate = 1.0
        cnn_fdim = int(self.cnn_feat.shape[-1])
        obs_dim = params.obs_dim

        self.policy_net = PolicyGaussian(
            action_dim=spec.nu, hidden_dims=tuple(cfg.policy_hsize),
            activation=cfg.policy_htype, log_std_init=cfg.log_std,
            fix_std=cfg.fix_std)
        self.value_net = Value(hidden_dims=tuple(cfg.value_hsize),
                               activation=cfg.value_htype)
        self.policy_vs_net = VideoStateNet(
            cnn_fdim, cfg.policy_v_hdim, cfg.fr_margin, cfg.policy_v_net,
            cfg.policy_v_net_param, cfg.causal)
        self.value_vs_net = VideoStateNet(
            cnn_fdim, cfg.value_v_hdim, cfg.fr_margin, cfg.value_v_net,
            cfg.value_v_net_param, cfg.causal)

        k = jax.random.PRNGKey(seed)
        kp, kv, kpv, kvv = jax.random.split(k, 4)
        dummy_win = jnp.zeros((1, params.env_episode_len + 2 * cfg.fr_margin,
                               cnn_fdim), dtype)
        p_pvs = self.policy_vs_net.init(kpv, dummy_win)
        p_vvs = self.value_vs_net.init(kvv, dummy_win)
        p_pol = self.policy_net.init(
            kp, jnp.zeros((1, obs_dim + cfg.policy_v_hdim), dtype))
        p_val = self.value_net.init(
            kv, jnp.zeros((1, obs_dim + cfg.value_v_hdim), dtype))

        self.opt_p, self.opt_v = ppo.make_optimizers(
            cfg.policy_lr, cfg.value_lr, grad_clip=40.0,
            policy_weight_decay=cfg.policy_weightdecay,
            value_weight_decay=cfg.value_weightdecay)
        self.train_state = ppo.TrainState(
            policy=p_pol, policy_vs=p_pvs, value=p_val, value_vs=p_vvs,
            opt_policy=self.opt_p.init((p_pol, p_pvs)),
            opt_value=self.opt_v.init((p_val, p_vvs)))
        self.zstat = running_norm.init_stat(obs_dim, dtype)
        self.hyper = ppo.PPOHyper(
            gamma=cfg.gamma, tau=cfg.tau,
            clip_epsilon=cfg.clip_epsilon,
            num_epochs=cfg.num_optim_epoch,
            kl_target=float(getattr(cfg, "policy_kl_target", 0.0) or 0.0))
        if mesh is not None:
            from ..parallel import mesh as meshlib
            self.train_state = meshlib.replicate(mesh, self.train_state)
            self.zstat = meshlib.replicate(mesh, self.zstat)

        policy_apply = lambda p, x: self.policy_net.apply(p, x)
        value_apply = lambda p, x: self.value_net.apply(p, x)
        pvs_apply = lambda p, w: self.policy_vs_net.apply(p, w)
        vvs_apply = lambda p, w: self.value_vs_net.apply(p, w)
        if mesh is not None and "time" in mesh.axis_names \
                and int(mesh.shape["time"]) > 1:
            # DP x SP: lanes shard over axis0, the context encode over the
            # "time" axis (parallel/seqpar.py) -- numerically equal to the
            # unsharded pass (the vs nets run deterministic in both the
            # rollout and the update, so no dropout-stream divergence)
            if cfg.policy_v_net != "tcn" or cfg.value_v_net != "tcn":
                raise ValueError(
                    "a 'time' mesh axis (sequence parallelism) requires TCN "
                    f"context nets (got policy={cfg.policy_v_net!r}, "
                    f"value={cfg.value_v_net!r})")
            from ..parallel import seqpar
            lane_axis = mesh.axis_names[0]
            pvs_apply = lambda p, w: seqpar.vsnet_encode_sp(
                mesh, self.policy_vs_net, p, w, axis="time",
                batch_axis=lane_axis)
            vvs_apply = lambda p, w: seqpar.vsnet_encode_sp(
                mesh, self.value_vs_net, p, w, axis="time",
                batch_axis=lane_axis)
        self._applies = (policy_apply, pvs_apply, value_apply, vvs_apply)

        def pctx_apply(p_vs, windows, states):
            v_ctx = pvs_apply(p_vs, windows)             # (B,T,vh)
            return jnp.concatenate([v_ctx.transpose(1, 0, 2), states], -1)

        def vctx_apply(p_vs, windows, states):
            v_ctx = vvs_apply(p_vs, windows)
            return jnp.concatenate([v_ctx.transpose(1, 0, 2), states], -1)

        self._ctx_applies = (pctx_apply, vctx_apply)

        lane_shard = self._lane_shard

        def sample_fn(p_env, expert_arg, cnn_arg, p_pol, p_pvs, zstat, key,
                      noise_rate, mean_action, end_reward):
            return rollout.rollout_segment(
                model, p_env, tables, expert_arg, cnn_arg,
                policy_apply, p_pol, pvs_apply, p_pvs, zstat, key,
                batch_lanes, noise_rate, mean_action, end_reward,
                lane_shard=lane_shard)

        self._sample_fn = jax.jit(sample_fn, static_argnames=("mean_action",))

        # optional shuffled-minibatch PPO (agent_ppo.py:24-43): cfg counts
        # steps, our slices are lane-grained -> lanes per minibatch
        mbs = getattr(cfg, "mini_batch_size", None)
        self.mini_batch_lanes = 0
        if mbs and mbs < batch_lanes * params.env_episode_len:
            self.mini_batch_lanes = max(1, int(mbs) // params.env_episode_len)
        self._update_key = jax.random.PRNGKey(seed + 17)
        # "ppo" (shipped configs), "a2c" (the reference's standalone
        # vanilla-PG AgentPG, agents/agent_pg.py:28-38), or "trpo"
        # (AgentTRPO, agents/agent_trpo.py:43-137 via rl/trpo.trpo_update)
        self.objective = getattr(cfg, "policy_objective", None) or "ppo"
        if self.objective not in ("ppo", "a2c", "trpo"):
            raise ValueError(
                f"policy_objective must be ppo|a2c|trpo, got "
                f"{self.objective!r}")

        if self.objective == "trpo":
            from . import trpo as _trpo
            t_hyper = _trpo.TRPOHyper(
                max_kl=float(getattr(cfg, "max_kl", None) or 1e-2),
                damping=float(getattr(cfg, "cg_damping", None) or 1e-2),
                cg_iters=int(getattr(cfg, "cg_iters", None) or 10))

            def update_fn(ts, batch, windows, key):
                return _trpo.trpo_update(ts, self.opt_v, self.hyper,
                                         t_hyper, batch, windows,
                                         policy_apply, pctx_apply,
                                         value_apply, vctx_apply)
        else:
            def update_fn(ts, batch, windows, key):
                return ppo.ppo_update(ts, self.opt_p, self.opt_v, self.hyper,
                                      batch, windows, policy_apply,
                                      pctx_apply, value_apply, vctx_apply,
                                      key=key,
                                      mini_batch_lanes=self.mini_batch_lanes,
                                      objective=self.objective)

        self._update_fn = jax.jit(update_fn)

    # -- reference pre_iter_update hooks (ego_mimic.py:93-99) ---------------
    def set_noise_rate(self, r):
        self.noise_rate = float(r)

    def set_policy_lr(self, lr):
        self.train_state.opt_policy.hyperparams["learning_rate"] = jnp.asarray(lr)

    def fill_log_std(self, log_std):
        pol = self.train_state.policy
        pol = jax.tree_util.tree_map(lambda x: x, pol)  # shallow copy
        pol["params"]["action_log_std"] = jnp.full_like(
            pol["params"]["action_log_std"], log_std)
        self.train_state = self.train_state._replace(policy=pol)

    # -- sampling ------------------------------------------------------------
    def sample(self, key, min_batch_size, mean_action=False):
        import time
        t0 = time.time()
        if self.mesh is not None:
            from ..parallel import mesh as meshlib
            key = meshlib.replicate(self.mesh, key)
        per_seg = self.batch_lanes * self.p.env_episode_len
        n_seg = max(1, int(np.ceil(min_batch_size / per_seg)))
        segs = []
        for i in range(n_seg):
            key, sub = jax.random.split(key)
            seg, self.zstat = self._sample_fn(
                self.p, self.expert, self.cnn_feat,
                self.train_state.policy, self.train_state.policy_vs,
                self.zstat, sub, self.noise_rate, mean_action,
                self.end_reward)
            segs.append(seg)
        batch = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=1 if xs[0].ndim > 1 else 0),
            *segs) if n_seg > 1 else segs[0]
        # block before timing: dispatch is async
        batch.rewards.block_until_ready()
        log = self._make_log(batch, time.time() - t0)
        return batch, log

    def _make_log(self, batch, dt):
        valid = np.asarray(batch.valids)
        rewards = np.asarray(batch.rewards)
        n_steps = valid.sum()
        # every lane is one episode plus one more per mid-segment re-anchor
        n_eps = valid.shape[1] + (np.asarray(batch.fails) * valid).sum()
        vsum = max(n_steps, 1.0)
        avg_c = float((rewards * valid).sum() / vsum)
        rv = rewards[valid > 0]
        info = np.asarray(batch.reward_info)
        avg_info = (info * valid[..., None]).sum((0, 1)) / vsum
        return SampleLog(
            num_steps=float(n_steps), num_episodes=float(n_eps),
            avg_episode_len=float(n_steps / n_eps),
            avg_c_reward=avg_c,
            min_c_reward=float(rv.min()) if rv.size else 0.0,
            max_c_reward=float(rv.max()) if rv.size else 0.0,
            avg_c_info=avg_info,
            fail_rate=float((np.asarray(batch.fails) * valid).sum() / n_eps),
            sample_time=dt)

    # -- update ---------------------------------------------------------------
    def update_params(self, batch):
        windows = rollout.gather_windows(
            self.cnn_feat, batch.expert_ind, batch.start_ind,
            self.p.fr_margin, self.p.env_episode_len)
        self._update_key, sub = jax.random.split(self._update_key)
        if self.mesh is not None:
            from ..parallel import mesh as meshlib
            sub = meshlib.replicate(self.mesh, sub)
        self.train_state, metrics = self._update_fn(self.train_state, batch,
                                                    windows, sub)
        out = {k: float(v) for k, v in metrics.items()}
        # non-finite-gradient skip counters (optax.apply_if_finite inside
        # make_optimizers): a nonzero running total is the observability
        # hook for BPTT blowups that would otherwise silently NaN training
        for name, opt_state in (("policy", self.train_state.opt_policy),
                                ("value", self.train_state.opt_value)):
            inner = getattr(opt_state, "inner_state", None)
            tot = getattr(inner, "total_notfinite", None)
            if tot is not None:
                out[f"{name}_grad_skips"] = int(tot)
        return out

    # -- checkpointing (pickle, mirroring the reference's naming) ------------
    def checkpoint(self):
        ts = self.train_state
        return {
            "policy_dict": jax.device_get(ts.policy),
            "policy_vs_dict": jax.device_get(ts.policy_vs),
            "value_dict": jax.device_get(ts.value),
            "value_vs_dict": jax.device_get(ts.value_vs),
            "running_state": jax.device_get(self.zstat),
        }

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.checkpoint(), f)

    def load(self, path):
        """Load a checkpoint pickle -- ours (flax pytrees + RunningStat) or
        the reference's (torch state_dicts + pickled ZFilter,
        ego_mimic.py:133-139), auto-detected.  The tolerant unpickler lets
        reference pickles load even though their ZFilter class is not
        importable here."""
        from ..models import torch_import as ti
        cp = ti.tolerant_pickle_load(path)
        self.load_checkpoint(cp)

    def save_orbax(self, path):
        """Native orbax checkpoint (directory): the TPU-native training
        format (atomic, sharding-aware, async-capable) alongside the
        reference-compatible pickle (SURVEY 5.4).  Unlike the pickle (which
        matches the reference's net-only content) it also carries the
        optimizer states, so a resume continues the exact optimization
        trajectory.  ``path`` is a directory, conventionally
        ``models/iter_%04d.orbax``."""
        import os
        import orbax.checkpoint as ocp
        cp = self.checkpoint()
        rs = cp.pop("running_state")
        cp["running_state"] = {"n": np.asarray(rs.n),
                               "mean": np.asarray(rs.mean),
                               "s": np.asarray(rs.s)}
        cp["opt_policy"] = jax.device_get(self.train_state.opt_policy)
        cp["opt_value"] = jax.device_get(self.train_state.opt_value)
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), cp, force=True)

    def load_orbax(self, path):
        import os
        import orbax.checkpoint as ocp
        cp = dict(ocp.PyTreeCheckpointer().restore(os.path.abspath(path)))
        rs = cp["running_state"]
        cp["running_state"] = running_norm.RunningStat(
            n=jnp.asarray(rs["n"]), mean=jnp.asarray(rs["mean"]),
            s=jnp.asarray(rs["s"]))
        opt_p = cp.pop("opt_policy", None)
        opt_v = cp.pop("opt_value", None)
        self.load_checkpoint(cp)
        if opt_p is not None:
            # rebuild the optax state against the live structure BY FIELD
            # NAME (orbax restores namedtuples as dicts): flatten-order
            # association would silently scramble moments for any optimizer
            # whose field names don't sort into optax's field order
            ts = self.train_state
            opt_p = _restore_like(ts.opt_policy, opt_p)
            opt_v = _restore_like(ts.opt_value, opt_v)
            self.train_state = ts._replace(opt_policy=opt_p, opt_value=opt_v)

    def load_checkpoint(self, cp):
        from ..models import torch_import as ti
        if ti.looks_torch_state_dict(cp.get("policy_dict")):
            # reference checkpoints are torch f64; the session dtype wins
            cp = ti.cast_floats(self._import_reference_checkpoint(cp),
                                self.dtype)
        if self.mesh is not None:
            from ..parallel import mesh as meshlib
            put = lambda tree: meshlib.replicate(self.mesh, tree)
        else:
            put = jax.device_put
        ts = self.train_state
        self.train_state = ts._replace(
            policy=put(cp["policy_dict"]),
            policy_vs=put(cp["policy_vs_dict"]),
            value=put(cp["value_dict"]),
            value_vs=put(cp["value_vs_dict"]))
        rs = cp["running_state"]
        self.zstat = put(running_norm.RunningStat(
            n=jnp.asarray(rs.n), mean=jnp.asarray(rs.mean),
            s=jnp.asarray(rs.s)))

    def _import_reference_checkpoint(self, cp):
        """Route a reference-format checkpoint through the torch-import
        mapping, choosing the context-net importer by the agent's own vs-net
        class (VideoStateNet for ego-mimic, VideoForecastNet for forecast)."""
        from ..models import torch_import as ti
        from ..models.video_forecast_net import VideoForecastNet
        cfg = self.cfg
        if isinstance(self.policy_vs_net, VideoForecastNet):
            return ti.import_forecast_checkpoint(
                cp, policy_v_net=cfg.policy_v_net,
                value_v_net=cfg.value_v_net)
        return ti.import_mimic_checkpoint(
            cp, bi_dir=not cfg.causal, v_net_type=cfg.policy_v_net,
            value_v_net_type=cfg.value_v_net)
