"""Video-conditioned GAIL discriminator (mirrors /root/reference/ego_pose/
core/agent_vgail.py).

Adds an adversarial discriminator (MLP over video-context-conditioned states)
to the ego PPO agent: BCE update with generator states labeled 1 and expert
observations labeled 0 (agent_vgail.py:54-73), expert states drawn from the
same (expert_ind, start_ind) windows as the sampled episodes
(agent_vgail.py:75-88).  Present-but-unused in the reference's shipped
configs; provided here for capability parity.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..models.mlp import MLP
from ..ops import running_norm
from .agent_ego import AgentEgo


class Discriminator(nn.Module):
    hidden_dims: tuple = (128, 128)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        h = MLP(self.hidden_dims, self.activation, name="net")(x)
        return nn.Dense(1, name="head")(h)[..., 0]


class VGAILState(NamedTuple):
    discrim: dict
    discrim_vs: dict
    opt_state: object


def make_discriminator(key, in_dim, vs_net, cnn_fdim, window_len,
                       hidden_dims=(128, 128), lr=1e-4):
    disc = Discriminator(hidden_dims)
    k1, k2 = jax.random.split(key)
    p_disc = disc.init(k1, jnp.zeros((1, in_dim)))
    p_vs = vs_net.init(k2, jnp.zeros((1, window_len, cnn_fdim)))
    tx = optax.chain(optax.clip_by_global_norm(40.0), optax.adam(lr))
    state = VGAILState(discrim=p_disc, discrim_vs=p_vs,
                       opt_state=tx.init((p_disc, p_vs)))
    return disc, tx, state


def gail_reward(disc, state: VGAILState, vs_apply, windows, states):
    """-log D(s) style adversarial reward for generator states."""
    v_ctx = vs_apply(state.discrim_vs, windows)
    x = jnp.concatenate([v_ctx.transpose(1, 0, 2), states], -1)
    logits = disc.apply(state.discrim, x)
    return -jax.nn.log_sigmoid(logits)


def update_discriminator(disc, tx, state: VGAILState, vs_apply, windows,
                         gen_states, expert_obs, zstat, num_update=10):
    """BCE discriminator update (agent_vgail.py:54-73): generator label 1,
    expert label 0; expert observations normalized with the sampler's
    running stats (agent_vgail.py:86-87)."""
    e_states = running_norm.apply(zstat, expert_obs, clip=None)

    def loss_fn(params):
        p_disc, p_vs = params
        v_ctx = vs_apply(p_vs, windows).transpose(1, 0, 2)
        g_in = jnp.concatenate([v_ctx, gen_states], -1)
        e_in = jnp.concatenate([v_ctx, e_states], -1)
        g_o = disc.apply(p_disc, g_in)
        e_o = disc.apply(p_disc, e_in)
        l_g = optax.sigmoid_binary_cross_entropy(g_o, jnp.ones_like(g_o))
        l_e = optax.sigmoid_binary_cross_entropy(e_o, jnp.zeros_like(e_o))
        return l_g.mean() + l_e.mean()

    params = (state.discrim, state.discrim_vs)
    opt_state = state.opt_state
    loss = 0.0
    for _ in range(num_update):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
    return VGAILState(discrim=params[0], discrim_vs=params[1],
                      opt_state=opt_state), loss


def gather_expert_obs(expert, expert_ind, start_ind, t_len):
    """Expert observation windows matching the sampled episodes
    (agent_vgail.py:75-88), batched."""
    def one(e, s):
        return jax.lax.dynamic_slice_in_dim(expert.obs[e], s, t_len, axis=0)
    return jax.vmap(one)(expert_ind, start_ind).transpose(1, 0, 2)


class AgentVGAIL(AgentEgo):
    """AgentEgo + adversarial discriminator (the product wiring of the
    pieces above; reference ego_pose/core/agent_vgail.py:7-88).

    Activated by a ``discriminator:`` config block
    ({hidden_dims, lr, num_update, reward_weight}).  The discriminator's
    -log D(s) reward rides the reference's custom_reward hook
    (agents/agent.py:52-56): there it replaces the env reward step-by-step
    inside the sampler; here the recorded batch rewards are replaced
    batched before the update -- identical math, since rewards are
    consumed only by the advantage estimator.  ``reward_weight`` in (0,1)
    blends -log D(s) with the imitation reward (1.0 = pure GAIL, the
    reference's semantics).  Discriminator BCE update runs after the
    policy update, as in agent_vgail.py:43-51.
    """

    def __init__(self, *args, **kwargs):
        from ..models.video_state_net import VideoStateNet
        super().__init__(*args, **kwargs)
        cfg = self.cfg
        dcfg = dict(getattr(cfg, "discriminator", None) or {})
        hidden = tuple(dcfg.get("hidden_dims", (128, 128)))
        lr = float(dcfg.get("lr", 1e-4))
        self.discrim_num_update = int(dcfg.get("num_update", 10))
        self.reward_weight = float(dcfg.get("reward_weight", 1.0))
        if not (0.0 < self.reward_weight <= 1.0):
            raise ValueError("discriminator.reward_weight must be in (0,1]")

        cnn_fdim = int(self.cnn_feat.shape[-1])
        window_len = self.p.env_episode_len + 2 * cfg.fr_margin
        # its own video-context net, same architecture as the policy's
        # (discrim_vs_net, agent_vgail.py:10-18)
        self.discrim_vs_net = VideoStateNet(
            cnn_fdim, cfg.policy_v_hdim, cfg.fr_margin, cfg.policy_v_net,
            cfg.policy_v_net_param, cfg.causal)
        in_dim = self.p.obs_dim + cfg.policy_v_hdim
        kd = jax.random.PRNGKey(kwargs.get("seed", 1) + 29)
        self.discrim_net, self.discrim_tx, self.vgail_state = \
            make_discriminator(kd, in_dim, self.discrim_vs_net, cnn_fdim,
                               window_len, hidden, lr)
        dvs_apply = lambda p, w: self.discrim_vs_net.apply(p, w)

        self._gail_reward_fn = jax.jit(
            lambda st, windows, states: gail_reward(
                self.discrim_net, st, dvs_apply, windows, states))
        self._discrim_update_fn = jax.jit(
            lambda st, windows, gen_states, expert_obs, zstat:
            update_discriminator(self.discrim_net, self.discrim_tx, st,
                                 dvs_apply, windows, gen_states, expert_obs,
                                 zstat, num_update=self.discrim_num_update))

    def update_params(self, batch):
        from . import rollout
        windows = rollout.gather_windows(
            self.cnn_feat, batch.expert_ind, batch.start_ind,
            self.p.fr_margin, self.p.env_episode_len)
        g_r = self._gail_reward_fn(self.vgail_state, windows, batch.states)
        w = self.reward_weight
        shaped = batch._replace(
            rewards=(w * g_r + (1.0 - w) * batch.rewards)
            .astype(batch.rewards.dtype))
        self._update_key, sub = jax.random.split(self._update_key)
        if self.mesh is not None:
            from ..parallel import mesh as meshlib
            sub = meshlib.replicate(self.mesh, sub)
        self.train_state, metrics = self._update_fn(self.train_state,
                                                    shaped, windows, sub)
        expert_obs = gather_expert_obs(self.expert, batch.expert_ind,
                                       batch.start_ind,
                                       self.p.env_episode_len)
        self.vgail_state, dloss = self._discrim_update_fn(
            self.vgail_state, windows, batch.states, expert_obs, self.zstat)
        out = {k: float(v) for k, v in metrics.items()}
        out["discrim_loss"] = float(dloss)
        return out
