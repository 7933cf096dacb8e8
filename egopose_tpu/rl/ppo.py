"""PPO update (mirrors /root/reference/agents/agent_ppo.py + agent_pg.py +
ego_pose/core/agent_ego.py update path) as one jitted multi-epoch step.

Semantics mirrored exactly:
- values/advantages computed once with pre-update parameters (agent_pg.py:48-53)
- GAE with gamma/tau, advantages normalized over real steps (core/common.py)
- per-epoch: critic MSE step, then clipped-surrogate policy step over
  exploration rows only (exps nonzero; agent_ppo.py:37,45)
- fixed log-probs from pre-update policy (agent_ppo.py:18-20)
- policy gradient clipped by global norm 40 (ego_mimic.py:90)
- the video-context nets are re-run inside the loss so their parameters
  receive gradients (agent_ego.py:44-50)
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.gae import estimate_advantages
from .distributions import diag_gaussian_log_prob
from .rollout import SegmentBatch


class PPOHyper(NamedTuple):
    gamma: float = 0.95
    tau: float = 0.95
    clip_epsilon: float = 0.2
    num_epochs: int = 10
    value_opt_niter: int = 1
    grad_clip: float = 40.0
    kl_target: float = 0.0   # > 0: stop the policy-epoch loop once the
                             # approximate KL to the sampling policy exceeds
                             # this (standard PPO trust-region early stop;
                             # config key `policy_kl_target`).  0 disables,
                             # matching the reference's update exactly
                             # (agent_ppo.py:16-51 has no KL guard) -- its
                             # clipped surrogate does not bound movement on
                             # negative-advantage rows (min() picks the
                             # unclipped branch), which can run away over
                             # the 10 full-batch epochs (observed: forecast
                             # protocol run, P_loss 5e3-1e5 ratio-saturation
                             # spikes at iters 593/613 followed by collapse)


class TrainState(NamedTuple):
    policy: Any
    policy_vs: Any
    value: Any
    value_vs: Any
    opt_policy: Any
    opt_value: Any


def make_optimizers(policy_lr, value_lr, grad_clip=40.0,
                    policy_weight_decay=0.0, value_weight_decay=0.0):
    """Both optimizers are wrapped in optax.apply_if_finite: a non-finite
    gradient (BPTT explosion through the context LSTM is the observed
    producer; optax.clip_by_global_norm turns an inf norm into NaN params
    via inf * 0) skips that update instead of corrupting the params --
    the batched analogue of torch users checking clip_grad_norm_'s return.
    100 consecutive non-finite updates propagate the NaN so a genuinely
    broken training setup still surfaces instead of silently stalling."""
    opt_p = optax.inject_hyperparams(
        lambda learning_rate: optax.apply_if_finite(optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(learning_rate, weight_decay=policy_weight_decay)
            if policy_weight_decay else optax.adam(learning_rate),
        ), 100))(learning_rate=policy_lr)
    opt_v = optax.inject_hyperparams(
        lambda learning_rate: optax.apply_if_finite(optax.chain(
            optax.adamw(learning_rate, weight_decay=value_weight_decay)
            if value_weight_decay else optax.adam(learning_rate),
        ), 100))(learning_rate=value_lr)
    return opt_p, opt_v


def ppo_update(ts: TrainState, opt_p, opt_v, hyper: PPOHyper,
               batch: SegmentBatch, windows: jax.Array,
               policy_apply: Callable, policy_ctx_apply: Callable,
               value_apply: Callable, value_ctx_apply: Callable,
               key: jax.Array | None = None, mini_batch_lanes: int = 0,
               objective: str = "ppo"):
    """Run num_epochs PPO epochs on one sampled batch.

    batch arrays are time-major (T, B, ...); windows (B, W, feat).
    ``*_ctx_apply(params_vs, windows, states) -> (T, B, in_dim)`` builds the
    full network input from the video context and the recorded states (the
    trans_policy/trans_value hooks of agent_ego.py:28-32, batched).

    ``mini_batch_lanes > 0`` enables the reference's optional shuffled
    minibatch path (agent_ppo.py:24-43), re-designed lane-grained: each epoch
    permutes the lanes and takes one critic+policy step per ``mini_batch_
    lanes``-lane slice (static shapes, scan over slices).  Pre-update
    advantages/log-probs stay full-batch, exactly like the reference.
    Requires ``key`` for the shuffles.

    ``objective="a2c"`` swaps the clipped surrogate for the vanilla
    policy-gradient loss -(log_prob * advantage) over exploration rows
    (the reference's standalone AgentPG, agents/agent_pg.py:28-38); the
    epoch/value-update orchestration is shared, exactly as AgentPPO
    inherits it from AgentPG.

    Returns (new TrainState, metrics dict).
    """
    assert objective in ("ppo", "a2c"), objective
    t_len, bsz = batch.rewards.shape
    valid = batch.valids
    n_valid = jnp.maximum(valid.sum(), 1.0)

    def policy_logprob(p_policy, p_vs, states, win, actions):
        pin = policy_ctx_apply(p_vs, win, states)
        mean, log_std = policy_apply(p_policy, pin)
        return diag_gaussian_log_prob(actions, mean, log_std)

    def values_of(p_value, p_vs, states, win):
        vin = value_ctx_apply(p_vs, win, states)
        return value_apply(p_value, vin)                 # (T,B)

    # pre-update quantities (full batch, agent_pg.py:48-53)
    fixed_log_probs = jax.lax.stop_gradient(policy_logprob(
        ts.policy, ts.policy_vs, batch.states, windows, batch.actions))
    values = jax.lax.stop_gradient(
        values_of(ts.value, ts.value_vs, batch.states, windows))
    advantages, returns = estimate_advantages(
        batch.rewards, batch.masks, values, hyper.gamma, hyper.tau,
        valid=valid)
    advantages = jax.lax.stop_gradient(advantages)
    returns = jax.lax.stop_gradient(returns)

    exp_w = batch.exps * valid
    n_exp = jnp.maximum(exp_w.sum(), 1.0)

    def opt_step(carry, d):
        """One critic + policy step on a (possibly sliced) data tuple.
        ``stop`` (carried) gates the POLICY step only: once the approximate
        KL to the sampling policy exceeds hyper.kl_target the remaining
        policy epochs are no-ops (critic fitting continues)."""
        ts, stop = carry
        states, actions, win, flp, adv, ret, val, expw = d
        nv = jnp.maximum(val.sum(), 1.0)
        ne = jnp.maximum(expw.sum(), 1.0)

        def value_loss_fn(params):
            p_value, p_vs = params
            v = values_of(p_value, p_vs, states, win)
            return jnp.sum(((v - ret) ** 2) * val) / nv

        def policy_loss_fn(params):
            p_policy, p_vs = params
            log_probs = policy_logprob(p_policy, p_vs, states, win, actions)
            if objective == "a2c":   # vanilla PG (agent_pg.py:31-38)
                return -jnp.sum(log_probs * adv * expw) / ne
            # log-ratio clamp: exp of an unbounded f32 log-ratio can
            # overflow to inf (observed via 90-step s-LSTM BPTT in the
            # forecast run), and inf * adv -> -inf loss -> NaN grads.
            # Beyond e^20 the clipped surrogate's min() is insensitive to
            # the exact ratio, so this changes nothing in the sane regime.
            ratio = jnp.exp(jnp.clip(log_probs - flp, -20.0, 20.0))
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1.0 - hyper.clip_epsilon,
                             1.0 + hyper.clip_epsilon) * adv
            return -jnp.sum(jnp.minimum(surr1, surr2) * expw) / ne

        vparams = (ts.value, ts.value_vs)
        ovs = ts.opt_value
        for _ in range(hyper.value_opt_niter):
            vloss, vgrad = jax.value_and_grad(value_loss_fn)(vparams)
            upd, ovs = opt_v.update(vgrad, ovs, vparams)
            vparams = optax.apply_updates(vparams, upd)
        pparams = (ts.policy, ts.policy_vs)
        if hyper.kl_target > 0:
            lp_cur = policy_logprob(pparams[0], pparams[1],
                                    states, win, actions)
            # Schulman's KL3 estimator E[(r - 1) - log r]: non-negative
            # (unlike E[logp_old - logp_new], which often goes negative
            # right after a step and would never trigger the stop)
            lr = jnp.clip(lp_cur - flp, -20.0, 20.0)
            approx_kl = jnp.sum(((jnp.exp(lr) - 1.0) - lr) * expw) / ne
            stop = stop | (approx_kl > hyper.kl_target)
        ploss, pgrad = jax.value_and_grad(policy_loss_fn)(pparams)
        upd, ops_ = opt_p.update(pgrad, ts.opt_policy, pparams)
        new_pparams = optax.apply_updates(pparams, upd)
        if hyper.kl_target > 0:
            new_pparams, ops_ = jax.tree_util.tree_map(
                lambda new, old: jnp.where(stop, old, new),
                (new_pparams, ops_), (pparams, ts.opt_policy))
        ts = TrainState(policy=new_pparams[0], policy_vs=new_pparams[1],
                        value=vparams[0], value_vs=vparams[1],
                        opt_policy=ops_, opt_value=ovs)
        return (ts, stop), (ploss, vloss)

    full = (batch.states, batch.actions, windows, fixed_log_probs,
            advantages, returns, valid, exp_w)

    if mini_batch_lanes and mini_batch_lanes < bsz:
        assert key is not None, "mini-batch PPO needs an rng key"
        mb = int(mini_batch_lanes)
        n_mb = bsz // mb

        def slice_lanes(idx):
            states, actions, win, flp, adv, ret, val, expw = full
            return (states[:, idx], actions[:, idx], win[idx], flp[:, idx],
                    adv[:, idx], ret[:, idx], val[:, idx], expw[:, idx])

        def epoch(carry, ke):
            perm = jax.random.permutation(ke, bsz)[:n_mb * mb]
            carry, (pl, vl) = jax.lax.scan(
                lambda c, idx: opt_step(c, slice_lanes(idx)),
                carry, perm.reshape(n_mb, mb))
            return carry, (pl[-1], vl[-1])

        (ts, stopped), (plosses, vlosses) = jax.lax.scan(
            epoch, (ts, jnp.zeros((), bool)),
            jax.random.split(key, hyper.num_epochs))
    else:
        (ts, stopped), (plosses, vlosses) = jax.lax.scan(
            lambda c, _: opt_step(c, full), (ts, jnp.zeros((), bool)), None,
            length=hyper.num_epochs)
    metrics = {"policy_loss": plosses[-1], "value_loss": vlosses[-1],
               "n_valid": n_valid, "n_exp": n_exp}
    if hyper.kl_target > 0:
        metrics["kl_stopped"] = stopped
    return ts, metrics
