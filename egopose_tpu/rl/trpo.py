"""TRPO policy update (mirrors /root/reference/agents/agent_trpo.py).

Natural-gradient step: conjugate-gradient solve of the Fisher system + line
search on the surrogate under a KL constraint.  The reference's explicit
Fisher-vector products (Fvp_fim / Fvp_direct, agent_trpo.py:89-121) become a
Hessian-vector product of the mean KL via jvp-of-grad -- the JAX-native form
of Fvp_direct.  The L-BFGS critic fit (agent_trpo.py:67-70) is replaced by
jaxopt-free Gauss-Newton-flavored Adam steps (see update_value_lbfgs for the
scipy-backed exact equivalent on host).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .distributions import diag_gaussian_log_prob


class TRPOHyper(NamedTuple):
    max_kl: float = 1e-2
    damping: float = 1e-2
    cg_iters: int = 10
    ls_steps: int = 10
    accept_ratio: float = 0.1
    use_fim: bool = True     # analytic Gaussian FIM product (the reference's
                             # Fvp_fim default, agent_trpo.py:55,89-103);
                             # False = Hessian-of-KL (Fvp_direct)


def _flat(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([l.reshape(-1) for l in leaves])


def _unflat(flat, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    i = 0
    for l in leaves:
        n = l.size
        out.append(flat[i:i + n].reshape(l.shape))
        i += n
    return jax.tree_util.tree_unflatten(treedef, out)


def conjugate_gradient(avp: Callable, b: jax.Array, iters: int,
                       rtol: float = 1e-10):
    """CG solve of A x = b (agent_trpo.py:6-24)."""
    x = jnp.zeros_like(b)
    r = b
    p = b
    rdotr = jnp.dot(r, r)

    def body(carry, _):
        x, r, p, rdotr = carry
        ap = avp(p)
        alpha = rdotr / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        new_rdotr = jnp.dot(r, r)
        p = r + (new_rdotr / rdotr) * p
        return (x, r, p, new_rdotr), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rdotr), None, length=iters)
    return x


def trpo_step(policy_params, policy_in_fn: Callable, states, actions,
              advantages, exps, hyper: TRPOHyper = TRPOHyper()):
    """One TRPO policy update.

    policy_in_fn(params) -> (mean, log_std) over all recorded states.
    Returns (new_params, info dict).  Mirrors agent_trpo.update_policy
    (agent_trpo.py:72-137): surrogate gradient -> CG -> line search.
    """
    w = exps
    n = jnp.maximum(w.sum(), 1.0)

    mean0, log_std0 = policy_in_fn(policy_params)
    logp0 = diag_gaussian_log_prob(actions, mean0, log_std0)
    logp0 = jax.lax.stop_gradient(logp0)

    def surrogate(params):
        mean, log_std = policy_in_fn(params)
        logp = diag_gaussian_log_prob(actions, mean, log_std)
        ratio = jnp.exp(logp - logp0)
        return -jnp.sum(ratio * advantages * w) / n

    def mean_kl(params):
        mean, log_std = policy_in_fn(params)
        m0 = jax.lax.stop_gradient(mean)
        ls0 = jax.lax.stop_gradient(log_std)
        kl = log_std - ls0 + (jnp.exp(2 * ls0) + (m0 - mean) ** 2) \
            / (2 * jnp.exp(2 * log_std)) - 0.5
        return jnp.sum(kl.sum(-1) * w) / n

    loss0, grad = jax.value_and_grad(surrogate)(policy_params)
    g = _flat(grad)

    def fvp_direct(v):
        vec = _unflat(v, policy_params)
        # Fvp_direct (agent_trpo.py:110-121): Hessian-vector product of KL
        _, hvp = jax.jvp(jax.grad(mean_kl), (policy_params,), (vec,))
        return _flat(hvp) + hyper.damping * v

    def fvp_fim(v):
        # Fvp_fim (agent_trpo.py:89-103, the use_fim=True default): the
        # diagonal-Gaussian Fisher applied analytically -- J_mu^T Sigma^-1
        # J_mu v for the mean head plus the exact 2*I block for log-std --
        # as one jvp (tangent through the policy) and one vjp (cotangent
        # back), instead of differentiating the KL twice.  For this policy
        # family the self-KL Hessian IS the FIM, so both products agree to
        # roundoff (locked by tests/test_trpo_vgail.py); the FIM form skips
        # the second-order trace.
        # Normalization deviation vs the reference: agent_trpo.py:102 divides
        # the mean-block product by the FULL batch size M, while its own KL
        # (and Fvp_direct) average over all M rows too -- but its surrogate
        # masks to exploration rows.  Here both the surrogate and the Fisher
        # are exps-weighted (w / sum(w)), keeping the metric consistent with
        # the objective; when exploration steps < batch the natural-step
        # scale differs from the reference's use_fim default by M/sum(w).
        vec = _unflat(v, policy_params)
        (mean, log_std), (dmean, dls) = jax.jvp(
            policy_in_fn, (policy_params,), (vec,))
        inv_var = jnp.exp(-2.0 * jax.lax.stop_gradient(log_std))
        wn = (w / n).astype(mean.dtype)        # batch-shaped (mean sans adim)
        cot_mean = (dmean * inv_var * wn[..., None]).astype(mean.dtype)
        # log_std may be a shared (adim,) parameter or batch-shaped
        cot_ls = (2.0 * dls * (wn[..., None] if dls.ndim == dmean.ndim
                               else jnp.sum(wn))).astype(log_std.dtype)
        _, vjp_fn = jax.vjp(policy_in_fn, policy_params)
        (fv,) = vjp_fn((cot_mean, cot_ls))
        return _flat(fv) + hyper.damping * v

    fvp = fvp_fim if hyper.use_fim else fvp_direct

    stepdir = conjugate_gradient(fvp, -g, hyper.cg_iters)
    shs = 0.5 * jnp.dot(stepdir, fvp(stepdir))
    lm = jnp.sqrt(shs / hyper.max_kl)
    fullstep = stepdir / lm
    expected_improve = -jnp.dot(g, fullstep)

    # backtracking line search (agent_trpo.py:27-40)
    x0 = _flat(policy_params)

    def ls_body(carry, i):
        best_x, done = carry
        stepfrac = 0.5 ** i.astype(x0.dtype)
        xnew = x0 + stepfrac * fullstep
        fnew = surrogate(_unflat(xnew, policy_params))
        actual = loss0 - fnew
        expected = expected_improve * stepfrac
        ok = (actual / jnp.maximum(expected, 1e-12)) > hyper.accept_ratio
        ok = ok & (actual > 0) & ~done
        best_x = jnp.where(ok, xnew, best_x)
        return (best_x, done | ok), ok

    (x_final, success), _ = jax.lax.scan(
        ls_body, (x0, jnp.zeros((), bool)), jnp.arange(hyper.ls_steps))
    new_params = _unflat(x_final, policy_params)

    def kl_vs_old(params):
        """True KL(old || new) over the batch -- the reported metric.
        (mean_kl above is the SELF-KL whose Hessian is the Fisher; its
        value is identically zero and must not be reported.)"""
        mean, log_std = policy_in_fn(params)
        m0 = jax.lax.stop_gradient(mean0)
        ls0 = jax.lax.stop_gradient(log_std0)
        kl = log_std - ls0 + (jnp.exp(2 * ls0) + (m0 - mean) ** 2) \
            / (2 * jnp.exp(2 * log_std)) - 0.5
        return jnp.sum(kl.sum(-1) * w) / n

    return new_params, {"surrogate_loss": loss0, "ls_success": success,
                        "surrogate_after": surrogate(new_params),
                        "kl": kl_vs_old(new_params)}


def trpo_update(ts, opt_v, hyper, t_hyper: TRPOHyper, batch, windows,
                policy_apply: Callable, policy_ctx_apply: Callable,
                value_apply: Callable, value_ctx_apply: Callable):
    """AgentTRPO.update_params on a SegmentBatch (the product-path wiring of
    trpo_step; reference agents/agent_trpo.py:43-137 orchestration on
    agent_ego.py's batch/window layout).

    Same pre-update GAE contract as ppo.ppo_update (values/advantages from
    the pre-update critic, normalized over valid steps), then: critic fit
    via ``hyper.num_epochs`` Adam steps (the jit-compatible stand-in for the
    reference's host L-BFGS fit -- ``update_value_lbfgs`` remains available
    for host-side exact replication), then ONE natural-gradient policy step
    over the full policy (policy net + its video-context net, so the
    Fisher metric covers every parameter the surrogate touches).

    Returns (new TrainState, metrics dict) -- drop-in for ppo_update.
    """
    import optax
    from ..ops.gae import estimate_advantages
    from . import ppo as _ppo

    valid = batch.valids
    n_valid = jnp.maximum(valid.sum(), 1.0)

    def values_of(p_value, p_vs):
        vin = value_ctx_apply(p_vs, windows, batch.states)
        return value_apply(p_value, vin)

    values = jax.lax.stop_gradient(values_of(ts.value, ts.value_vs))
    advantages, returns = estimate_advantages(
        batch.rewards, batch.masks, values, hyper.gamma, hyper.tau,
        valid=valid)
    advantages = jax.lax.stop_gradient(advantages)
    returns = jax.lax.stop_gradient(returns)
    exp_w = batch.exps * valid

    def value_loss_fn(params):
        p_value, p_vs = params
        v = values_of(p_value, p_vs)
        mse = jnp.sum(((v - returns) ** 2) * valid) / n_valid
        # the reference's L-BFGS critic fit adds 1e-3 * sum(p^2) weight decay
        # (agent_trpo.py:63-65); keep it so the Adam stand-in fits the same
        # objective
        l2 = sum(jnp.sum(p ** 2) for p in jax.tree_util.tree_leaves(params))
        return mse + 1e-3 * l2

    vparams = (ts.value, ts.value_vs)
    ovs = ts.opt_value

    def vstep(carry, _):
        vparams, ovs = carry
        vloss, vgrad = jax.value_and_grad(value_loss_fn)(vparams)
        upd, ovs = opt_v.update(vgrad, ovs, vparams)
        return (optax.apply_updates(vparams, upd), ovs), vloss

    (vparams, ovs), vlosses = jax.lax.scan(
        vstep, (vparams, ovs), None, length=hyper.num_epochs)

    def policy_in_fn(prm):
        pin = policy_ctx_apply(prm[1], windows, batch.states)
        return policy_apply(prm[0], pin)

    (new_pol, new_pvs), info = trpo_step(
        (ts.policy, ts.policy_vs), policy_in_fn, batch.states,
        batch.actions, advantages, exp_w, t_hyper)

    ts = _ppo.TrainState(policy=new_pol, policy_vs=new_pvs,
                         value=vparams[0], value_vs=vparams[1],
                         opt_policy=ts.opt_policy, opt_value=ovs)
    metrics = {"policy_loss": info["surrogate_loss"],
               "value_loss": vlosses[-1], "kl": info["kl"],
               "surrogate_after": info["surrogate_after"],
               "ls_success": info["ls_success"].astype(jnp.float32),
               "n_valid": n_valid,
               "n_exp": jnp.maximum(exp_w.sum(), 1.0)}
    return ts, metrics


def update_value_lbfgs(value_loss_fn, params):
    """Critic fit via scipy L-BFGS on host (agent_trpo.py:61-70 equivalent).

    The loss/grad evaluation runs in the params' native dtype (one jitted
    function, one trace); float64 appears only at the scipy boundary, which
    requires it for its internal line search (ADVICE r2: no f64 flat fed
    into f32 params)."""
    from scipy.optimize import fmin_l_bfgs_b
    import numpy as np

    dtype = _flat(params).dtype
    flat0 = np.asarray(_flat(params), dtype=np.float64)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda f: value_loss_fn(_unflat(f, params))))

    def f(flat):
        v, g = grad_fn(jnp.asarray(flat, dtype))
        return float(v), np.asarray(_flat(g), np.float64)

    xf, _, _ = fmin_l_bfgs_b(f, flat0, maxiter=25)
    return _unflat(jnp.asarray(xf, dtype), params)
