"""TRPO and VGAIL unit tests."""
import numpy as np
import jax
import jax.numpy as jnp

from egopose_tpu.rl import nets
from egopose_tpu.rl.trpo import TRPOHyper, conjugate_gradient, trpo_step
from egopose_tpu.rl import vgail
from egopose_tpu.models.video_state_net import VideoStateNet


def test_conjugate_gradient_solves_spd():
    rng = np.random.RandomState(0)
    x = rng.randn(12, 12)
    a = jnp.asarray(x @ x.T + 5 * np.eye(12))
    b = jnp.asarray(rng.randn(12))
    sol = conjugate_gradient(lambda v: a @ v, b, iters=25)
    np.testing.assert_allclose(np.asarray(a @ sol), np.asarray(b), atol=1e-6)


def test_trpo_step_improves_surrogate_within_kl():
    rng = np.random.RandomState(1)
    obs_dim, act_dim, n = 10, 4, 256
    policy = nets.PolicyGaussian(action_dim=act_dim, hidden_dims=(16,),
                                 activation="tanh", log_std_init=-0.5)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    states = jnp.asarray(rng.randn(n, obs_dim))
    actions = jnp.asarray(rng.randn(n, act_dim) * 0.3)
    advantages = jnp.asarray(rng.randn(n))
    exps = jnp.ones(n)

    def policy_in_fn(p):
        return policy.apply(p, states)

    hyper = TRPOHyper(max_kl=1e-2)
    new_params, info = trpo_step(params, policy_in_fn, states, actions,
                                 advantages, exps, hyper)
    assert bool(info["ls_success"])
    assert float(info["kl"]) <= 1.5 * hyper.max_kl
    # surrogate improved (lower is better in our sign convention)
    def surrogate(p):
        from egopose_tpu.rl.distributions import diag_gaussian_log_prob
        mean, log_std = policy.apply(p, states)
        lp = diag_gaussian_log_prob(actions, mean, log_std)
        mean0, ls0 = policy.apply(params, states)
        lp0 = diag_gaussian_log_prob(actions, mean0, ls0)
        return -float(jnp.mean(jnp.exp(lp - lp0) * advantages))
    assert surrogate(new_params) < surrogate(params)


def test_vgail_discriminator_learns_separation():
    rng = np.random.RandomState(2)
    obs_dim, vh, t, b, fdim, w = 6, 8, 10, 4, 5, 12
    vs = VideoStateNet(fdim, vh, v_margin=1, v_net_type="lstm")
    disc, tx, state = vgail.make_discriminator(
        jax.random.PRNGKey(0), obs_dim + vh, vs, fdim, w, hidden_dims=(32,),
        lr=1e-2)
    windows = jnp.asarray(rng.randn(b, w, fdim), jnp.float32)
    gen_states = jnp.asarray(rng.randn(t, b, obs_dim) + 2.0, jnp.float32)
    expert_obs = jnp.asarray(rng.randn(t, b, obs_dim) - 2.0, jnp.float32)
    from egopose_tpu.ops import running_norm
    zstat = running_norm.init_stat(obs_dim, jnp.float32)
    vs_apply = lambda p, win: vs.apply(p, win)

    state, loss0 = vgail.update_discriminator(
        disc, tx, state, vs_apply, windows, gen_states, expert_obs, zstat,
        num_update=1)
    state, loss1 = vgail.update_discriminator(
        disc, tx, state, vs_apply, windows, gen_states, expert_obs, zstat,
        num_update=30)
    assert float(loss1) < float(loss0)
    # adversarial reward is higher for expert-like states than generator ones
    r_gen = vgail.gail_reward(disc, state, vs_apply, windows, gen_states)
    r_exp = vgail.gail_reward(disc, state, vs_apply, windows, expert_obs)
    assert float(r_exp.mean()) > float(r_gen.mean())


def test_update_value_lbfgs_converges_and_keeps_dtype():
    """ADVICE r2: the host L-BFGS critic fit must evaluate loss/grad in the
    params' native dtype (f64 only at the scipy boundary) and still
    converge on a smooth problem."""
    from egopose_tpu.rl.trpo import update_value_lbfgs
    rng = np.random.RandomState(3)
    target = {"w": jnp.asarray(rng.randn(6, 4), jnp.float32),
              "b": jnp.asarray(rng.randn(4), jnp.float32)}
    params = {"w": jnp.zeros((6, 4), jnp.float32),
              "b": jnp.zeros(4, jnp.float32)}

    def loss(p):
        return sum(jnp.sum((p[k] - target[k]) ** 2) for k in p)

    fitted = update_value_lbfgs(loss, params)
    assert fitted["w"].dtype == jnp.float32
    assert fitted["b"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fitted["w"]),
                               np.asarray(target["w"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fitted["b"]),
                               np.asarray(target["b"]), atol=1e-4)
