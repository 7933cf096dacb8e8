"""RL core tests: GAE vs a numpy transcription of the reference loop,
batched ZFilter vs sequential, and an end-to-end tiny PPO iteration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from egopose_tpu.ops.gae import estimate_advantages
from egopose_tpu.ops import running_norm


def ref_gae(rewards, masks, values, gamma, tau):
    """Numpy transcription of core/common.py:5-25 (flat episode-concat)."""
    t = len(rewards)
    deltas = np.zeros(t)
    advantages = np.zeros(t)
    prev_value = prev_adv = 0.0
    for i in reversed(range(t)):
        deltas[i] = rewards[i] + gamma * prev_value * masks[i] - values[i]
        advantages[i] = deltas[i] + gamma * tau * prev_adv * masks[i]
        prev_value = values[i]
        prev_adv = advantages[i]
    returns = values + advantages
    # torch .std() (core/common.py:22) is the SAMPLE std (ddof=1)
    advantages = (advantages - advantages.mean()) / advantages.std(ddof=1)
    return advantages, returns


def test_gae_matches_reference():
    rng = np.random.RandomState(0)
    t = 64
    rewards = rng.rand(t)
    masks = (rng.rand(t) > 0.1).astype(float)
    values = rng.randn(t)
    want_adv, want_ret = ref_gae(rewards, masks, values, 0.95, 0.95)
    adv, ret = estimate_advantages(jnp.array(rewards), jnp.array(masks),
                                   jnp.array(values), 0.95, 0.95)
    np.testing.assert_allclose(np.asarray(ret), want_ret, atol=1e-9)
    np.testing.assert_allclose(np.asarray(adv), want_adv, atol=1e-9)
    # the valid-masked path with all-ones valids is the same contract
    adv_v, ret_v = estimate_advantages(jnp.array(rewards), jnp.array(masks),
                                       jnp.array(values), 0.95, 0.95,
                                       valid=jnp.ones(t))
    np.testing.assert_allclose(np.asarray(adv_v), want_adv, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ret_v), want_ret, atol=1e-9)


def test_zfilter_batched_matches_sequential():
    rng = np.random.RandomState(1)
    xs = rng.randn(100, 7) * 3 + 1
    # sequential welford (zfilter.py semantics)
    n = 0
    m = np.zeros(7)
    s = np.zeros(7)
    for x in xs:
        n += 1
        if n == 1:
            m[:] = x
        else:
            old = m.copy()
            m += (x - old) / n
            s += (x - old) * (x - m)
    stat = running_norm.init_stat(7, jnp.float64)
    for chunk in np.split(xs, 4):
        stat = running_norm.push_batch(stat, jnp.array(chunk))
    np.testing.assert_allclose(np.asarray(stat.mean), m, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stat.s), s, atol=1e-8)
    np.testing.assert_allclose(float(stat.n), n)
    # weighted (masked) rows are excluded
    stat2 = running_norm.push_batch(
        running_norm.init_stat(7, jnp.float64), jnp.array(xs),
        weight=jnp.ones(100).at[50:].set(0.0))
    n2, m2 = 50, xs[:50].mean(0)
    np.testing.assert_allclose(np.asarray(stat2.mean), m2, atol=1e-9)


@pytest.mark.slow
def test_ppo_iteration_end_to_end():
    """Tiny full iteration: sample -> update -> params change, all finite."""
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo

    spec = parse_mjcf("/root/reference/assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("/root/reference/config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = 10
    cfg_dict["num_optim_epoch"] = 2
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=120, seed=0)
    rng = np.random.RandomState(0)
    cnn_feat = jnp.asarray(rng.randn(2, 120, 32))

    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=4, seed=1, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    batch, log = agent.sample(key, min_batch_size=40)
    assert log.num_steps > 0
    assert np.isfinite(log.avg_c_reward)
    assert 0 < log.avg_c_reward <= 1.0

    before = jax.device_get(agent.train_state.policy)
    m = agent.update_params(batch)
    after = jax.device_get(agent.train_state.policy)
    assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # adaptive hooks
    cfg.update_adaptive_params(0)
    agent.set_noise_rate(cfg.adp_noise_rate)
    agent.set_policy_lr(cfg.adp_policy_lr)
    agent.fill_log_std(cfg.adp_log_std)
    ls = jax.device_get(agent.train_state.policy)["params"]["action_log_std"]
    np.testing.assert_allclose(ls, cfg.adp_log_std)


def test_ppo_minibatch_path():
    """cfg.mini_batch_size enables the shuffled lane-minibatch PPO path
    (agent_ppo.py:24-43): more optimizer steps per epoch, finite losses,
    params still move."""
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = 10
    cfg_dict["num_optim_epoch"] = 2
    cfg_dict["mini_batch_size"] = 20  # 2 lanes/minibatch -> 2 slices of 4
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=120, seed=0)
    cnn_feat = jnp.asarray(np.random.RandomState(0).randn(2, 120, 32))

    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=4, seed=1, dtype=jnp.float64)
    assert agent.mini_batch_lanes == 2
    batch, _ = agent.sample(jax.random.PRNGKey(0), min_batch_size=40)
    before = jax.device_get(agent.train_state.policy)
    m1 = agent.update_params(batch)
    after = jax.device_get(agent.train_state.policy)
    assert np.isfinite(m1["policy_loss"]) and np.isfinite(m1["value_loss"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # shuffles differ across calls (fresh key per update)
    m2 = agent.update_params(batch)
    assert np.isfinite(m2["policy_loss"])


def test_a2c_objective_path():
    """cfg.policy_objective='a2c' swaps the clipped surrogate for the
    reference's vanilla policy-gradient loss (agents/agent_pg.py:28-38);
    the first-epoch policy step must differ from PPO's only by loss shape
    (finite, params move, different direction than PPO in general)."""
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = 10
    cfg_dict["num_optim_epoch"] = 2
    cfg_dict["policy_objective"] = "a2c"
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=120, seed=0)
    cnn_feat = jnp.asarray(np.random.RandomState(0).randn(2, 120, 32))

    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=4, seed=1, dtype=jnp.float64)
    assert agent.objective == "a2c"
    batch, _ = agent.sample(jax.random.PRNGKey(0), min_batch_size=40)
    before = jax.device_get(agent.train_state.policy)
    m = agent.update_params(batch)
    after = jax.device_get(agent.train_state.policy)
    assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_nonfinite_gradient_skips_update():
    """make_optimizers wraps both optimizers in optax.apply_if_finite: a
    non-finite gradient (e.g. a BPTT explosion through the context LSTM;
    clip_by_global_norm alone turns an inf norm into NaN params via
    inf * 0) must leave the params untouched, and a following finite
    gradient must apply normally."""
    import optax
    from egopose_tpu.rl.ppo import make_optimizers

    opt_p, _ = make_optimizers(policy_lr=1e-2, value_lr=1e-2)
    params = {"w": jnp.ones(3), "b": jnp.zeros(2)}
    state = opt_p.init(params)

    bad = {"w": jnp.array([jnp.inf, 1.0, 1.0]), "b": jnp.ones(2)}
    upd, state = opt_p.update(bad, state, params)
    p1 = optax.apply_updates(params, upd)
    assert all(np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(p1),
                   jax.tree_util.tree_leaves(params)))
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(p1))

    good = {"w": jnp.ones(3), "b": jnp.ones(2)}
    upd, state = opt_p.update(good, state, p1)
    p2 = optax.apply_updates(p1, upd)
    assert float(np.abs(p2["w"] - p1["w"]).max()) > 0
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(p2))

    nan_grad = {"w": jnp.full(3, jnp.nan), "b": jnp.ones(2)}
    upd, state = opt_p.update(nan_grad, state, p2)
    p3 = optax.apply_updates(p2, upd)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(p3))


def test_kl_target_early_stop():
    """policy_kl_target > 0 halts the policy-epoch loop once the approx KL
    to the sampling policy exceeds the target (PPOHyper.kl_target): a tiny
    target reduces the 10-epoch update to exactly the 1-epoch update's
    policy params (first epoch has KL 0, second stops), and a huge target
    reproduces the unguarded update bit-for-bit."""
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    base = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    base["env_episode_len"] = 20
    base["num_optim_epoch"] = 3

    def run(kl_target, epochs):
        cfg_dict = dict(base)
        cfg_dict["policy_kl_target"] = kl_target
        cfg_dict["num_optim_epoch"] = epochs
        cfg = EgoMimicConfig(cfg_dict=cfg_dict)
        tables = envs.make_body_tables(spec)
        p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
        expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                        t_len=120, seed=0)
        cnn_feat = jnp.asarray(np.random.RandomState(0).randn(2, 120, 32))
        agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                         batch_lanes=4, seed=1, dtype=jnp.float64)
        batch, _ = agent.sample(jax.random.PRNGKey(0), min_batch_size=40)
        agent.update_params(batch)
        return jax.device_get(agent.train_state.policy)

    p_tiny = run(1e-12, 3)
    p_one = run(0.0, 1)
    p_full = run(0.0, 3)
    p_huge = run(1e6, 3)

    flat = lambda t: np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(t)])
    assert np.allclose(flat(p_tiny), flat(p_one), atol=1e-12), \
        "tiny KL target must reduce to the single-epoch update"
    assert np.allclose(flat(p_huge), flat(p_full), atol=1e-12), \
        "huge KL target must not change the unguarded update"
    assert np.abs(flat(p_full) - flat(p_one)).max() > 1e-9, \
        "3-epoch and 1-epoch updates should differ (sanity)"
