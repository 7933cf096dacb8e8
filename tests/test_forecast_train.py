"""Forecast-workload training iteration (make_forecast_agent sample +
update): the regression lock for the path ego_forecast.py drives.  This was
uncovered before: the forecast agent (built via AgentEgo.__new__) missed the
mesh/minibatch/update-key attributes AgentEgo.__init__ grew, so training
crashed while all eval-path tests passed."""
import numpy as np
import jax
import jax.numpy as jnp
import yaml


def test_forecast_training_iteration():
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoForecastConfig, make_env_params
    from egopose_tpu.rl.agent_forecast import make_forecast_agent

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("config/egoforecast/subject_03.yml"))
    cfg_dict.update(dict(env_episode_len=8, num_optim_epoch=2, fr_margin=5))
    cfg_dict.pop("meta_id", None)
    cfg = EgoForecastConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=64, seed=0)
    cnn_feat = jnp.asarray(np.random.RandomState(0).randn(2, 64, 16))

    agent = make_forecast_agent(model, spec, p, tables, expert, cnn_feat,
                                cfg, batch_lanes=4, seed=1,
                                dtype=jnp.float64)
    batch, log = agent.sample(jax.random.PRNGKey(0), min_batch_size=32)
    assert log.num_steps > 0
    assert np.isfinite(log.avg_c_reward)

    before = jax.device_get(agent.train_state.policy)
    m = agent.update_params(batch)
    after = jax.device_get(agent.train_state.policy)
    assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_forecast_agent_honors_kl_target():
    """Regression: make_forecast_agent rebuilds agent.hyper and silently
    dropped policy_kl_target (run-6 collapse receipt in BASELINE.md) --
    both agent constructors must thread the config key into PPOHyper."""
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoForecastConfig, make_env_params
    from egopose_tpu.rl.agent_forecast import make_forecast_agent

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("config/egoforecast/subject_03.yml"))
    cfg_dict.update(dict(env_episode_len=8, num_optim_epoch=2, fr_margin=5,
                         policy_kl_target=0.123))
    cfg_dict.pop("meta_id", None)
    cfg = EgoForecastConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=64, seed=0)
    cnn_feat = jnp.asarray(np.random.RandomState(0).randn(2, 64, 16))
    agent = make_forecast_agent(model, spec, p, tables, expert, cnn_feat,
                                cfg, batch_lanes=4, seed=1,
                                dtype=jnp.float64)
    assert agent.hyper.kl_target == 0.123
