"""Native orbax checkpoint format (the TPU-native training format alongside
the reference-compatible pickle, SURVEY 5.4) + ScalarWriter image/histogram
summaries (reference utils/tb_logger.py:44-96)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import yaml


def _tiny_agent():
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo

    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = 8
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=1,
                                    t_len=64, seed=0)
    cnn_feat = jnp.asarray(np.random.RandomState(0).randn(1, 64, 16))
    return AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                    batch_lanes=2, seed=1, dtype=jnp.float64)


def test_orbax_checkpoint_roundtrip(tmp_path):
    agent = _tiny_agent()
    # make the state non-trivial
    batch, _ = agent.sample(jax.random.PRNGKey(0), min_batch_size=16)
    agent.update_params(batch)
    want = agent.checkpoint()

    path = tmp_path / "iter_0001.orbax"
    agent.save_orbax(str(path))
    assert path.is_dir()

    agent2 = _tiny_agent()
    before = agent2.checkpoint()
    diff0 = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before["policy_dict"], want["policy_dict"])
    assert max(jax.tree_util.tree_leaves(diff0)) > 0  # fresh agent differs

    agent2.load_orbax(str(path))
    got = agent2.checkpoint()
    for k in ("policy_dict", "policy_vs_dict", "value_dict", "value_vs_dict"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            got[k], want[k])
    np.testing.assert_allclose(np.asarray(got["running_state"].mean),
                               np.asarray(want["running_state"].mean))
    np.testing.assert_allclose(np.asarray(got["running_state"].n),
                               np.asarray(want["running_state"].n))
    # optimizer state (Adam moments) must continue the original trajectory
    # -- the pickle format deliberately omits it (reference parity), the
    # native format must not
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        jax.device_get(agent2.train_state.opt_policy),
        jax.device_get(agent.train_state.opt_policy))


def test_scalar_writer_image_and_histogram(tmp_path):
    from egopose_tpu.utils.log import ScalarWriter
    w = ScalarWriter(str(tmp_path))
    rng = np.random.RandomState(0)
    w.scalar("loss", 1.5, 0)
    w.image("frame", (rng.rand(32, 48, 3) * 255).astype(np.uint8), 0)
    w.image("flow", rng.randn(16, 16, 3), 0)       # zero-centered float
    w.histogram("weights", rng.randn(1000), 0)
    w.histogram("empty", np.array([]), 0)          # no-op, must not raise
    w.histogram("nans", np.full(5, np.nan), 0)     # no-op, must not raise
    w.flush()
    files = os.listdir(tmp_path)
    assert any("tfevents" in f or f == "scalars.jsonl" for f in files)
    # event file must be non-empty after three summaries
    sizes = [os.path.getsize(os.path.join(tmp_path, f)) for f in files]
    assert max(sizes) > 100


def test_image_scale_is_a_fixed_convention():
    """ADVICE r2: float image range must come from the caller, never from
    the data max -- a near-black [0,255]-scale frame must stay dark."""
    from egopose_tpu.utils.log import to_uint8_image
    dark_byte = np.full((4, 4, 3), 0.8)            # near-black, byte scale
    out = to_uint8_image(dark_byte, scale="byte")
    assert out.max() <= 1                          # NOT brightened 255x
    # default (None) is unit scale by convention
    unit = np.full((4, 4, 3), 0.5)
    assert to_uint8_image(unit).max() == 127
    assert to_uint8_image(unit, scale=None).max() == 127
    # uint8 passes through untouched; unknown scale rejected
    b = (np.ones((2, 2, 3)) * 7).astype(np.uint8)
    assert to_uint8_image(b, scale="byte") is b
    import pytest
    with pytest.raises(ValueError):
        to_uint8_image(unit, scale="bogus")
