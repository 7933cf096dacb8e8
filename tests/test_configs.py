"""Config system tests: full family loads, adaptive schedules, env params."""
import numpy as np
import pytest
import yaml

from egopose_tpu.utils.config import (EgoMimicConfig, EgoForecastConfig,
                                      StateRegConfig, _interp_schedule,
                                      make_env_params)


@pytest.mark.parametrize("cid", ["subject_01", "subject_02", "subject_03",
                                 "subject_04", "subject_05", "cross_01"])
def test_config_family_loads(cid):
    em = EgoMimicConfig(cid, config_root="config")
    assert em.jkp.shape == (52,)
    assert em.env_episode_len == 200
    ef = EgoForecastConfig(cid, config_root="config")
    assert ef.fr_margin == 30
    assert ef.policy_s_net == "lstm"
    sr = StateRegConfig(cid, config_root="config")
    assert sr.fr_num == 120


def test_adaptive_schedule_matches_reference_interp():
    """Piecewise-linear interpolation (egomimic_config.py:124-131)."""
    cp = [0, 100, 200]
    vals = [1.0, 0.5, 0.1]
    assert _interp_schedule(cp, vals, 0) == 1.0
    assert _interp_schedule(cp, vals, 50) == pytest.approx(0.75)
    assert _interp_schedule(cp, vals, 100) == pytest.approx(0.5)
    assert _interp_schedule(cp, vals, 150) == pytest.approx(0.3)
    assert _interp_schedule(cp, vals, 500) == pytest.approx(0.1)
    # single checkpoint: constant
    assert _interp_schedule([0], [0.7], 123) == pytest.approx(0.7)


def test_env_params_from_config():
    from egopose_tpu.physics import parse_mjcf
    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    cfg = EgoMimicConfig("subject_03", config_root="config")
    p = make_env_params(cfg, spec, obs_dim=115)
    assert p.reward_id == "quat_v3"
    np.testing.assert_allclose(np.asarray(p.jkp[:3]), 500.0)  # 1000 * 0.5
    np.testing.assert_allclose(np.asarray(p.a_ref[24]), np.deg2rad(45.0))
    np.testing.assert_allclose(np.asarray(p.w), [0.5, 0.0, 0.3, 0.1, 0.1])


def test_find_model_xml_cwd_independent(tmp_path, monkeypatch):
    """Model assets resolve from any working directory, never from outside
    the repo, and a missing model is a clear error (not a silent fallback)."""
    import os
    from egopose_tpu.utils.assets import find_model_xml
    here = find_model_xml("humanoid_1205_v1")
    assert here.endswith("humanoid_1205_v1.xml") and os.path.exists(here)
    monkeypatch.chdir(tmp_path)
    away = find_model_xml("humanoid_1205_v1")
    assert os.path.exists(away)
    assert os.path.samefile(here if os.path.isabs(here)
                            else os.path.join("/root/repo", here), away)
    with pytest.raises(FileNotFoundError):
        find_model_xml("no_such_model_xyz")
