"""Flag contracts for the forecast eval CLIs added for reference parity
(/root/reference/ego_pose/ego_forecast_eval.py:23-32): --expert-ind /
--start-ind restrict the window set, --show-noise samples instead of taking
mean actions.  Locks the round-3 rule: every parsed flag changes behavior."""
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def tiny_world(tmp_path, monkeypatch):
    ef = yaml.safe_load(open(f"{REPO}/config/egoforecast/subject_03.yml"))
    ef.update(dict(fr_margin=5, env_episode_len=10, seed=3))
    for k in ("meta_id", "state_net_cfg", "state_net_iter"):
        ef.pop(k, None)
    (tmp_path / "config/egoforecast").mkdir(parents=True)
    yaml.dump(ef, open(tmp_path / "config/egoforecast/tiny_ff.yml", "w"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    import egopose_tpu.cli.ego_mimic as em_mod
    orig_build = em_mod.build_world
    monkeypatch.setattr(
        em_mod, "build_world",
        lambda cfg, dtype, synthetic=False, **kw: orig_build(
            cfg, dtype, synthetic=synthetic, synthetic_takes=2,
            synthetic_len=60))


@pytest.mark.slow
def test_window_restriction_and_noise(tiny_world):
    from egopose_tpu.cli import ego_forecast_eval

    base = ["--cfg", "tiny_ff", "--iter", "0", "--synthetic", "--gt-init"]
    res_all, _ = ego_forecast_eval.main(base)
    assert len(res_all["traj_pred"]) == 2          # both synthetic takes

    # --expert-ind: only that take's windows in the results
    res_one, _ = ego_forecast_eval.main(base + ["--expert-ind", "1"])
    assert list(res_one["traj_pred"]) == ["take_1"]
    np.testing.assert_allclose(res_one["traj_pred"]["take_1"],
                               res_all["traj_pred"]["take_1"], atol=1e-5)

    # --start-ind: a single window per take
    res_win, _ = ego_forecast_eval.main(base + ["--start-ind", "5"])
    for take in res_win["traj_pred"]:
        assert res_win["traj_pred"][take].shape[0] == 1

    # --show-noise: sampled actions diverge from the mean-action rollout
    # (untrained policy log_std is nonzero); margins (GT) stay identical
    res_noise, _ = ego_forecast_eval.main(base + ["--show-noise"])
    a = res_noise["traj_pred"]["take_0"]
    b = res_all["traj_pred"]["take_0"]
    np.testing.assert_array_equal(a[:, :5], b[:, :5])
    assert np.abs(a[:, 5:] - b[:, 5:]).max() > 1e-6

    # unknown --mode still rejected
    with pytest.raises(SystemExit):
        ego_forecast_eval.main(base + ["--mode", "nope"])
