"""End-to-end eval chaining: ego_mimic_eval results initialize
ego_forecast_eval windows (the paper's protocol,
/root/reference/ego_pose/ego_forecast_eval.py:108-135)."""
import os
import pickle

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_tiny_configs(tmp_path, seed=3):
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    ef = yaml.safe_load(open(f"{REPO}/config/egoforecast/subject_03.yml"))
    for cfg in (em, ef):
        cfg.update(dict(fr_margin=5, env_episode_len=10, seed=seed))
        cfg.pop("meta_id", None)
        cfg.pop("state_net_cfg", None)
        cfg.pop("state_net_iter", None)
    ef.update(dict(ego_mimic_cfg="tiny_chain", ego_mimic_iter=0))
    (tmp_path / "config/egomimic").mkdir(parents=True)
    (tmp_path / "config/egoforecast").mkdir(parents=True)
    yaml.dump(em, open(tmp_path / "config/egomimic/tiny_chain.yml", "w"))
    yaml.dump(ef, open(tmp_path / "config/egoforecast/tiny_chain.yml", "w"))


@pytest.mark.slow
def test_mimic_eval_to_forecast_eval_chain(tmp_path, monkeypatch):
    _write_tiny_configs(tmp_path)
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    # shrink the synthetic world so the chain runs fast on the CPU mesh
    import egopose_tpu.cli.ego_mimic as em_mod
    orig_build = em_mod.build_world
    monkeypatch.setattr(
        em_mod, "build_world",
        lambda cfg, dtype, synthetic=False, **kw: orig_build(
            cfg, dtype, synthetic=synthetic, synthetic_takes=2,
            synthetic_len=60))

    from egopose_tpu.cli import ego_forecast_eval, ego_mimic_eval

    em_res, em_meta = ego_mimic_eval.main(
        ["--cfg", "tiny_chain", "--iter", "0", "--synthetic"])
    em_path = "results/egomimic/tiny_chain/results/iter_0000_test.p"
    assert os.path.exists(em_path)
    assert set(em_res) == {"traj_pred", "traj_orig", "vel_pred"}

    # forecast eval initialized from the estimation results (default path)
    f_res, f_meta = ego_forecast_eval.main(
        ["--cfg", "tiny_chain", "--iter", "0", "--synthetic",
         "--em-iter", "0"])
    # and the GT-init fallback
    g_res, _ = ego_forecast_eval.main(
        ["--cfg", "tiny_chain", "--iter", "0", "--synthetic", "--gt-init"])

    m, test_len, em_offset = 5, 10, 5
    for take in f_res["traj_pred"]:
        fp = f_res["traj_pred"][take]
        gp = g_res["traj_pred"][take]
        n_windows = (60 - test_len - m) // m + 1
        assert fp.shape == gp.shape == (n_windows, m + test_len, 59)
        # GT-init margin frames are the expert; em-init margins are the
        # estimation trajectory (an untrained policy's rollout != expert)
        np.testing.assert_array_equal(
            gp[:, :m], g_res["traj_orig"][take][:, :m])
        assert np.abs(fp[1:, :m] - gp[1:, :m]).max() > 1e-4

    # verify one fully-covered window against the reference recipe:
    # slice em traj, sync_traj to the expert at window_start - margin,
    # margin rows + the init state (== first rollout frame) come from it
    from egopose_tpu.utils.tools import sync_traj
    take = sorted(f_res["traj_pred"])[0]
    with open(em_path, "rb") as f:
        (em_saved, _) = pickle.load(f)
    s, w = 2 * m, 1  # second window: start_ind = 10, fully covered by em res
    lo = s - m - em_offset
    sp = em_saved["traj_pred"][take][lo:s + test_len - em_offset]
    vp = em_saved["vel_pred"][take][lo:s + test_len - em_offset]
    orig = g_res["traj_orig"][take][w]  # expert frames [s-m, s+test_len)
    sp, vp = sync_traj(sp, vp, orig[0])
    np.testing.assert_allclose(f_res["traj_pred"][take][w, :m], sp[:m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f_res["traj_pred"][take][w, m], sp[m],
                               rtol=1e-5, atol=1e-6)
