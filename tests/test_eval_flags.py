"""ego_mimic_eval flag contracts: --causal (streaming context, _causal
results tag), --sync (sync_expert-transformed traj_orig_synced), --fail-safe
naivefs tag.  These flags were reference-parity items
(/root/reference/ego_pose/ego_mimic_eval.py:29,136-145) -- this locks that
they change behavior, not just filenames."""
import os
import pickle

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_eval_flags_causal_sync_naivefs(tmp_path, monkeypatch):
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    em.update(dict(fr_margin=4, env_episode_len=8, seed=7,
                   sync_exp_interval=5))
    em.pop("meta_id", None)
    em.pop("state_net_cfg", None)
    em.pop("state_net_iter", None)
    (tmp_path / "config/egomimic").mkdir(parents=True)
    yaml.dump(em, open(tmp_path / "config/egomimic/tiny_flags.yml", "w"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    import egopose_tpu.cli.ego_mimic as em_mod
    orig_build = em_mod.build_world
    monkeypatch.setattr(
        em_mod, "build_world",
        lambda cfg, dtype, synthetic=False, **kw: orig_build(
            cfg, dtype, synthetic=synthetic, synthetic_takes=2,
            synthetic_len=40))

    from egopose_tpu.cli import ego_mimic_eval

    base = ["--cfg", "tiny_flags", "--iter", "0", "--synthetic"]
    res_plain, meta_plain = ego_mimic_eval.main(base)
    assert "traj_orig_synced" not in res_plain

    # --sync: emits the expert re-anchored to the sim frame; same shape as
    # traj_orig but (in general) different world-frame xy/heading
    res_sync, _ = ego_mimic_eval.main(base + ["--sync"])
    for take in res_sync["traj_pred"]:
        synced = res_sync["traj_orig_synced"][take]
        orig = res_sync["traj_orig"][take]
        assert synced.shape == orig.shape
        assert np.isfinite(synced).all()
        # joint angles are frame-invariant under the sync transform
        np.testing.assert_allclose(synced[:, 7:], orig[:, 7:], atol=1e-5)

    # --causal: streaming context changes the rollout; results tagged
    res_causal, _ = ego_mimic_eval.main(base + ["--causal"])
    assert os.path.exists(
        "results/egomimic/tiny_flags/results/iter_0000_test_causal.p")
    take = sorted(res_plain["traj_pred"])[0]
    assert np.abs(res_causal["traj_pred"][take]
                  - res_plain["traj_pred"][take]).max() > 1e-6

    # --fail-safe naivefs: separate artifact, num_reset recorded
    _, meta_n = ego_mimic_eval.main(base + ["--fail-safe", "naivefs"])
    assert os.path.exists(
        "results/egomimic/tiny_flags/results/iter_0000_test_naivefs.p")
    assert meta_n["num_reset"] >= 0

    # --expert-ind: single-take evaluation slices the lane set
    # (reference ego_mimic_eval.py:181-186)
    res_one, _ = ego_mimic_eval.main(base + ["--expert-ind", "1"])
    assert len(res_one["traj_pred"]) == 1
    only = list(res_one["traj_pred"])[0]
    take1 = sorted(res_plain["traj_pred"])[1]
    assert only == take1
    np.testing.assert_allclose(res_one["traj_orig"][only],
                               res_plain["traj_orig"][take1], atol=1e-12)

    # --show-noise: sampled instead of mean actions changes the rollout
    res_noise, _ = ego_mimic_eval.main(base + ["--show-noise"])
    assert np.abs(res_noise["traj_pred"][take]
                  - res_plain["traj_pred"][take]).max() > 1e-6

    # --f64 validation run (SURVEY 7.4.4)
    res64, _ = ego_mimic_eval.main(base + ["--f64"])
    assert res64["traj_pred"][take].dtype == np.float64
    assert np.isfinite(res64["traj_pred"][take]).all()


@pytest.mark.slow
def test_eval_sp_devices_matches_single_device(tmp_path, monkeypatch):
    """--sp-devices: the time-sharded TCN context encode must leave the eval
    rollout numerically unchanged (parallel/seqpar.py), and reject LSTM
    context nets with a clear error."""
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    em.update(dict(fr_margin=4, env_episode_len=8, seed=7,
                   policy_v_net="tcn",
                   policy_v_net_param={"size": [32, 128], "dropout": 0.0},
                   value_v_net="tcn",
                   value_v_net_param={"size": [32, 128], "dropout": 0.0}))
    em.pop("meta_id", None)
    em.pop("state_net_cfg", None)
    em.pop("state_net_iter", None)
    (tmp_path / "config/egomimic").mkdir(parents=True)
    yaml.dump(em, open(tmp_path / "config/egomimic/tiny_sp.yml", "w"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    import egopose_tpu.cli.ego_mimic as em_mod
    orig_build = em_mod.build_world
    monkeypatch.setattr(
        em_mod, "build_world",
        lambda cfg, dtype, synthetic=False, **kw: orig_build(
            cfg, dtype, synthetic=synthetic, synthetic_takes=2,
            synthetic_len=40))

    from egopose_tpu.cli import ego_mimic_eval

    # f64 so the sharded-vs-unsharded encode identity is exact and the
    # chaotic PD rollout cannot amplify representation noise
    base = ["--cfg", "tiny_sp", "--iter", "0", "--synthetic", "--f64"]
    res_ref, _ = ego_mimic_eval.main(base)
    res_sp, _ = ego_mimic_eval.main(base + ["--sp-devices", "4"])
    for take in res_ref["traj_pred"]:
        np.testing.assert_allclose(res_sp["traj_pred"][take],
                                   res_ref["traj_pred"][take], atol=1e-9)

    # LSTM context nets are sequential in time: clear rejection
    em_lstm = dict(em, policy_v_net="lstm", value_v_net="lstm")
    em_lstm.pop("policy_v_net_param"), em_lstm.pop("value_v_net_param")
    yaml.dump(em_lstm, open(tmp_path / "config/egomimic/tiny_splstm.yml", "w"))
    with pytest.raises(ValueError, match="TCN"):
        ego_mimic_eval.main(["--cfg", "tiny_splstm", "--iter", "0",
                             "--synthetic", "--sp-devices", "2"])
