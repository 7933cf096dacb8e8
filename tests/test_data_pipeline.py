"""Offline data-processing pipeline end-to-end on generated files (the
reference's fixed artifact contract, docs/train_and_test.md):

traj pickles + meta yaml
  -> gen_expert        (kinematic replay -> expert_<id>.p)
  -> state_reg train   (synthetic, produces the CNN checkpoint)
  -> gen_cnn_feature   (packed optical flow through the CNN -> cnn_feat_<id>.p)
  -> ego_mimic build_world(synthetic=False)  (loads both pickles)
  -> AgentEgo.sample   (one tiny batch on the file-backed world)

This is the only test of the NON-synthetic build_world branch and of
gen_cnn_feature; the flow goes through the packed-.npy path served by the
native threaded loader (data/fastload.c).
"""
import os
import pickle

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T = 80
TAKES = ["pt_a", "pt_b"]


def _make_traj(seed):
    rng = np.random.RandomState(seed)
    qpos = np.zeros((T, 59))
    qpos[:, 2] = 0.91 + 0.02 * np.sin(np.linspace(0, 4, T))
    ang = 0.1 * rng.randn() + 0.02 * np.linspace(0, 1, T)
    qpos[:, 3] = np.cos(ang / 2)
    qpos[:, 6] = np.sin(ang / 2)
    qpos[:, 0] = np.linspace(0, 0.5, T)
    ph = rng.rand(52) * np.pi
    qpos[:, 7:] = 0.2 * np.sin(np.linspace(0, 6, T)[:, None] + ph[None])
    return qpos


@pytest.mark.slow
def test_offline_pipeline_files_to_training(tmp_path, monkeypatch):
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    (tmp_path / "datasets/traj").mkdir(parents=True)
    (tmp_path / "datasets/meta").mkdir(parents=True)
    (tmp_path / "datasets/fpv_of").mkdir(parents=True)
    (tmp_path / "config/statereg").mkdir(parents=True)
    (tmp_path / "config/egomimic").mkdir(parents=True)
    monkeypatch.chdir(tmp_path)

    for i, take in enumerate(TAKES):
        pickle.dump(_make_traj(i),
                    open(f"datasets/traj/{take}_traj.p", "wb"))
        # packed optical flow (32x32x2) served by the native loader
        flow = np.random.RandomState(10 + i).randn(T, 32, 32, 2)
        np.save(f"datasets/fpv_of/{take}.npy", flow.astype(np.float32))
    meta = {"train": TAKES, "test": [TAKES[-1]],
            "capture": {"fps": 30},
            "video_mocap_sync": {t: [0, 2, T - 4] for t in TAKES}}
    yaml.dump(meta, open("datasets/meta/meta_tiny.yml", "w"))

    # --- expert features (kinematic replay) --------------------------------
    from egopose_tpu.cli import gen_expert
    gen_expert.main(["--meta-id", "meta_tiny", "--out-id", "tiny"])
    expert_dict = pickle.load(open("datasets/features/expert_tiny.p", "rb"))
    assert set(expert_dict) == set(TAKES)
    for e in expert_dict.values():
        assert e["len"] == T - 6
        assert e["qpos"].shape == (T - 6, 59)
        assert np.isfinite(e["qvel"]).all()
        assert {"ee_pos", "ee_wpos", "bquat", "bangvel", "com",
                "head_pos", "obs", "head_height_lb"} <= set(e)

    # --- statereg checkpoint (synthetic train; same 32x32 flow shape) ------
    sr = yaml.safe_load(open(f"{REPO}/config/statereg/subject_03.yml"))
    sr.update(dict(meta_id="meta_tiny", fr_num=24, fr_margin=3, v_hdim=16,
                   cnn_fdim=12, mlp_dim=[24], num_epoch=1,
                   save_model_interval=1, seed=3))
    yaml.dump(sr, open("config/statereg/tiny_sr.yml", "w"))
    from egopose_tpu.cli import state_reg
    state_reg.main(["--cfg", "tiny_sr", "--mode", "train", "--synthetic",
                    "--batch-chunks", "2"])

    # --- CNN features over the packed flow files ---------------------------
    from egopose_tpu.cli import gen_cnn_feature
    gen_cnn_feature.main(["--meta-id", "meta_tiny", "--out-id", "tiny",
                          "--statereg-cfg", "tiny_sr",
                          "--statereg-iter", "1", "--batch", "32"])
    cnn_feat, _mean = pickle.load(
        open("datasets/features/cnn_feat_tiny.p", "rb"))
    assert set(cnn_feat) == set(TAKES)
    for f in cnn_feat.values():
        assert f.shape == (T - 6, 12)
        assert np.isfinite(f).all()

    # --- file-backed training world (the non-synthetic branch) -------------
    import jax
    import jax.numpy as jnp
    from egopose_tpu.cli.ego_mimic import build_world
    from egopose_tpu.rl import AgentEgo
    from egopose_tpu.utils.config import EgoMimicConfig
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    em.update(dict(meta_id="meta_tiny", expert_feat="tiny", cnn_feat="tiny",
                   env_episode_len=8, fr_margin=5, num_optim_epoch=1,
                   seed=2))
    em.pop("state_net_cfg", None)
    yaml.dump(em, open("config/egomimic/tiny_pipe.yml", "w"))
    cfg = EgoMimicConfig("tiny_pipe", create_dirs=False)
    spec, model, tables, p, expert, feats = build_world(
        cfg, jnp.float64, synthetic=False)
    assert expert.qpos.shape[0] == len(TAKES)
    assert feats.shape[0] == len(TAKES) and feats.shape[-1] == 12

    agent = AgentEgo(model, spec, p, tables, expert, feats, cfg,
                     batch_lanes=2, seed=0, dtype=jnp.float64)
    batch, log = agent.sample(jax.random.PRNGKey(0), min_batch_size=16)
    assert log.num_steps > 0 and np.isfinite(log.avg_c_reward)

    # --- statereg save_inf + feature-driven test mode ----------------------
    state_reg.main(["--cfg", "tiny_sr", "--mode", "save_inf", "--iter", "1"])
    inf_path = "results/statereg/tiny_sr/models/iter_0001_inf.p"
    assert os.path.exists(inf_path)
    model_cp, sr_meta = pickle.load(open(inf_path, "rb"))
    assert "state_net_dict" in model_cp and "mean" in sr_meta

    res = state_reg.main(["--cfg", "tiny_sr", "--mode", "test",
                          "--iter", "1", "--test-feat", "tiny"])
    assert set(res["traj_pred"]) == set(TAKES)
    for tp in res["traj_pred"].values():
        assert tp.shape[1] == 59 and np.isfinite(tp).all()
