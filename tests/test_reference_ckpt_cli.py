"""Reference-format checkpoints drive the product CLIs directly, and eval
loads the requested data split (VERDICT r2 items 1+2).

Writes genuine reference-layout pickles -- torch state_dicts + a pickled
ZFilter whose class lives in a module (`utils.zfilter`) that is *removed*
before eval runs, exactly like a real reference checkpoint whose classes are
not importable here -- into the reference's checkpoint paths, then runs
`ego_mimic_eval` end-to-end on a file-backed world with DISJOINT train/test
takes and asserts the results contain exactly the test takes' ground truth.

Matches /root/reference/ego_pose/ego_mimic_eval.py:55-78 (checkpoint load)
and :56-59 (env.load_experts(takes=cfg.takes[args.data])).
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest
import torch
import yaml

from test_checkpoint_interop import TorchPolicy, TorchValue, TorchVSNet
from test_data_pipeline import _make_traj
from test_torch_import import TorchVideoRegNet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T = 60
TRAIN_TAKES = ["tr_a", "tr_b"]
TEST_TAKES = ["te_c"]
FDIM = 16
STATE_DIM = 115  # (nq-2) + nv for humanoid_1205_v1


def _install_reference_zfilter():
    """Create importable utils.zfilter with the reference's class layout so
    pickle.dump records the reference module path."""
    zf_mod = types.ModuleType("utils.zfilter")

    class RunningStat:
        def __init__(self, n, M, S):
            self._n, self._M, self._S = n, M, S

    class ZFilter:
        def __init__(self, rs):
            self.demean, self.destd, self.clip = True, True, 5.0
            self.rs = rs

    RunningStat.__module__ = ZFilter.__module__ = "utils.zfilter"
    RunningStat.__qualname__, ZFilter.__qualname__ = "RunningStat", "ZFilter"
    zf_mod.RunningStat, zf_mod.ZFilter = RunningStat, ZFilter
    utils_mod = types.ModuleType("utils")
    utils_mod.zfilter = zf_mod
    sys.modules["utils"] = utils_mod
    sys.modules["utils.zfilter"] = zf_mod
    return ZFilter, RunningStat


def _remove_reference_modules():
    sys.modules.pop("utils.zfilter", None)
    sys.modules.pop("utils", None)


@pytest.mark.slow
def test_reference_pickles_drive_eval_cli_on_test_split(tmp_path, monkeypatch):
    torch.set_default_dtype(torch.float64)
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    for d in ("datasets/traj", "datasets/meta", "datasets/features",
              "config/egomimic", "config/statereg"):
        (tmp_path / d).mkdir(parents=True)
    monkeypatch.chdir(tmp_path)

    all_takes = TRAIN_TAKES + TEST_TAKES
    for i, take in enumerate(all_takes):
        pickle.dump(_make_traj(i), open(f"datasets/traj/{take}_traj.p", "wb"))
    meta = {"train": TRAIN_TAKES, "test": TEST_TAKES,
            "capture": {"fps": 30},
            "video_mocap_sync": {t: [0, 2, T - 4] for t in all_takes}}
    yaml.dump(meta, open("datasets/meta/meta_split.yml", "w"))

    from egopose_tpu.cli import gen_expert
    gen_expert.main(["--meta-id", "meta_split", "--out-id", "split"])
    expert_dict = pickle.load(open("datasets/features/expert_split.p", "rb"))
    assert set(expert_dict) == set(all_takes)

    # CNN features straight to file (per-take (T-6, FDIM)); the CNN itself is
    # covered by test_data_pipeline
    rng = np.random.RandomState(0)
    cnn_feat = {t: rng.randn(T - 6, FDIM).astype(np.float32)
                for t in all_takes}
    pickle.dump((cnn_feat, None),
                open("datasets/features/cnn_feat_split.p", "wb"))

    # --- configs ------------------------------------------------------------
    sr = yaml.safe_load(open(f"{REPO}/config/statereg/subject_03.yml"))
    sr.update(dict(meta_id="meta_split", fr_margin=3, v_hdim=12, cnn_fdim=FDIM,
                   mlp_dim=[20]))
    yaml.dump(sr, open("config/statereg/split_sr.yml", "w"))
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    em.update(dict(meta_id="meta_split", expert_feat="split",
                   cnn_feat="split", env_episode_len=10, fr_margin=5,
                   state_net_cfg="split_sr", state_net_iter=10, seed=4,
                   policy_hsize=[32, 16], value_hsize=[32, 16],
                   policy_v_hdim=8, value_v_hdim=8))
    yaml.dump(em, open("config/egomimic/split_em.yml", "w"))

    # --- reference-format checkpoints --------------------------------------
    ZFilter, RunningStat = _install_reference_zfilter()
    torch.manual_seed(0)
    obs_dim = STATE_DIM  # obs layout: de-headed qpos[2:] + full qvel
    tp = TorchPolicy(obs_dim + 8, [32, 16], 52)
    tv = TorchValue(obs_dim + 8, [32, 16])
    pvs, vvs = TorchVSNet(FDIM, 8), TorchVSNet(FDIM, 8)
    zf = ZFilter(RunningStat(77, np.zeros(obs_dim), np.ones(obs_dim)))
    model_cp = {"policy_dict": tp.state_dict(),
                "policy_vs_dict": pvs.state_dict(),
                "value_dict": tv.state_dict(),
                "value_vs_dict": vvs.state_dict(),
                "running_state": zf}
    model_dir = "results/egomimic/split_em/models"
    os.makedirs(model_dir)
    pickle.dump(model_cp, open(f"{model_dir}/iter_0100.p", "wb"))

    snet = TorchVideoRegNet(STATE_DIM, 12, FDIM, (20,), "lstm")
    sr_cp = ({"state_net_dict": snet.state_dict()},
             {"mean": np.zeros(STATE_DIM), "std": np.ones(STATE_DIM)})
    sr_dir = "results/statereg/split_sr/models"
    os.makedirs(sr_dir)
    pickle.dump(sr_cp, open(f"{sr_dir}/iter_0010_inf.p", "wb"))

    # the reference classes are NOT importable when the CLI loads -- the
    # tolerant unpickler must stub them
    _remove_reference_modules()

    # --- run the product CLI: no flags about checkpoint format --------------
    from egopose_tpu.cli import ego_mimic_eval
    results, res_meta = ego_mimic_eval.main(
        ["--cfg", "split_em", "--iter", "100"])

    # split selection: exactly the TEST takes, with their own ground truth
    assert set(results["traj_pred"]) == set(TEST_TAKES)
    m = 5
    for take in TEST_TAKES:
        gt = expert_dict[take]["qpos"]
        tl = results["traj_orig"][take].shape[0]
        np.testing.assert_allclose(results["traj_orig"][take],
                                   gt[m:m + tl], atol=1e-12)
        assert results["traj_pred"][take].shape == (tl, 59)
        assert np.isfinite(results["traj_pred"][take]).all()

    # the tolerant unpickler stubbed the unimportable ZFilter and the stats
    # import still sees its Welford state
    from egopose_tpu.models import torch_import as ti
    cp = ti.tolerant_pickle_load(f"{model_dir}/iter_0100.p")
    assert ti.looks_torch_state_dict(cp["policy_dict"])
    assert type(cp["running_state"]).__module__ == "utils.zfilter"
    rs = ti.import_running_state(cp["running_state"])
    assert float(rs.n) == 77


@pytest.mark.slow
def test_reference_statereg_full_checkpoint_resumes_test_mode(tmp_path,
                                                              monkeypatch):
    """state_reg --mode test --iter N on a reference-format FULL checkpoint
    (torch state_dict with CNN branch): auto-detect + import + no_cnn strip
    are exercised through the test-feat path."""
    torch.set_default_dtype(torch.float64)
    for d in ("datasets/meta", "datasets/features", "config/statereg",
              "results/statereg/split_sr2/models"):
        (tmp_path / d).mkdir(parents=True)
    monkeypatch.chdir(tmp_path)

    takes = ["w_a"]
    meta = {"train": takes, "test": takes, "capture": {"fps": 30},
            "video_mocap_sync": {t: [0, 0, 40] for t in takes}}
    yaml.dump(meta, open("datasets/meta/meta_sr2.yml", "w"))
    sr = yaml.safe_load(open(f"{REPO}/config/statereg/subject_03.yml"))
    sr.update(dict(meta_id="meta_sr2", fr_margin=3, v_hdim=12, cnn_fdim=6,
                   mlp_dim=[20]))
    yaml.dump(sr, open("config/statereg/split_sr2.yml", "w"))

    rng = np.random.RandomState(1)
    feats = {"w_a": rng.randn(40, 6).astype(np.float32)}
    pickle.dump((feats, None), open("datasets/features/cnn_feat_w.p", "wb"))

    torch.manual_seed(2)
    snet = TorchVideoRegNet(115, 12, 6, (20,), "lstm")
    cp = ({"state_net_dict": snet.state_dict()},
          {"mean": np.zeros(115), "std": np.ones(115)})
    pickle.dump(cp, open("results/statereg/split_sr2/models/iter_0010.p",
                         "wb"))

    from egopose_tpu.cli import state_reg
    res = state_reg.main(["--cfg", "split_sr2", "--mode", "test",
                          "--iter", "10", "--test-feat", "w",
                          "--synthetic"])
    assert set(res["traj_pred"]) == {"w_a"}
    tp = res["traj_pred"]["w_a"]
    assert tp.shape[1] == 59 and np.isfinite(tp).all()

    # numeric parity vs the torch net on the same features
    with torch.no_grad():
        want = snet(torch.tensor(np.asarray(feats["w_a"], np.float64))[:, None]
                    ).numpy().reshape(40, 1, 115)[3:-3, 0]
    import jax.numpy as jnp
    from egopose_tpu.models import torch_import as ti
    from egopose_tpu.models.video_reg_net import VideoRegNet
    variables = ti.import_video_reg_net(
        {k: v.numpy() for k, v in snet.state_dict().items()})
    net = VideoRegNet(115, 12, 6, no_cnn=True, mlp_dim=(20,))
    got = np.asarray(net.apply(
        variables, jnp.asarray(feats["w_a"], jnp.float64)[:, None],
        train=False))[3:-3, 0]
    np.testing.assert_allclose(got, want, atol=1e-9)
