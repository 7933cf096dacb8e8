"""End-to-end in-the-wild evaluation chain on synthetic data:

ego_mimic_eval_wild (rollout vs wild CNN features, value fail-safe)
  -> eval_pose_wild --mode stats (2D keypoint distance vs OpenPose GT)
  -> ego_forecast_eval_wild (sliding windows from the wild estimation)
  -> eval_forecast_wild --mode stats (per-horizon keypoint distance)

Mirrors the reference protocol (/root/reference/ego_pose/
ego_mimic_eval_wild.py, eval_pose_wild.py:47-101, ego_forecast_eval_wild.py,
eval_forecast_wild.py:49-117).  OpenPose ground truth is synthesized by
projecting a standing pose through the same camera model (pose2d), so the
metric must come out finite and small for a re-anchored rollout.

Each CLI runs as a subprocess: realistic invocation, and it keeps per-process
XLA CPU compile state small -- one long pytest process accumulating hundreds
of compiled x64 programs segfaults inside a *fresh* backend compile once this
module's CLIs pile on top (XLA:CPU bug; reproduced repeatedly at different
compile sites in this chain, never standalone).
"""
import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MARGIN = 5
EP_LEN = 10
T_FEAT = 40          # frames of wild video features
FEAT_DIM = 16
TAKE = "w01"
TAKE2 = "w02"        # shorter take: exercises the padded-lane batched scan
T_FEAT2 = 32


def _write_tiny_configs(tmp_path):
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    ef = yaml.safe_load(open(f"{REPO}/config/egoforecast/subject_03.yml"))
    for cfg in (em, ef):
        cfg.update(dict(fr_margin=MARGIN, env_episode_len=EP_LEN, seed=1))
        cfg.pop("meta_id", None)
        cfg.pop("state_net_cfg", None)
        cfg.pop("state_net_iter", None)
    ef.update(dict(ego_mimic_cfg="tiny_wild", ego_mimic_iter=0))
    (tmp_path / "config/egomimic").mkdir(parents=True)
    (tmp_path / "config/egoforecast").mkdir(parents=True)
    yaml.dump(em, open(tmp_path / "config/egomimic/tiny_wild.yml", "w"))
    yaml.dump(ef, open(tmp_path / "config/egoforecast/tiny_wild.yml", "w"))


def _write_wild_dataset(tmp_path):
    rng = np.random.RandomState(0)
    feat_dir = tmp_path / "datasets/features"
    feat_dir.mkdir(parents=True)
    cnn_feat = {TAKE: rng.randn(T_FEAT, FEAT_DIM).astype(np.float32),
                TAKE2: rng.randn(T_FEAT2, FEAT_DIM).astype(np.float32)}
    pickle.dump(cnn_feat, open(feat_dir / "cnn_feat_wild_01.p", "wb"))

    # OpenPose ground truth: project a standing humanoid through our camera
    import jax.numpy as jnp
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu.utils.pose2d import JOINTS_MAP, Pose2DContext
    spec = parse_mjcf(f"{REPO}/assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float32)
    ctx = Pose2DContext(model, spec)
    qpos = np.zeros(spec.nq, np.float32)
    qpos[2] = 0.9
    qpos[3] = 1.0
    for take, t_feat in ((TAKE, T_FEAT), (TAKE2, T_FEAT2)):
        pose_dir = tmp_path / f"datasets/tpv/poses/{take}"
        pose_dir.mkdir(parents=True)
        for fr in range(t_feat):
            q = qpos.copy()
            q[7:] += 0.02 * np.sin(0.3 * fr + np.arange(spec.nq - 7))
            p2 = np.asarray(ctx.project_qpos(q)) * 100.0 + 300.0  # pixel-ish
            kp = np.zeros(25 * 3)
            for op_idx, body in JOINTS_MAP:
                row = p2[ctx.body2id[body]]
                kp[3 * op_idx:3 * op_idx + 3] = [row[0], row[1], 1.0]
            with open(pose_dir / ("%05d_keypoints.json" % fr), "w") as f:
                json.dump({"people": [{"pose_keypoints_2d": kp.tolist()}]}, f)


def _run_cli(module, args, cwd):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", EGOPOSE_SYNTHETIC_TAKES="1",
               EGOPOSE_SYNTHETIC_LEN="60")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # jax.config route, not just the env var: with an accelerator plugin
    # installed JAX_PLATFORMS alone does not exclude it (conftest recipe)
    driver = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
              "import sys; from egopose_tpu.cli.%s import main; "
              "main(%r)" % (module, args))
    proc = subprocess.run(
        [sys.executable, "-c", driver],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (module, proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    return proc.stdout + proc.stderr


@pytest.mark.slow
def test_wild_eval_chain(tmp_path, monkeypatch):
    _write_tiny_configs(tmp_path)
    _write_wild_dataset(tmp_path)
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    cwd = str(tmp_path)

    # --- wild estimation rollout ------------------------------------------
    _run_cli("ego_mimic_eval_wild",
             ["--cfg", "tiny_wild", "--iter", "0", "--test-feat", "wild_01"],
             cwd)
    em_path = tmp_path / \
        "results/egomimic/tiny_wild/results/iter_0000_wild_01.p"
    assert em_path.exists()
    res, _meta = pickle.load(open(em_path, "rb"))
    for take, t_feat in ((TAKE, T_FEAT), (TAKE2, T_FEAT2)):
        test_len = t_feat - 2 * MARGIN
        assert res["traj_pred"][take].shape == (test_len, 59)
        assert res["vel_pred"][take].shape == (test_len, 58)
        assert np.isfinite(res["traj_pred"][take]).all()

    # --- wild pose metrics ---------------------------------------------------
    out = _run_cli("eval_pose_wild",
                   ["--egomimic-cfg", "tiny_wild", "--egomimic-iter", "0",
                    "--data", "wild_01"], cwd)
    match = re.search(r"all - pose dist: ([\d.]+), accels: ([\d.]+)", out)
    assert match, out[-1500:]
    pose_dist, smooth = float(match.group(1)), float(match.group(2))
    assert np.isfinite(pose_dist) and pose_dist > 0
    assert np.isfinite(smooth)

    # --- wild FPV/TPV vis mode (headless composited video per take) ---------
    out = _run_cli("eval_pose_wild",
                   ["--egomimic-cfg", "tiny_wild", "--egomimic-iter", "0",
                    "--data", "wild_01", "--mode", "vis"], cwd)
    # two takes: the second take used to SIGABRT on GL-less hosts (second
    # mujoco.Renderer attempt aborts the process; utils/render.py caches the
    # first failure now) -- one output per take, .mp4 or the .npz fallback
    import glob as _glob
    for take in (TAKE, TAKE2):
        vis = _glob.glob(str(tmp_path / ("out/wild_vis_egomimic_%s.*" % take)))
        assert vis, (take, out[-1500:])

    # --- wild forecasting from the estimation results ------------------------
    _run_cli("ego_forecast_eval_wild",
             ["--cfg", "tiny_wild", "--iter", "0", "--test-feat", "wild_01"],
             cwd)
    f_path = tmp_path / \
        "results/egoforecast/tiny_wild/results/iter_0000_wild_01.p"
    assert f_path.exists()
    f_res, _ = pickle.load(open(f_path, "rb"))
    windows = f_res["traj_pred"][TAKE]
    assert windows.ndim == 3 and windows.shape[1] == MARGIN + EP_LEN \
        and windows.shape[2] == 59
    assert np.isfinite(windows).all()

    # --- wild forecast metrics ----------------------------------------------
    out = _run_cli("eval_forecast_wild",
                   ["--egoforecast-cfg", "tiny_wild",
                    "--egoforecast-iter", "0", "--data", "wild_01",
                    "--horizons", "5", str(EP_LEN)], cwd)
    rows = re.findall(r"horizon: (\d+), pose dist: ([\d.]+), "
                      r"accels: ([\d.]+)", out)
    assert len(rows) == 2, out[-1500:]
    for _h, pd, sm in rows:
        assert np.isfinite(float(pd)) and np.isfinite(float(sm))
