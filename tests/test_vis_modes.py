"""Headless vis modes of the eval CLIs (VERDICT r2 item 5).

The reference's vis modes are interactive GLFW windows
(/root/reference/ego_pose/eval_pose.py:89-217, eval_forecast.py vis,
ego_forecast_eval.py:86-92); our CLIs open the TrajectoryViewer when a
display exists and otherwise degrade to rendered/replay artifacts
(utils/vis_modes.py, utils/render.py).  These tests force the headless
branch (TrajectoryViewer patched to raise, as on any display-less TPU host)
and assert every --mode vis invocation produces an output file -- an .mp4
when a renderer/encoder exists, else the documented .npz fallback.
"""
import glob
import os
import pickle

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NQ = 59


def _standing_traj(t_len, seed=0):
    rng = np.random.RandomState(seed)
    q = np.zeros((t_len, NQ))
    q[:, 2] = 0.9
    q[:, 3] = 1.0
    q[:, 7:] = 0.05 * np.sin(
        0.2 * np.arange(t_len)[:, None] + np.arange(NQ - 7)) \
        + 0.01 * rng.randn(t_len, NQ - 7)
    return q


def _raise_viewer(monkeypatch):
    import egopose_tpu.envs.visual as vis

    class _NoDisplay:
        def __init__(self, *a, **k):
            raise RuntimeError("forced headless (test)")

    monkeypatch.setattr(vis, "TrajectoryViewer", _NoDisplay)


def _vis_outputs(base_no_ext):
    return [p for ext in (".mp4", ".npz", "_replay.npz")
            for p in glob.glob(base_no_ext + ext)]


def test_eval_pose_vis_headless(tmp_path, monkeypatch):
    """eval_pose --mode vis writes a video (or the .npz fallback) next to
    the results pickle when no display is available."""
    _raise_viewer(monkeypatch)
    res_dir = tmp_path / "results/egomimic/tiny_vis/results"
    res_dir.mkdir(parents=True)
    results = {"traj_pred": {"t1": _standing_traj(6, 0)},
               "traj_orig": {"t1": _standing_traj(6, 1)}}
    pickle.dump((results, {"algo": "ego_mimic"}),
                open(res_dir / "iter_0000_test.p", "wb"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    from egopose_tpu.cli import eval_pose
    eval_pose.main(["--egomimic-cfg", "tiny_vis", "--mode", "vis"])
    outs = _vis_outputs(str(res_dir / "iter_0000_test"))
    assert outs, list(map(str, res_dir.iterdir()))


def test_eval_forecast_vis_headless(tmp_path, monkeypatch):
    """eval_forecast --mode vis on sliding-window results (headless)."""
    _raise_viewer(monkeypatch)
    cfg = yaml.safe_load(open(f"{REPO}/config/egoforecast/subject_03.yml"))
    cfg.update(dict(fr_margin=3, env_episode_len=5))
    cfg.pop("meta_id", None)
    (tmp_path / "config/egoforecast").mkdir(parents=True)
    yaml.dump(cfg, open(tmp_path / "config/egoforecast/tiny_vis.yml", "w"))
    res_dir = tmp_path / "results/egoforecast/tiny_vis/results"
    res_dir.mkdir(parents=True)
    win = np.stack([_standing_traj(8, 0), _standing_traj(8, 1)])  # (2,8,59)
    results = {"traj_pred": {"t1": win}, "traj_orig": {"t1": win.copy()}}
    pickle.dump((results, {"algo": "ego_forecast"}),
                open(res_dir / "iter_0000_test.p", "wb"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    from egopose_tpu.cli import eval_forecast
    written = eval_forecast.main(
        ["--egoforecast-cfg", "tiny_vis", "--mode", "vis"])
    assert written is not None and os.path.exists(written), written


def test_view_or_render_windows_headless(tmp_path, monkeypatch):
    """view_or_render_windows (the ego_forecast_eval[_wild] --mode vis
    target) writes the replay .npz plus a first-window video headlessly."""
    _raise_viewer(monkeypatch)
    monkeypatch.chdir(REPO)  # asset resolution for the vis model XML
    win = np.stack([_standing_traj(7, 0), _standing_traj(7, 1)])
    results = {"traj_pred": {"t1": win, "t2": win.copy()},
               "traj_orig": {"t1": win.copy()}}
    res_path = str(tmp_path / "iter_0000_test.p")

    class _Log:
        msgs = []

        def info(self, m):
            self.msgs.append(m)

    from egopose_tpu.utils.vis_modes import view_or_render_windows
    written = view_or_render_windows(results, res_path, _Log())
    base = os.path.splitext(res_path)[0]
    assert os.path.exists(base + "_replay.npz")
    replay = np.load(base + "_replay.npz")
    assert set(replay.files) == {"pred__t1", "pred__t2", "orig__t1",
                                 "orig__t2"}
    np.testing.assert_array_equal(replay["pred__t1"], win)
    assert written is not None and os.path.exists(written), written


def test_view_or_render_windows_empty(tmp_path, monkeypatch):
    """Zero-window results (every take failed) degrade to a log line, not a
    crash (matches the reference's behavior of simply having nothing to
    show)."""
    _raise_viewer(monkeypatch)

    class _Log:
        def info(self, m):
            pass

    from egopose_tpu.utils.vis_modes import view_or_render_windows
    out = view_or_render_windows(
        {"traj_pred": {"t1": np.zeros((0, 5, NQ))}, "traj_orig": {}},
        str(tmp_path / "r.p"), _Log())
    assert out is None
