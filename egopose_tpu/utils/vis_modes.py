"""Headless-capable vis modes for the eval CLIs.

The reference's vis modes are interactive GLFW/cv2 windows
(/root/reference/ego_pose/eval_pose_wild.py:103-273 FPV/TPV synced viewer,
ego_forecast_eval.py:86-92 live window rendering).  On a display-less TPU
host the same information is produced as composited videos / replay files;
with a display, the TrajectoryViewer provides the interactive path.
"""
from __future__ import annotations

import glob
import os

import numpy as np


def view_or_render_windows(results, res_path, logger, vis_model=None):
    """Forecast-window vis: interactive TrajectoryViewer (q/e steps the
    window, z/c the take) or, headless, a replay npz + first-window video."""
    orig = results.get("traj_orig") or {}
    algos = [("forecast",
              {take: {"pred": results["traj_pred"][take],
                      "orig": orig.get(take, results["traj_pred"][take])}
               for take in results["traj_pred"]
               if results["traj_pred"][take].shape[0] > 0})]
    if not algos[0][1]:
        logger.info("no windows to visualize")
        return None
    from .assets import find_model_xml
    xml = find_model_xml(vis_model or "humanoid_1205_vis_double_v1")
    try:
        from ..envs.visual import TrajectoryViewer
        TrajectoryViewer(xml, algos).run()
        return None
    except Exception as e:
        logger.info("no display (%s) -- writing replay + video" % e)
        from .render import render_qpos_video, save_replay
        base = os.path.splitext(res_path)[0]
        take = sorted(algos[0][1])[0]
        save_replay(base + "_replay.npz",
                    {t: r["pred"] for t, r in algos[0][1].items()},
                    {t: r["orig"] for t, r in algos[0][1].items()})
        first = algos[0][1][take]
        written = render_qpos_video([first["pred"][0], first["orig"][0]],
                                    base + ".mp4")
        logger.info("wrote %s and %s_replay.npz" % (written, base))
        return written


def _load_frames(folder, exts=("png", "jpg")):
    files = []
    for e in exts:
        files += glob.glob(os.path.join(folder, f"*.{e}"))
    files.sort()
    try:
        import cv2
        return [cv2.imread(f) for f in files]
    except Exception:
        return []


def wild_fpv_tpv_video(traj_pred, take, pose_ctx, cfg, wild_meta, out_path,
                       logger, tpv=True, fps=30, vis_model=None):
    """Headless form of the reference's wild FPV/TPV synced viewer
    (eval_pose_wild.py:103-273): per frame, composite

      [3D render of the predicted pose | FPV frame | TPV frame + projected-
      keypoint skeleton overlay]

    Missing image folders degrade gracefully (panel skipped); with no
    renderer at all, the projected keypoints are still drawn on a blank
    canvas so the output always exists.
    """
    import cv2

    traj_ub = wild_meta.get("traj_ub", {}).get(take, traj_pred.shape[0])
    traj_pred = traj_pred[:traj_ub]
    tpv_offset = wild_meta.get("tpv_offset", {}).get(take, cfg.fr_margin)
    flip = wild_meta.get("tpv_flip", {}).get(take, False)

    fpv = _load_frames("datasets/fpv_frames/%s" % take)
    if fpv:
        fpv = fpv[cfg.fr_margin:-cfg.fr_margin] if cfg.fr_margin else fpv
    tpv_frames = _load_frames("datasets/tpv/s_frames/%s" % take) if tpv \
        else []

    # 3D pose panel via the offscreen renderer (optional)
    renderer = model = data = None
    try:
        import mujoco
        from ..physics import export_mjcf, parse_mjcf
        from .assets import find_model_xml
        spec = parse_mjcf(find_model_xml(vis_model or cfg.mujoco_model))
        model = mujoco.MjModel.from_xml_string(export_mjcf(spec))
        data = mujoco.MjData(model)
        from .render import make_offscreen_renderer
        renderer = make_offscreen_renderer(model, height=360, width=360)
    except Exception as e:
        logger.info("no offscreen GL (%s) -- keypoint panels only" % e)

    frames = []
    h = 360
    for fr in range(traj_pred.shape[0]):
        panels = []
        if renderer is not None:
            # multi-humanoid vis models carry N copies; puppet the first
            nq = min(model.nq, traj_pred.shape[1])
            data.qpos[:nq] = traj_pred[fr][:nq]
            import mujoco
            mujoco.mj_forward(model, data)
            renderer.update_scene(data)
            panels.append(renderer.render()[..., ::-1].copy())
        if fpv and fr < len(fpv) and fpv[fr] is not None:
            f = fpv[fr]
            panels.append(cv2.resize(f, (int(f.shape[1] * h / f.shape[0]),
                                         h)))
        tfr = fr + tpv_offset
        if tpv_frames and 0 <= tfr < len(tpv_frames) \
                and tpv_frames[tfr] is not None:
            img = tpv_frames[tfr].copy()
        else:
            img = np.full((h, h, 3), 32, np.uint8)
        # projected keypoint overlay (pose2d.project_qpos + draw_pose)
        p2 = np.asarray(pose_ctx.project_qpos(traj_pred[fr], flip=flip))
        scale = h / max(p2[:, 1].max() - p2[:, 1].min(), 1e-6) * 0.5
        p2 = (p2 - p2.mean(0)) * scale + np.array([img.shape[1] / 2,
                                                   img.shape[0] / 2])
        pose_ctx.draw_pose(img, p2)
        panels.append(cv2.resize(img, (int(img.shape[1] * h / img.shape[0]),
                                       h)))
        frames.append(np.concatenate(panels, axis=1))

    from .render import _write_video
    _write_video(frames, out_path, fps, bgr=True)  # panels are cv2-native
    written = out_path if os.path.exists(out_path) else \
        os.path.splitext(out_path)[0] + ".npz"
    logger.info("wrote wild vis for %s to %s" % (take, written))
    return written
