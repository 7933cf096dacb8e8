"""Host-side trajectory visualization.

Replaces the reference's interactive GLFW viewer (/root/reference/envs/
common/mjviewer.py) for headless environments: replays saved qpos
trajectories through the MuJoCo renderer (offscreen EGL/OSMesa) and writes a
video.  The physics never runs here -- like the reference's HumanoidVisEnv
(envs/visual/humanoid_vis.py), rendering is pure pose puppetry.
"""
from __future__ import annotations

import os

import numpy as np


_OFFSCREEN_BROKEN = None  # first construction failure, cached per process


def make_offscreen_renderer(model, height=480, width=640):
    """Construct ``mujoco.Renderer`` with the first failure cached for the
    whole process.  On GL-less hosts the FIRST failed construction raises a
    catchable FatalError but leaves the GL loader in a state where a SECOND
    attempt hard-aborts the interpreter (SIGABRT inside Renderer.__init__)
    -- so after one failure, every later caller gets a plain RuntimeError
    and falls back without ever touching the GL stack again."""
    global _OFFSCREEN_BROKEN
    if _OFFSCREEN_BROKEN is not None:
        raise RuntimeError(
            "offscreen renderer unavailable: %s" % _OFFSCREEN_BROKEN)
    import mujoco
    try:
        return mujoco.Renderer(model, height=height, width=width)
    except Exception as e:
        _OFFSCREEN_BROKEN = repr(e)
        raise RuntimeError(
            "offscreen renderer unavailable: %s" % _OFFSCREEN_BROKEN) from e


def render_qpos_video(trajs, out_path, fps=30, res=(640, 480),
                      model_xml=None, spacing=1.0):
    """Render one or more qpos trajectories side by side to a video file.

    trajs: list of (T, nq) arrays (e.g. prediction + ground truth).
    Falls back to writing a .npz of the trajectories when no renderer/encoder
    is available (zero-egress images may lack GL).
    """
    try:
        import mujoco
        from ..physics import parse_mjcf, export_mjcf
        from .assets import find_model_xml
        spec = parse_mjcf(find_model_xml(model_xml or "humanoid_1205_v1"))
        model = mujoco.MjModel.from_xml_string(export_mjcf(spec))
        data = mujoco.MjData(model)
        renderer = make_offscreen_renderer(model, height=res[1],
                                           width=res[0])
        frames = []
        t_len = min(t.shape[0] for t in trajs)
        for t in range(t_len):
            row = []
            for k, traj in enumerate(trajs):
                q = np.array(traj[t])
                q[1] += spacing * k  # offset each trajectory sideways
                data.qpos[:] = q
                mujoco.mj_forward(model, data)
                renderer.update_scene(data)
                row.append(renderer.render())
            frames.append(np.concatenate(row, axis=1))
        _write_video(frames, out_path, fps)
        return out_path
    except Exception as e:  # headless fallback
        alt = os.path.splitext(out_path)[0] + ".npz"
        np.savez_compressed(alt, **{f"traj_{i}": np.asarray(t)
                                    for i, t in enumerate(trajs)})
        return alt


def save_replay(out_path, traj_pred: dict, traj_orig: dict):
    """Persist prediction + reference trajectories per take as one .npz the
    TrajectoryViewer (envs/visual.py) can replay; the headless-safe form of
    the reference's --render path."""
    payload = {}
    for take in traj_pred:
        payload[f"pred__{take}"] = np.asarray(traj_pred[take])
        if take in traj_orig:
            payload[f"orig__{take}"] = np.asarray(traj_orig[take])
    np.savez_compressed(out_path, **payload)
    return out_path


def _write_video(frames, out_path, fps, bgr=False):
    """``frames`` are RGB by default (renderer output); pass ``bgr=True``
    for cv2-native frames (imread/drawing) so channels aren't double-
    swapped on the way into the BGR-expecting VideoWriter."""
    try:
        import cv2
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        for f in frames:
            vw.write(f if bgr else f[..., ::-1])
        vw.release()
    except Exception:
        np.savez_compressed(os.path.splitext(out_path)[0] + ".npz",
                            frames=np.stack(frames))
