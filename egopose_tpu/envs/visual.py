"""Interactive trajectory viewer (mirrors the reference's HumanoidVisEnv +
eval-script key callbacks, /root/reference/envs/visual/humanoid_vis.py,
envs/common/mjviewer.py:296-364 and ego_pose/eval_pose.py:92-146 /
eval_forecast.py vis mode).

Pure pose puppetry over a visualization model: physics never steps; frames
come from saved qpos trajectories.  The model may hold 1, 2, or N humanoid
copies (assets/mujoco_models/humanoid_1205_vis*.xml, each an nq=59 block):
2 copies puppet prediction + ground truth side by side, N copies puppet
time-staggered frames of one trajectory (the reference's --multi mode).
Uses MuJoCo's native viewer when a display is available; see docs/keymap.md.
"""
from __future__ import annotations

import time

import numpy as np

from ..ops import math_utils as M
from ..ops import quat as Q

NQ = 59  # humanoid qpos block size


def _np_quat_mul(a, b):
    import jax.numpy as jnp
    return np.asarray(Q.quat_mul(jnp.asarray(a), jnp.asarray(b)))


def _np_heading_q(q):
    import jax.numpy as jnp
    return np.asarray(M.get_heading_q(jnp.asarray(q)))


def _np_quat_rot(q, v):
    import jax.numpy as jnp
    return np.asarray(Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))


def _np_quat_inv(q):
    import jax.numpy as jnp
    return np.asarray(Q.quat_inv(jnp.asarray(q)))


class TrajectoryViewer:
    """Replays result trajectories with the reference keymap.

    algos: list of (name, results) where results maps take ->
    {"pred": arr, "orig": arr}; arrays are (T, nq) or, for forecast
    results, (n_windows, T, nq) -- q/e steps the window index.
    """

    def __init__(self, model_xml, algos, fps=30, mfr_int=10):
        import mujoco
        self.model = mujoco.MjModel.from_xml_path(model_xml)
        self.data = mujoco.MjData(self.model)
        self.n_copies = self.model.nq // NQ
        self.algos = [(name, res) for name, res in algos if res is not None]
        assert self.algos, "no result sets to view"
        self.algo_ind = 0
        self.takes = list(self.algos[0][1].keys())
        self.fps = fps
        self.fr = 0
        self.take_ind = 0
        self.traj_ind = 0  # prediction instance (forecast windows)
        self.ss_ind = 0
        self.mfr_int = mfr_int
        self.show_gt = False
        self.paused = False
        self.stop = False
        self.reverse = False
        self.speed = 1.0
        self._mujoco = mujoco

    # -- trajectory access ----------------------------------------------------
    def _cur(self, kind):
        res = self.algos[self.algo_ind][1][self.takes[self.take_ind]]
        arr = res.get(kind)
        if arr is None:
            arr = res["pred"]
        if arr.ndim == 3:  # (n_windows, T, nq): q/e picks the window
            arr = arr[self.traj_ind % arr.shape[0]]
        return arr

    def _len(self):
        return self._cur("pred").shape[0]

    def n_windows(self):
        res = self.algos[self.algo_ind][1][self.takes[self.take_ind]]
        arr = res["pred"]
        return arr.shape[0] if arr.ndim == 3 else 1

    # -- puppeting (eval_pose.py update_pose:149-168) -------------------------
    def update_pose(self):
        pred = self._cur("pred")
        orig = self._cur("orig")
        fr = min(self.fr, pred.shape[0] - 1, orig.shape[0] - 1)
        q = self.data.qpos
        if self.n_copies >= 3:
            # multi mode: copy i shows frame fr + i*mfr_int, heading-aligned
            # to the GT at fr and fanned out sideways
            traj = orig if self.show_gt else pred
            hq = _np_heading_q(orig[fr, 3:7])
            rel_q = _np_quat_mul(hq, _np_quat_inv(_np_heading_q(traj[fr, 3:7])))
            vec = _np_quat_rot(hq, np.array([0.0, -1.0, 0.0]))[:2]
            for i in range(self.n_copies):
                fr_m = min(fr + i * self.mfr_int, traj.shape[0] - 1)
                q[i * NQ:(i + 1) * NQ] = traj[fr_m]
                q[i * NQ + 3:i * NQ + 7] = _np_quat_mul(rel_q, traj[fr_m, 3:7])
                q[i * NQ:i * NQ + 2] = orig[fr, :2] + vec * 0.8 * i
        elif self.n_copies == 2:
            q[:NQ] = pred[fr]
            q[NQ:2 * NQ] = orig[fr]
            q[NQ] += 1.0  # x-offset the reference copy
        else:
            q[:NQ] = (orig if self.show_gt else pred)[fr]
        self._mujoco.mj_forward(self.model, self.data)

    # -- key contract (docs/keymap.md) ----------------------------------------
    def key_callback(self, keycode):
        import glfw  # mujoco viewer passes glfw keycodes
        k = keycode
        if k == glfw.KEY_SPACE:
            self.paused = not self.paused
        elif k == glfw.KEY_LEFT and self.paused:
            self.fr = max(0, self.fr - 1)
        elif k == glfw.KEY_RIGHT and self.paused:
            self.fr = min(self._len() - 1, self.fr + 1)
        elif k == glfw.KEY_W:
            self.fr = 0
        elif k == glfw.KEY_S:
            self.reverse = not self.reverse
        elif k == glfw.KEY_D:
            self.speed = max(self.speed / 1.5, 0.1)
        elif k == glfw.KEY_F:
            self.speed = min(self.speed * 1.5, 8.0)
        elif k == glfw.KEY_R:
            self.stop = True
        elif k == glfw.KEY_Z:
            self.take_ind = (self.take_ind - 1) % len(self.takes)
            self.fr = self.traj_ind = 0
        elif k == glfw.KEY_C:
            self.take_ind = (self.take_ind + 1) % len(self.takes)
            self.fr = self.traj_ind = 0
        elif k == glfw.KEY_Q:
            self.traj_ind = (self.traj_ind - 1) % self.n_windows()
            self.fr = 0
        elif k == glfw.KEY_E:
            self.traj_ind = (self.traj_ind + 1) % self.n_windows()
            self.fr = 0
        elif k == glfw.KEY_X:
            self._screenshot()
        elif k == glfw.KEY_V:
            self._toggle_video()
        elif glfw.KEY_1 <= k < glfw.KEY_1 + len(self.algos):
            self.algo_ind = k - glfw.KEY_1
            self.fr = min(self.fr, self._len() - 1)
        elif k == glfw.KEY_0:
            self.show_gt = not self.show_gt
        elif k == glfw.KEY_MINUS:
            self.mfr_int = max(1, self.mfr_int - 1)
        elif k == glfw.KEY_EQUAL:
            self.mfr_int += 1
        else:
            return
        self.update_pose()

    def _toggle_video(self):
        """'v': start/stop recording the displayed frames to out/video_N.mp4
        (the reference viewer's video-record key, mjviewer.py:296-364 +
        save_video)."""
        if getattr(self, "record", False):
            self.record = False
            self._save_video()
        else:
            try:
                from ..utils.render import make_offscreen_renderer
                self._renderer = getattr(self, "_renderer", None) or \
                    make_offscreen_renderer(self.model)
            except Exception:
                return  # no offscreen GL on this host
            self._vid_frames = []
            self.record = True

    def _save_video(self):
        import os
        frames = getattr(self, "_vid_frames", [])
        self._vid_frames = []
        if not frames:
            return
        os.makedirs("out", exist_ok=True)
        path = "out/video_%04d" % getattr(self, "vid_ind", 0)
        self.vid_ind = getattr(self, "vid_ind", 0) + 1
        try:
            import cv2
            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(path + ".mp4",
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 self.fps, (w, h))
            for f in frames:
                vw.write(f[..., ::-1])
            vw.release()
        except Exception:
            np.save(path + ".npy", np.stack(frames))

    def _screenshot(self):
        import os
        os.makedirs("out", exist_ok=True)
        try:
            from ..utils.render import make_offscreen_renderer
            renderer = getattr(self, "_renderer", None) or \
                make_offscreen_renderer(self.model)
            renderer.update_scene(self.data)
            img = renderer.render()
            try:
                import cv2
                cv2.imwrite("out/%04d.png" % self.ss_ind, img[..., ::-1])
            except Exception:
                np.save("out/%04d.npy" % self.ss_ind, img)
            self.ss_ind += 1
        except Exception:
            pass  # no offscreen GL on this host

    def run(self):
        # ``mujoco.viewer`` is a submodule NOT loaded by ``import mujoco``;
        # without this explicit import the interactive path dies with
        # AttributeError even on hosts that have a display
        import mujoco.viewer

        # pre-flight the display: on a headless host launch_passive EXITS
        # the process ("ERROR: could not initialize GLFW") instead of
        # raising, which would kill the caller's headless video fallback --
        # probe GLFW ourselves, where failure is a catchable return code
        import glfw
        if not glfw.init():
            raise RuntimeError("no display: GLFW init failed")
        glfw.terminate()  # launch_passive re-initializes

        mujoco = self._mujoco
        self.update_pose()
        with mujoco.viewer.launch_passive(
                self.model, self.data,
                key_callback=self.key_callback) as viewer:
            while viewer.is_running() and not self.stop:
                self.update_pose()
                viewer.sync()
                if getattr(self, "record", False):
                    try:
                        self._renderer.update_scene(self.data)
                        self._vid_frames.append(self._renderer.render())
                    except Exception:
                        self.record = False
                if not self.paused:
                    step = -1 if self.reverse else 1
                    self.fr = int(np.clip(self.fr + step, 0, self._len() - 1))
                time.sleep(1.0 / (self.fps * self.speed))
