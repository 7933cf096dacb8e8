"""Interactive trajectory viewer (mirrors the reference's HumanoidVisEnv +
MjViewer keymap, /root/reference/envs/visual/humanoid_vis.py and
envs/common/mjviewer.py:296-364).

Pure pose puppetry over the visualization model: physics never steps; frames
come from saved qpos trajectories.  Uses MuJoCo's native viewer when a
display is available; see docs/keymap.md for the key contract.
"""
from __future__ import annotations

import time

import numpy as np


class TrajectoryViewer:
    """Replays one or more take trajectories with the reference keymap."""

    def __init__(self, model_xml, trajs_by_take, fps=30):
        import mujoco
        from ..physics import parse_mjcf, export_mjcf
        spec = parse_mjcf(model_xml)
        self.model = mujoco.MjModel.from_xml_string(export_mjcf(spec))
        self.data = mujoco.MjData(self.model)
        self.takes = list(trajs_by_take.keys())
        self.trajs = trajs_by_take
        self.fps = fps
        self.fr = 0
        self.take_ind = 0
        self.paused = False
        self.reverse = False
        self.speed = 1.0
        self._mujoco = mujoco

    # -- key contract (docs/keymap.md) ---------------------------------------
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
        elif k == glfw.KEY_Z:
            self.take_ind = (self.take_ind - 1) % len(self.takes)
            self.fr = 0
        elif k == glfw.KEY_C:
            self.take_ind = (self.take_ind + 1) % len(self.takes)
            self.fr = 0

    def _len(self):
        return self.trajs[self.takes[self.take_ind]].shape[0]

    def run(self):
        mujoco = self._mujoco
        with mujoco.viewer.launch_passive(
                self.model, self.data,
                key_callback=self.key_callback) as viewer:
            while viewer.is_running():
                traj = self.trajs[self.takes[self.take_ind]]
                self.data.qpos[:traj.shape[1]] = traj[self.fr]
                mujoco.mj_forward(self.model, self.data)
                viewer.sync()
                if not self.paused:
                    step = -1 if self.reverse else 1
                    self.fr = int(np.clip(self.fr + step, 0, self._len() - 1))
                time.sleep(1.0 / (self.fps * self.speed))
