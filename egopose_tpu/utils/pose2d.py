"""2D keypoint projection / alignment for in-the-wild evaluation
(mirrors /root/reference/ego_pose/utils/pose2d.py).

The 3D body positions come from the JAX engine's forward kinematics instead
of a mujoco_py replay; drawing stays host-side OpenCV.
"""
from __future__ import annotations

import json
import math

import numpy as np

from ..physics import engine
from ..physics.model import PhysicsModel
from ..physics.spec import ModelSpec

BODY_SET = {"LeftForeArm", "RightForeArm", "LeftHand", "RightHand",
            "LeftArm", "RightArm", "LeftUpLeg", "RightUpLeg", "LeftLeg",
            "RightLeg", "LeftFoot", "RightFoot"}

# OpenPose keypoint index -> body name (pose2d.py:35-46)
JOINTS_MAP = [(2, "RightArm"), (3, "RightForeArm"), (4, "RightHand"),
              (5, "LeftArm"), (6, "LeftForeArm"), (7, "LeftHand"),
              (9, "RightUpLeg"), (10, "RightLeg"), (11, "RightFoot"),
              (12, "LeftUpLeg"), (13, "LeftLeg"), (14, "LeftFoot")]

CONN = [("RightUpLeg", "RightArm", (255, 255, 0)),
        ("RightArm", "RightForeArm", (255, 191, 0)),
        ("RightForeArm", "RightHand", (255, 191, 0)),
        ("RightUpLeg", "RightLeg", (255, 64, 0.0)),
        ("RightLeg", "RightFoot", (255, 64, 0.0)),
        ("LeftUpLeg", "LeftArm", (0, 255, 128)),
        ("LeftArm", "LeftForeArm", (0, 255, 255)),
        ("LeftForeArm", "LeftHand", (0, 255, 255)),
        ("LeftUpLeg", "LeftLeg", (0, 64, 255)),
        ("LeftLeg", "LeftFoot", (0, 64, 255))]


class Pose2DContext:
    def __init__(self, model: PhysicsModel, spec: ModelSpec):
        self.model = model
        self.spec = spec
        names = spec.body_names
        self.body_filter = np.array([n in BODY_SET for n in names])
        self.body_names = [n for n in names if n in BODY_SET]
        self.body2id = {n: i for i, n in enumerate(self.body_names)}
        self.nbody = len(self.body_names)
        self.conn = CONN
        self.joints_map = [(i1, self.body2id[n]) for i1, n in JOINTS_MAP]

    # -- ground truth keypoints (pose2d.py:67-76) ----------------------------
    def load_gt_pose(self, filename):
        data = json.load(open(filename))
        keypoints = data["people"][0]["pose_keypoints_2d"]
        p = np.zeros((self.nbody, 3))
        for i1, i2 in self.joints_map:
            p[i2, :] = keypoints[3 * i1:3 * i1 + 3]
        return p

    def check_gt(self, gt_pose):
        return gt_pose[self.body2id["LeftUpLeg"], 2] > 0.1 or \
            gt_pose[self.body2id["RightUpLeg"], 2] > 0.1

    # -- metric (pose2d.py:78-95) --------------------------------------------
    def get_pose_dist(self, p, gt_p):
        b = self.body2id
        if gt_p[b["LeftArm"], 2] > 0.1 and gt_p[b["LeftUpLeg"], 2] > 0.1:
            kp1, kp2 = "LeftArm", "LeftUpLeg"
        else:
            kp1, kp2 = "RightArm", "RightUpLeg"
        scale = 0.5 / abs(gt_p[b[kp1], 1] - gt_p[b[kp2], 1])
        dist, num = 0.0, 0
        for i in range(gt_p.shape[0]):
            if gt_p[i, 2] > 0.1:
                dist += np.linalg.norm(gt_p[i, :2] - p[i, :]) * scale
                num += 1
        return dist / num

    # -- projection (pose2d.py:97-123) ----------------------------------------
    def project_qpos(self, qpos, flip=False):
        import jax.numpy as jnp
        kin = engine.fk(self.model, jnp.asarray(qpos))
        pose_3d = np.asarray(kin.xpos)[self.body_filter]
        b = self.body2id
        vp = (pose_3d[b["LeftUpLeg"]] + pose_3d[b["RightUpLeg"]]) * 0.5
        v = pose_3d[b["RightUpLeg"]] - pose_3d[b["LeftUpLeg"]]
        if flip:
            v = -v
        v[2] = 0
        v = v / np.linalg.norm(v)
        x = v
        z = np.array([0.0, 0.0, 1.0])
        y = np.cross(z, x)
        r = np.hstack((-y[:, None], z[:, None], x[:, None]))
        t = (vp - 10 * x)[:, None]
        e = np.hstack((r.T, -r.T.dot(t)))
        p = np.hstack((pose_3d, np.ones((pose_3d.shape[0], 1)))).dot(e.T)
        p = p[:, :2] / p[:, [2]]
        p[:, 1] *= -1
        return p

    # -- alignment (pose2d.py:125-148) ----------------------------------------
    def align_qpos(self, qpos, gt_p, scale=None, flip=False):
        b = self.body2id
        p = self.project_qpos(qpos, flip)
        base = np.zeros((1, 2))
        n = 0
        if gt_p[b["LeftUpLeg"], 2] > 0.1:
            base += gt_p[[b["LeftUpLeg"]], :2]
            n += 1
        if gt_p[b["RightUpLeg"], 2] > 0.1:
            base += gt_p[[b["RightUpLeg"]], :2]
            n += 1
        base /= n
        if scale is None:
            if gt_p[b["LeftLeg"], 2] > 0.1 and gt_p[b["LeftUpLeg"], 2] > 0.1:
                kp1, kp2 = "LeftLeg", "LeftUpLeg"
            else:
                kp1, kp2 = "RightLeg", "RightUpLeg"
            scale = np.linalg.norm(gt_p[b[kp1]] - gt_p[b[kp2]]) \
                / np.linalg.norm(p[b[kp1]] - p[b[kp2]])
        return p * scale + base

    # -- drawing (pose2d.py:48-65) ---------------------------------------------
    def draw_pose(self, img, pose, flip=False):
        import cv2
        conn = self.conn[5:] + self.conn[:5] if flip else self.conn
        for b1, b2, c in conn:
            p1 = pose[self.body2id[b1], :2]
            p2 = pose[self.body2id[b2], :2]
            center = (int((p1[0] + p2[0]) / 2), int((p1[1] + p2[1]) / 2))
            angle = int(math.atan2(p2[1] - p1[1], p2[0] - p1[0]) / np.pi * 180)
            axes = (int(np.linalg.norm(p2 - p1) / 2), 1)
            cv2.ellipse(img, center, axes, angle, 0, 360, c, -1)
        for x in BODY_SET:
            e = pose[self.body2id[x], :2]
            cv2.circle(img, (int(e[0]), int(e[1])), 1, (0, 0, 255), -1)
