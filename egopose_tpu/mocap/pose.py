"""AMC/BVH frame loading + resampling (mirrors /root/reference/mocap/pose.py)."""
from __future__ import annotations

import math

import numpy as np

from .bvh import Bvh


def load_amc_file(fname, scale):
    """AMC frame loader (pose.py:7-42)."""
    with open(fname) as f:
        content = f.readlines()
    bone_addr = {}
    poses = []
    cur_pos = None
    fr = 1
    for line in content:
        words = line.split()
        if not words:
            continue
        cmd = words[0]
        if cmd == str(fr):
            if cur_pos:
                poses.append(np.array(cur_pos))
            cur_pos = []
            fr += 1
        elif cur_pos is not None:
            start_ind = len(cur_pos)
            if cmd == "root":
                cur_pos += [float(w) * scale for w in words[1:4]]
                cur_pos += [math.radians(float(w)) for w in words[4:]]
            elif cmd in ("lfoot", "rfoot"):
                vals = list(reversed([math.radians(float(w))
                                      for w in words[1:]]))
                cur_pos += vals
                if len(cur_pos) < 3:
                    cur_pos.insert(-1, 0.0)
            else:
                cur_pos += reversed([math.radians(float(w))
                                     for w in words[1:]])
            if fr == 2:
                bone_addr[cmd] = (start_ind, len(cur_pos))
    if cur_pos:
        poses.append(np.array(cur_pos))
    return np.vstack(poses), bone_addr


def load_bvh_file(fname, skeleton):
    """BVH frame loader against a Skeleton's channel layout (pose.py:45-70)."""
    with open(fname) as f:
        mocap = Bvh(f.read())
    bone_addr = {}
    start_ind = 0
    for bone in skeleton.bones:
        end_ind = start_ind + len(bone.channels)
        bone_addr[bone.name] = (start_ind, end_ind)
        start_ind = end_ind
    poses = np.zeros((mocap.nframes, start_ind))
    for i in range(mocap.nframes):
        for bone in skeleton.bones:
            trans = np.array(mocap.frame_joint_channels(i, bone.name,
                                                        bone.channels))
            if bone is skeleton.root:
                trans[:3] *= skeleton.len_scale
                trans[3:6] = np.deg2rad(trans[3:6])
            else:
                trans = np.deg2rad(trans)
            s, e = bone_addr[bone.name]
            poses[i, s:e] = trans
    return poses, bone_addr


def lin_interp(pose1, pose2, t):
    return (1 - t) * pose1 + t * pose2


def interpolated_traj(poses, sample_t=0.030, mocap_fr=120):
    """Linear resampling to dt (pose.py:78-91)."""
    n = poses.shape[0]
    total = float(n - 1) / mocap_fr
    num = int(math.floor(total / sample_t))
    times = np.arange(num + 1) * sample_t * mocap_fr
    out = []
    for t in times:
        start = int(math.floor(t))
        end = min(int(math.ceil(t)), n - 1)
        out.append(lin_interp(poses[start], poses[end], t - math.floor(t)))
    return np.vstack(out)
