"""BVH -> 30 Hz qpos trajectory conversion (mirrors /root/reference/ego_pose/
data_process/convert_clip.py)."""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np


EXCLUDE_BONES = {"Thumb", "Index", "Middle", "Ring", "Pinky", "End", "Toe"}
SPEC_CHANNELS = {"LeftForeArm": ["Zrotation"], "RightForeArm": ["Zrotation"],
                 "LeftLeg": ["Xrotation"], "RightLeg": ["Xrotation"]}


def get_qpos(pose, bone_addr, body_qposaddr, nq):
    """BVH channel row -> model qpos (convert_clip.py:38-50).
    Root euler uses the intrinsic-xyz ('rxyz') convention like the
    reference's quaternion_from_euler(..., 'rxyz')."""
    import jax.numpy as jnp
    from ..ops import quat as Q
    qpos = np.zeros(nq)
    for bone_name, ind2 in body_qposaddr.items():
        if bone_name not in bone_addr:
            continue
        ind1 = bone_addr[bone_name]
        if ind1[0] == 0:
            trans = pose[ind1[0]:ind1[0] + 3].copy()
            angles = pose[ind1[0] + 3:ind1[1]].copy()
            # intrinsic xyz == extrinsic zyx: q = qx * qy * qz
            zeros = np.zeros(3)
            qx = np.asarray(Q.axis_angle_to_quat(jnp.array([1.0, 0, 0]),
                                                 jnp.array(angles[0])))
            qy = np.asarray(Q.axis_angle_to_quat(jnp.array([0, 1.0, 0]),
                                                 jnp.array(angles[1])))
            qz = np.asarray(Q.axis_angle_to_quat(jnp.array([0, 0, 1.0]),
                                                 jnp.array(angles[2])))
            quat = np.asarray(Q.quat_mul(jnp.asarray(qx),
                                         Q.quat_mul(jnp.asarray(qy),
                                                    jnp.asarray(qz))))
            qpos[ind2[0]:ind2[0] + 3] = trans
            qpos[ind2[0] + 3:ind2[1]] = quat
        else:
            qpos[ind2[0]:ind2[1]] = pose[ind1[0]:ind1[1]]
    return qpos


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-id", type=str, default="humanoid_1205_v1")
    parser.add_argument("--mocap-id", type=str, default="0213")
    parser.add_argument("--range", type=int, nargs=2, default=None)
    parser.add_argument("--skt-id", type=str, default="take_01")
    parser.add_argument("--mocap-fr", type=int, default=120)
    parser.add_argument("--dt", type=float, default=1 / 30)
    parser.add_argument("--offset-z", type=float, default=0.0)
    args = parser.parse_args(argv)

    from ..mocap import Skeleton, load_bvh_file, interpolated_traj
    from ..physics import parse_mjcf

    from ..utils.assets import find_model_xml
    spec = parse_mjcf(find_model_xml(args.model_id))
    body_qposaddr = spec.body_qposaddr()

    skt_bvh = os.path.expanduser(
        "datasets/traj/%s_%s.bvh" % (args.mocap_id, args.skt_id))
    skeleton = Skeleton()
    skeleton.load_from_bvh(skt_bvh, EXCLUDE_BONES, SPEC_CHANNELS)

    bvh_files = sorted(glob.glob(os.path.expanduser(
        "datasets/traj/%s_*.bvh" % args.mocap_id)))
    if args.range is not None:
        bvh_files = bvh_files[args.range[0]:args.range[1]]
    for file in bvh_files:
        print("extracting trajectory from %s" % file)
        poses, bone_addr = load_bvh_file(file, skeleton)
        poses = interpolated_traj(poses, args.dt, mocap_fr=args.mocap_fr)
        qpos_traj = np.vstack([get_qpos(p, bone_addr, body_qposaddr, spec.nq)
                               for p in poses])
        qpos_traj[:, 2] += args.offset_z
        name = os.path.splitext(os.path.basename(file))[0]
        traj_file = "%s/%s_traj.p" % (os.path.dirname(file), name)
        pickle.dump(qpos_traj, open(traj_file, "wb"))
        print("saved", traj_file, qpos_traj.shape)


if __name__ == "__main__":
    main()
