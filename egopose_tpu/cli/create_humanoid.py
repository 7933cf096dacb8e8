"""Humanoid MJCF generation from a BVH skeleton (mirrors /root/reference/
ego_pose/data_process/create_humanoid.py)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mocap-id", type=str, default="1205")
    parser.add_argument("--skt-id", type=str, default="take_01")
    parser.add_argument("--template-id", type=str, default="humanoid_template")
    parser.add_argument("--out-id", type=str, default=None)
    args = parser.parse_args(argv)

    from ..mocap import Skeleton
    from .convert_clip import EXCLUDE_BONES, SPEC_CHANNELS

    bvh = os.path.expanduser("datasets/traj/%s_%s.bvh"
                             % (args.mocap_id, args.skt_id))
    skeleton = Skeleton()
    skeleton.load_from_bvh(bvh, EXCLUDE_BONES, SPEC_CHANNELS)
    out_id = args.out_id or ("humanoid_%s_orig" % args.mocap_id)
    os.makedirs("assets/mujoco_models", exist_ok=True)
    out = "assets/mujoco_models/%s.xml" % out_id
    rel = "assets/mujoco_models/template/%s.xml" % args.template_id
    pkg_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "..")
    template = rel if os.path.exists(rel) else os.path.join(pkg_root, rel)
    if not os.path.exists(template):
        raise SystemExit(f"template not found: {rel} (generate it with "
                         "egopose_tpu.physics.spec.write_vis_family)")
    skeleton.write_xml(out, template_fname=template)
    print("wrote", out, "from template", template)


if __name__ == "__main__":
    main()
