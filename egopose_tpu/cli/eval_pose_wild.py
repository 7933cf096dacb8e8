"""Wild pose-estimation metrics (mirrors /root/reference/ego_pose/
eval_pose_wild.py --mode stats): scale-normalized 2D keypoint distance vs
OpenPose ground truth + smoothness."""
from __future__ import annotations

import argparse
import os
import pickle


def compute_wild_metrics(res, algo, takes, pose_ctx, meta, data_dir,
                         fr_margin, dt=1.0 / 30.0, verbose=True):
    from ..utils import metrics as mt
    if res is None:
        return None
    if verbose:
        print("=" * 10 + " %s " % algo + "=" * 10)
    g_pose, g_smooth = 0.0, 0.0
    for take in takes:
        traj_pred = res["traj_pred"][take]
        traj_ub = meta.get("traj_ub", {}).get(take, traj_pred.shape[0])
        traj_pred = traj_pred[:traj_ub]
        tpv_offset = meta.get("tpv_offset", {}).get(take, fr_margin)
        flip = meta.get("tpv_flip", {}).get(take, False)
        pose_dist, valid = 0.0, 0
        for fr in range(max(0, -tpv_offset), traj_pred.shape[0]):
            gt_file = "%s/tpv/poses/%s/%05d_keypoints.json" % (
                data_dir, take, fr + tpv_offset)
            if not os.path.exists(gt_file):
                continue
            gt_p = pose_ctx.load_gt_pose(gt_file)
            if not pose_ctx.check_gt(gt_p):
                continue
            valid += 1
            p2 = pose_ctx.align_qpos(traj_pred[fr], gt_p, flip=flip)
            pose_dist += pose_ctx.get_pose_dist(p2, gt_p)
        pose_dist /= max(valid, 1)
        vels = mt.get_joint_vels(traj_pred, dt)
        accels = mt.get_joint_accels(vels, dt)
        smooth = mt.get_mean_abs(accels)
        if verbose:
            print("%s - pose dist: %.4f, accels: %.4f" % (take, pose_dist,
                                                          smooth))
        g_pose += pose_dist
        g_smooth += smooth
    g_pose /= len(takes)
    g_smooth /= len(takes)
    if verbose:
        print("-" * 60)
        print("all - pose dist: %.4f, accels: %.4f" % (g_pose, g_smooth))
        print("-" * 60 + "\n")
    return g_pose, g_smooth


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--egomimic-cfg", default=None)
    parser.add_argument("--statereg-cfg", default=None)
    parser.add_argument("--egomimic-iter", type=int, default=0)
    parser.add_argument("--statereg-iter", type=int, default=0)
    parser.add_argument("--data", default="wild_01")
    parser.add_argument("--mode", default="stats")
    parser.add_argument("--meta-file", default=None,
                        help="yaml with tpv_offset/tpv_flip/traj_ub")
    parser.add_argument("--take-ind", type=int, default=-1,
                        help="vis: restrict to one take (reference "
                             "eval_pose_wild.py:28 starts its viewer there; "
                             "default all)")
    parser.add_argument("--tpv", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="include the third-person-view panel "
                             "(eval_pose_wild.py:30)")
    parser.add_argument("--stats-vis", action="store_true", default=False,
                        help="also write the keypoint-overlay videos while "
                             "computing stats (eval_pose_wild.py:71)")
    parser.add_argument("--multi", action="store_true", default=False,
                        help="vis: use the multi-humanoid overlay model")
    parser.add_argument("--vis-model", default="humanoid_1205_vis_single_v1")
    parser.add_argument("--multi-vis-model",
                        default="humanoid_1205_vis_estimate_v1")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import yaml
    from ..physics import parse_mjcf, build_model
    from ..utils.config import EgoMimicConfig
    from ..utils.pose2d import Pose2DContext

    cfg = EgoMimicConfig(args.egomimic_cfg, create_dirs=False)
    from ..utils.assets import find_model_xml
    spec = parse_mjcf(find_model_xml(cfg.mujoco_model))
    model = build_model(spec, dtype=jnp.float32)
    pose_ctx = Pose2DContext(model, spec)

    wild_meta = {}
    if args.meta_file and os.path.exists(args.meta_file):
        wild_meta = yaml.safe_load(open(args.meta_file))

    em_res = None
    if args.egomimic_cfg is not None:
        path = "results/egomimic/%s/results/iter_%04d_%s.p" % (
            args.egomimic_cfg, args.egomimic_iter, args.data)
        em_res, _ = pickle.load(open(path, "rb"))
    sr_res = None
    if args.statereg_cfg is not None:
        path = "results/statereg/%s/results/iter_%04d_%s.p" % (
            args.statereg_cfg, args.statereg_iter, args.data)
        sr_res, _ = pickle.load(open(path, "rb"))

    takes = list((em_res or sr_res)["traj_pred"].keys())
    if args.take_ind >= 0:
        takes = [takes[args.take_ind]]
    vis_model = args.multi_vis_model if args.multi else args.vis_model
    out = {}
    if args.mode == "stats":
        out["ego_mimic"] = compute_wild_metrics(
            em_res, "ego mimic", takes, pose_ctx, wild_meta, cfg.data_dir,
            cfg.fr_margin)
        out["state_reg"] = compute_wild_metrics(
            sr_res, "state reg", takes, pose_ctx, wild_meta, cfg.data_dir,
            cfg.fr_margin)
        if args.stats_vis:  # overlay videos alongside the stats
            from ..utils.vis_modes import wild_fpv_tpv_video
            res, algo = (em_res, "egomimic") if em_res is not None \
                else (sr_res, "statereg")
            os.makedirs("out", exist_ok=True)
            for take in takes:
                wild_fpv_tpv_video(
                    res["traj_pred"][take], take, pose_ctx, cfg, wild_meta,
                    "out/wild_statsvis_%s_%s.mp4" % (algo, take),
                    _PrintLogger(), tpv=args.tpv, vis_model=vis_model)
    elif args.mode == "vis":
        # the reference's FPV/TPV synced viewer (eval_pose_wild.py:103-273);
        # headless form: per-take composited video [3D pose | FPV | TPV +
        # projected-keypoint overlay]
        from ..utils.vis_modes import wild_fpv_tpv_video
        res, algo = (em_res, "egomimic") if em_res is not None \
            else (sr_res, "statereg")
        os.makedirs("out", exist_ok=True)
        for take in takes:
            out[take] = wild_fpv_tpv_video(
                res["traj_pred"][take], take, pose_ctx, cfg, wild_meta,
                "out/wild_vis_%s_%s.mp4" % (algo, take), _PrintLogger(),
                tpv=args.tpv, vis_model=vis_model)
    else:
        raise SystemExit("unknown --mode %s (stats|vis)" % args.mode)
    return out


class _PrintLogger:
    def info(self, msg):
        print(msg)


if __name__ == "__main__":
    main()
