"""Wild forecast metrics (mirrors /root/reference/ego_pose/
eval_forecast_wild.py --mode stats): per-horizon 2D keypoint distance vs
OpenPose ground truth over the forecast windows."""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--egoforecast-cfg", default=None)
    parser.add_argument("--egoforecast-iter", type=int, default=0)
    parser.add_argument("--data", default="wild_01")
    parser.add_argument("--mode", default="stats")
    parser.add_argument("--horizons", type=int, nargs="+", default=[30, 90])
    parser.add_argument("--horizon", type=int, default=None,
                        help="single horizon (the reference's flag, "
                             "eval_forecast_wild.py:26); overrides "
                             "--horizons")
    parser.add_argument("--meta-file", default=None)
    parser.add_argument("--take-ind", type=int, default=-1,
                        help="restrict to one take (default all)")
    parser.add_argument("--tpv", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="include the TPV panel in --stats-vis videos")
    parser.add_argument("--stats-vis", action="store_true", default=False,
                        help="also write keypoint-overlay videos of the "
                             "first window per take while computing stats")
    parser.add_argument("--multi", action="store_true", default=False,
                        help="vis: use the multi-humanoid overlay model")
    parser.add_argument("--vis-model", default="humanoid_1205_vis_ghost_v1")
    parser.add_argument("--multi-vis-model",
                        default="humanoid_1205_vis_blank_v1")
    args = parser.parse_args(argv)
    if args.horizon is not None:
        args.horizons = [args.horizon]

    import jax.numpy as jnp
    import yaml
    from ..physics import parse_mjcf, build_model
    from ..utils import metrics as mt
    from ..utils.config import EgoForecastConfig
    from ..utils.pose2d import Pose2DContext

    cfg = EgoForecastConfig(args.egoforecast_cfg, create_dirs=False)
    from ..utils.assets import find_model_xml
    spec = parse_mjcf(find_model_xml(cfg.mujoco_model))
    model = build_model(spec, dtype=jnp.float32)
    pose_ctx = Pose2DContext(model, spec)
    wild_meta = yaml.safe_load(open(args.meta_file)) \
        if args.meta_file and os.path.exists(args.meta_file) else {}

    res_path = "results/egoforecast/%s/results/iter_%04d_%s.p" % (
        args.egoforecast_cfg, args.egoforecast_iter, args.data)
    results, _ = pickle.load(open(res_path, "rb"))
    m = cfg.fr_margin
    dt = 1 / 30.0
    if args.take_ind >= 0:
        keep = list(results["traj_pred"].keys())[args.take_ind]
        results = dict(results)
        results["traj_pred"] = {keep: results["traj_pred"][keep]}

    class _L:
        def info(self, msg):
            print(msg)

    if args.mode == "vis":
        # wild forecast window vis (eval_forecast_wild.py vis mode):
        # interactive viewer or headless replay/video
        from ..utils.vis_modes import view_or_render_windows
        return view_or_render_windows(
            results, res_path, _L(),
            vis_model=args.multi_vis_model if args.multi else args.vis_model)
    if args.mode != "stats":
        raise SystemExit("unknown --mode %s (stats|vis)" % args.mode)

    if args.stats_vis:  # overlay videos alongside the stats
        from ..utils.vis_modes import wild_fpv_tpv_video
        os.makedirs("out", exist_ok=True)
        for take, windows in results["traj_pred"].items():
            if windows.shape[0]:
                wild_fpv_tpv_video(
                    windows[0], take, pose_ctx, cfg, wild_meta,
                    "out/wildfc_statsvis_%s.mp4" % take, _L(),
                    tpv=args.tpv,
                    vis_model=args.multi_vis_model if args.multi
                    else args.vis_model)

    out = {}
    for horizon in args.horizons:
        g_pose, g_smooth, n = 0.0, 0.0, 0
        for take, windows in results["traj_pred"].items():
            tpv_offset = wild_meta.get("tpv_offset", {}).get(take, m)
            flip = wild_meta.get("tpv_flip", {}).get(take, False)
            t_pose, t_smooth, t_valid = 0.0, 0.0, 0
            for wi in range(windows.shape[0]):
                traj = windows[wi, m:m + horizon]
                pose_dist, valid = 0.0, 0
                for fr in range(traj.shape[0]):
                    gt_fr = wi * m + m + fr + tpv_offset
                    gt_file = "%s/tpv/poses/%s/%05d_keypoints.json" % (
                        cfg.data_dir, take, gt_fr)
                    if not os.path.exists(gt_file):
                        continue
                    gt_p = pose_ctx.load_gt_pose(gt_file)
                    if not pose_ctx.check_gt(gt_p):
                        continue
                    valid += 1
                    p2 = pose_ctx.align_qpos(traj[fr], gt_p, flip=flip)
                    pose_dist += pose_ctx.get_pose_dist(p2, gt_p)
                if valid:
                    t_pose += pose_dist / valid
                    t_valid += 1
                vels = mt.get_joint_vels(traj, dt)
                t_smooth += mt.get_mean_abs(mt.get_joint_accels(vels, dt))
            if windows.shape[0]:
                g_pose += t_pose / max(t_valid, 1)
                g_smooth += t_smooth / windows.shape[0]
                n += 1
        if n:
            g_pose /= n
            g_smooth /= n
        print("all - horizon: %d, pose dist: %.4f, accels: %.4f"
              % (horizon, g_pose, g_smooth))
        out[horizon] = (g_pose, g_smooth)
    return out


if __name__ == "__main__":
    main()
