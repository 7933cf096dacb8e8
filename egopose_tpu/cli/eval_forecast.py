"""Forecast metrics (mirrors /root/reference/ego_pose/eval_forecast.py
--mode stats): pose/vel/accel metrics per horizon over the sliding windows."""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def compute_metrics(results, algo, horizon, fr_margin, dt=1.0 / 30.0,
                    verbose=True):
    """Horizon-sliced metrics (eval_forecast.py:29-85)."""
    from ..utils import metrics as mt
    if results is None:
        return None
    if verbose:
        print("=" * 10 + " %s " % algo + "=" * 10)
    g_pose, g_vel, g_smooth = 0.0, 0.0, 0.0
    traj_orig = results["traj_orig"]
    traj_pred = results["traj_pred"]
    for take in traj_pred.keys():
        t_pose = t_vel = t_smooth = 0.0
        n_win = traj_orig[take].shape[0]
        for i in range(n_win):
            traj = traj_pred[take][i, fr_margin:fr_margin + horizon]
            traj_gt = traj_orig[take][i, fr_margin:fr_margin + horizon]
            angs_gt = mt.get_joint_angles(traj_gt)
            vels_gt = mt.get_joint_vels(traj_gt, dt)
            angs = mt.get_joint_angles(traj)
            vels = mt.get_joint_vels(traj, dt)
            accels = mt.get_joint_accels(vels, dt)
            t_pose += mt.get_mean_dist(angs, angs_gt)
            t_vel += mt.get_mean_dist(vels, vels_gt)
            t_smooth += mt.get_mean_abs(accels)
        t_pose /= n_win
        t_vel /= n_win
        t_smooth /= n_win
        if verbose:
            print("%s - horizon: %d, pose dist: %.4f, vel dist: %.4f, "
                  "accels: %.4f" % (take, horizon, t_pose, t_vel, t_smooth))
        g_pose += t_pose
        g_vel += t_vel
        g_smooth += t_smooth
    n = len(traj_pred)
    g_pose, g_vel, g_smooth = g_pose / n, g_vel / n, g_smooth / n
    if verbose:
        print("-" * 60)
        print("all - horizon: %d, pose dist: %.4f, vel dist: %.4f, "
              "accels: %.4f" % (horizon, g_pose, g_vel, g_smooth))
        print("-" * 60 + "\n")
    return g_pose, g_vel, g_smooth


def compute_err_vs_h(results, algo, horizon, fr_margin, step=10):
    errors = []
    for h in range(step, horizon, step):
        err, _, _ = compute_metrics(results, algo, h, fr_margin, verbose=False)
        errors.append(err)
    errors = np.array(errors)
    print(algo, np.array2string(errors, formatter={"all": lambda x: "%.4f" % x},
                                separator=", "))
    return errors


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--egoforecast-cfg", default=None)
    parser.add_argument("--egoforecast-iter", type=int, default=0)
    parser.add_argument("--data", default="test")
    parser.add_argument("--suffix", default="")
    parser.add_argument("--mode", default="stats")
    parser.add_argument("--multi", action="store_true", default=False,
                        help="vis: time-staggered multi-window puppeting "
                             "(eval_forecast.py:188,224)")
    parser.add_argument("--vis-model", default="humanoid_1205_vis_ghost_v1")
    parser.add_argument("--multi-vis-model",
                        default="humanoid_1205_vis_forecast_v1")
    args = parser.parse_args(argv)

    from ..utils.config import EgoForecastConfig
    from ..utils.tools import remove_noisy_hands

    cfg = EgoForecastConfig(args.egoforecast_cfg, create_dirs=False)
    res_path = "results/egoforecast/%s/results/iter_%04d_%s%s.p" % (
        args.egoforecast_cfg, args.egoforecast_iter, args.data, args.suffix)
    results, meta = pickle.load(open(res_path, "rb"))
    remove_noisy_hands(results)

    if args.mode == "stats":
        out30 = compute_metrics(results, "ego forecast", 30, cfg.fr_margin)
        out90 = compute_metrics(results, "ego forecast", 90, cfg.fr_margin)
        return {"horizon_30": out30, "horizon_90": out90}
    elif args.mode == "vis":
        # interactive viewer: q/e steps the forecast window, z/c the take
        # (eval_forecast.py vis mode); video fallback when headless
        algos = [("ego forecast",
                  {take: {"pred": results["traj_pred"][take],
                          "orig": results["traj_orig"][take]}
                   for take in results["traj_pred"]})]
        from ..utils.assets import find_model_xml
        xml = find_model_xml(
            args.multi_vis_model if args.multi else args.vis_model)
        try:
            from ..envs.visual import TrajectoryViewer
            TrajectoryViewer(xml, algos).run()
        except Exception as e:
            print("no display (%s) -- writing video instead" % e)
            from ..utils.render import render_qpos_video
            take = list(results["traj_pred"].keys())[0]
            out = res_path.replace(".p", ".mp4")
            written = render_qpos_video([results["traj_pred"][take][0],
                                         results["traj_orig"][take][0]], out)
            print("wrote %s" % written)
            return written


if __name__ == "__main__":
    main()
