"""Pose-estimation metrics (mirrors /root/reference/ego_pose/eval_pose.py
--mode stats): pose dist / velocity dist / smoothness over result pickles.

The vis mode of the reference opens a GLFW viewer; here ``--mode vis`` writes
a rendered video via the host-side MuJoCo renderer instead (headless)."""
from __future__ import annotations

import argparse
import pickle

import numpy as np


ALGOS = {"state_reg": "statereg", "ego_mimic": "egomimic"}


def compute_stats(results, dt=1.0 / 30.0, logger=None):
    """Pose/vel/accel metrics (eval_pose.py:31-68)."""
    from ..utils import metrics as mt
    from ..utils.tools import remove_noisy_hands

    remove_noisy_hands(results)
    traj_pred = results["traj_pred"]
    traj_orig = results["traj_orig"]
    p_dists, v_dists, p_accels = [], [], []
    per_take = {}
    for take in traj_pred:
        tp, to = traj_pred[take], traj_orig[take]
        n = min(tp.shape[0], to.shape[0])
        tp, to = tp[:n], to[:n]
        angles_pred = mt.get_joint_angles(tp)
        angles_orig = mt.get_joint_angles(to)
        vels_pred = mt.get_joint_vels(tp, dt)
        vels_orig = mt.get_joint_vels(to, dt)
        accels_pred = mt.get_joint_accels(vels_pred, dt)
        p_dist = mt.get_mean_dist(angles_pred, angles_orig)
        v_dist = mt.get_mean_dist(vels_pred, vels_orig)
        p_accel = mt.get_mean_abs(accels_pred)
        per_take[take] = dict(pose_dist=p_dist, vel_dist=v_dist,
                              accel=p_accel)
        p_dists.append(p_dist)
        v_dists.append(v_dist)
        p_accels.append(p_accel)
        if logger:
            logger.info("%s: pose_dist %.4f vel_dist %.4f accel %.4f"
                        % (take, p_dist, v_dist, p_accel))
    stats = dict(pose_dist=float(np.mean(p_dists)),
                 vel_dist=float(np.mean(v_dists)),
                 accel=float(np.mean(p_accels)),
                 per_take=per_take)
    if logger:
        logger.info("overall: pose_dist %.4f vel_dist %.4f accel %.4f"
                    % (stats["pose_dist"], stats["vel_dist"], stats["accel"]))
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--egomimic-cfg", default=None)
    parser.add_argument("--statereg-cfg", default=None)
    parser.add_argument("--mode", default="stats")
    parser.add_argument("--data", default="test")
    parser.add_argument("--egomimic-iter", type=int, default=0)
    parser.add_argument("--statereg-iter", type=int, default=0)
    parser.add_argument("--algo", default="ego_mimic")
    parser.add_argument("--tag", "--egomimic-tag", dest="tag", default="",
                        help="results-file suffix (the reference's "
                             "--egomimic-tag, eval_pose.py:25)")
    parser.add_argument("--multi", action="store_true", default=False,
                        help="vis: time-staggered multi-humanoid puppeting")
    parser.add_argument("--vis-model", default="humanoid_1205_vis_double_v1")
    parser.add_argument("--multi-vis-model",
                        default="humanoid_1205_vis_multi_v1")
    args = parser.parse_args(argv)

    from ..utils.log import create_logger
    logger = create_logger(None, file_handle=False)

    if args.algo == "ego_mimic":
        res_path = "results/egomimic/%s/results/iter_%04d_%s%s.p" % (
            args.egomimic_cfg, args.egomimic_iter, args.data, args.tag)
    else:
        res_path = "results/statereg/%s/results/iter_%04d_%s%s.p" % (
            args.statereg_cfg, args.statereg_iter, args.data, args.tag)
    results, meta = pickle.load(open(res_path, "rb"))
    logger.info("loaded results from %s (meta: %s)" % (
        res_path, {k: v for k, v in meta.items() if not hasattr(v, "shape")}))

    if args.mode == "stats":
        return compute_stats(results, logger=logger)
    elif args.mode == "vis":
        # interactive viewer over both result sets (keys 1=ego mimic,
        # 2=state reg; eval_pose.py:186-189); video fallback when headless
        def to_viewer(res):
            return {take: {"pred": res["traj_pred"][take],
                           "orig": res["traj_orig"].get(take)}
                    for take in res["traj_pred"]}

        algos = [("ego mimic" if args.algo == "ego_mimic" else "state reg",
                  to_viewer(results))]
        other_path = None
        if args.algo == "ego_mimic" and args.statereg_cfg:
            other_path = "results/statereg/%s/results/iter_%04d_%s.p" % (
                args.statereg_cfg, args.statereg_iter, args.data)
        if other_path:
            other, _ = pickle.load(open(other_path, "rb"))
            algos.append(("state reg", to_viewer(other)))
        from ..utils.assets import find_model_xml
        xml = find_model_xml(
            args.multi_vis_model if args.multi else args.vis_model)
        try:
            from ..envs.visual import TrajectoryViewer
            TrajectoryViewer(xml, algos).run()
        except Exception as e:
            logger.info("no display (%s) -- writing video instead" % e)
            from ..utils.render import render_qpos_video
            out = res_path.replace(".p", ".mp4")
            take = list(results["traj_pred"].keys())[0]
            written = render_qpos_video([results["traj_pred"][take],
                                         results["traj_orig"][take]], out)
            logger.info("wrote %s" % written)


if __name__ == "__main__":
    main()
