"""In-the-wild forecast evaluation (mirrors /root/reference/ego_pose/
ego_forecast_eval_wild.py --mode save): sliding-window forecasting from wild
ego-mimic estimation results (no ground truth experts)."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--iter", type=int, default=0)
    parser.add_argument("--test-feat", default=None)
    parser.add_argument("--egomimic-iter", type=int, default=None)
    parser.add_argument("--mode", default="save")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float32

    from .. import envs
    from ..ops import running_norm
    from ..ops import math_utils as M
    from ..rl.agent_forecast import make_forecast_agent
    from ..utils.config import EgoForecastConfig, EgoMimicConfig
    from ..utils.log import create_logger
    from ..utils.tools import align_human_state
    from .ego_mimic import build_world

    cfg = EgoForecastConfig(args.cfg, create_dirs=False)
    logger = create_logger(os.path.join(cfg.log_dir, "log_eval_wild.txt"))

    feat_file = "%s/features/cnn_feat_%s.p" % (cfg.data_dir, args.test_feat)
    cnn = pickle.load(open(feat_file, "rb"))
    cnn_feat_dict = cnn[0] if isinstance(cnn, tuple) else cnn
    takes = list(cnn_feat_dict.keys())

    # wild estimation results to initialize from
    em_cfg = EgoMimicConfig(cfg.ego_mimic_cfg, create_dirs=False)
    em_iter = args.egomimic_iter if args.egomimic_iter is not None \
        else cfg.ego_mimic_iter
    em_path = "%s/iter_%04d_%s.p" % (em_cfg.result_dir, em_iter,
                                     args.test_feat)
    em_res, _ = pickle.load(open(em_path, "rb"))
    em_margin = em_cfg.fr_margin

    spec, model, tables, p, expert, _ = build_world(cfg, dtype,
                                                    synthetic=True)
    agent = make_forecast_agent(model, spec, p, tables, expert,
                                np.zeros((1, 8,
                                          list(cnn_feat_dict.values())[0].shape[-1]),
                                         np.float32), cfg, batch_lanes=1,
                                seed=cfg.seed, dtype=dtype)
    cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
    if os.path.exists(cp_path):
        agent.load(cp_path)
        logger.info("loaded policy from %s" % cp_path)

    ts = agent.train_state
    zstat = agent.zstat
    policy_apply = agent._applies[0]
    policy_vs = agent.policy_vs_net
    m = cfg.fr_margin
    test_len = cfg.env_episode_len

    traj_pred_dict = {}
    for take in takes:
        cnn_feat = jnp.asarray(cnn_feat_dict[take], dtype)
        take_len = cnn_feat.shape[0]
        est_traj = em_res["traj_pred"][take]
        est_vel = em_res["vel_pred"][take]
        windows = []
        start = m
        while start + test_len <= take_len and \
                start - em_margin + test_len <= est_traj.shape[0]:
            v_out = policy_vs.apply(ts.policy_vs,
                                    cnn_feat[None, start - m:start],
                                    method=policy_vs.encode_video)[0]
            # init from the estimation result at the window start
            e_ind = max(0, start - em_margin)
            qpos = est_traj[min(e_ind, est_traj.shape[0] - 1)].copy()
            qvel = est_vel[min(e_ind, est_vel.shape[0] - 1)].copy()
            st = envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                            fix_expert_ind=0, fix_start_ind=p.fr_margin)
            bq = envs.get_body_quat(tables, jnp.asarray(qpos, dtype))
            st = st._replace(qpos=jnp.asarray(qpos, dtype),
                             qvel=jnp.asarray(qvel, dtype),
                             prev_qpos=jnp.asarray(qpos, dtype),
                             prev_bquat=bq, bquat=bq)
            s_carry = policy_vs.s_init_carry((), jnp.float32)
            past = est_traj[max(0, e_ind - m):e_ind]
            if past.shape[0] < m:
                past = np.vstack([np.tile(qpos, (m - past.shape[0], 1)), past])
            rows = [past]
            roll = []
            for t in range(test_len):
                roll.append(np.asarray(st.qpos))
                obs = envs.observe(p, st)
                zobs = running_norm.apply(zstat, obs, clip=5.0)
                s_carry, s_out = policy_vs.apply(ts.policy_vs, s_carry, zobs,
                                                 method=policy_vs.s_step)
                action, _ = policy_apply(ts.policy,
                                         jnp.concatenate([v_out, s_out]))
                st, out = envs.step(model, p, tables, expert, st, action,
                                    fix_head_lb=jnp.asarray(-10.0, dtype))
            rows.append(np.vstack(roll))
            windows.append(np.vstack(rows))
            start += m
        traj_pred_dict[take] = np.stack(windows) if windows else \
            np.zeros((0, m + test_len, p.nq))
        logger.info("%s %s" % (take, traj_pred_dict[take].shape))

    results = {"traj_pred": traj_pred_dict}
    meta = {"algo": "ego_forecast"}
    os.makedirs(cfg.result_dir, exist_ok=True)
    res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                      args.test_feat)
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("saved results to %s" % res_path)
    return results


if __name__ == "__main__":
    main()
