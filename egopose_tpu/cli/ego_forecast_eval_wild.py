"""In-the-wild forecast evaluation (mirrors /root/reference/ego_pose/
ego_forecast_eval_wild.py --mode save): sliding-window forecasting from wild
ego-mimic estimation results (no ground truth experts).

TPU-native design: every sliding window of every take is one lane of a single
vmapped lax.scan (the reference rolls windows out sequentially on CPU,
ego_forecast_eval_wild.py:94-153); the per-step state-LSTM runs as a batched
carry inside the scan.
"""
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
    parser.add_argument("--mode", default="save", choices=("save", "vis"),
                        help="save: write results pickle; vis: also view "
                             "(or, headless, render) the windows")
    parser.add_argument("--f64", action="store_true", default=False,
                        help="evaluate in float64 (validation parity runs, "
                             "SURVEY 7.4.4); default f32")
    parser.add_argument("--test-ind", type=int, default=-1,
                        help="restrict to one wild take (reference "
                             "ego_forecast_eval_wild.py:27; default all)")
    parser.add_argument("--start-ind", type=int, default=None,
                        help="restrict to the window starting at this frame")
    parser.add_argument("--show-noise", action="store_true", default=False,
                        help="sampled instead of mean actions")
    parser.add_argument("--render", action="store_true", default=False,
                        help="replay the rolled-out windows after the "
                             "batched scan (post-hoc; the scan rolls all "
                             "windows at once)")
    parser.add_argument("--vis-model",
                        default="humanoid_1205_vis_forecast_v1",
                        help="vis model XML for --render/--mode vis")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float64 if args.f64 else jnp.float32

    from .. import envs
    from ..ops import running_norm
    from ..rl.agent_forecast import make_forecast_agent
    from ..utils.config import EgoForecastConfig, EgoMimicConfig
    from ..utils.log import create_logger
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
    fdim = list(cnn_feat_dict.values())[0].shape[-1]
    agent = make_forecast_agent(model, spec, p, tables, expert,
                                np.zeros((1, 8, fdim), np.float32), cfg,
                                batch_lanes=1, seed=cfg.seed, dtype=dtype)
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

    # lane list: every sliding window of every take
    lane_take, lane_start = [], []
    for i, take in enumerate(takes):
        if args.test_ind >= 0 and i != args.test_ind:
            continue
        take_len = cnn_feat_dict[take].shape[0]
        est_len = em_res["traj_pred"][take].shape[0]
        start = m
        while start + test_len <= take_len and \
                start - em_margin + test_len <= est_len:
            if args.start_ind is None or start == args.start_ind:
                lane_take.append(i)
                lane_start.append(start)
            start += m
    n_lanes = len(lane_take)
    logger.info("%d wild forecast windows across %d takes"
                % (n_lanes, len(takes)))
    if n_lanes == 0:
        results = {"traj_pred": {t: np.zeros((0, m + test_len, p.nq))
                                 for t in takes}}
        os.makedirs(cfg.result_dir, exist_ok=True)
        res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                          args.test_feat)
        pickle.dump((results, {"algo": "ego_forecast"}), open(res_path, "wb"))
        return results

    # host-side window assembly: past-video windows, init states, margin rows
    past_wins = np.zeros((n_lanes, m, fdim), np.float32)
    init_qpos = np.zeros((n_lanes, p.nq))
    init_qvel = np.zeros((n_lanes, p.nv))
    margin_rows = np.zeros((n_lanes, m, p.nq))
    for li in range(n_lanes):
        i, s = lane_take[li], lane_start[li]
        take = takes[i]
        past_wins[li] = np.asarray(cnn_feat_dict[take][s - m:s])
        est_traj = em_res["traj_pred"][take]
        est_vel = em_res["vel_pred"][take]
        e_ind = max(0, s - em_margin)
        init_qpos[li] = est_traj[min(e_ind, est_traj.shape[0] - 1)]
        init_qvel[li] = est_vel[min(e_ind, est_vel.shape[0] - 1)]
        past = est_traj[max(0, e_ind - m):e_ind]
        if past.shape[0] < m:
            past = np.vstack([np.tile(init_qpos[li],
                                      (m - past.shape[0], 1)), past])
        margin_rows[li] = past

    v_out = policy_vs.apply(ts.policy_vs, jnp.asarray(past_wins, dtype),
                            method=policy_vs.encode_video)

    def init_state(qp, qv):
        st = envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                        fix_expert_ind=0, fix_start_ind=p.fr_margin)
        bq = envs.get_body_quat(tables, qp)
        return st._replace(qpos=qp, qvel=qv, prev_qpos=qp,
                           prev_bquat=bq, bquat=bq)

    state0 = jax.vmap(init_state)(jnp.asarray(init_qpos, dtype),
                                  jnp.asarray(init_qvel, dtype))
    s_carry0 = policy_vs.s_init_carry((n_lanes,), jnp.float32)

    def step_fn(carry, t):
        st, s_carry = carry
        qpos_rec = st.qpos
        obs = jax.vmap(lambda s: envs.observe(p, s))(st)
        zobs = running_norm.apply(zstat, obs, clip=5.0)
        s_carry, s_out = policy_vs.apply(ts.policy_vs, s_carry, zobs,
                                         method=policy_vs.s_step)
        vctx = v_out[:, t] if v_out.ndim == 3 else v_out
        action, log_std = policy_apply(ts.policy,
                                       jnp.concatenate([vctx, s_out], -1))
        if args.show_noise:  # sampled instead of mean actions
            from ..rl.distributions import diag_gaussian_sample
            action = diag_gaussian_sample(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), t),
                action, log_std)
        new_st, out = jax.vmap(
            lambda s, a: envs.step(model, p, tables, expert, s, a, 0.0,
                                   fix_head_lb=-10.0))(st, action)
        return (new_st, s_carry), qpos_rec

    import time as _time
    eval_fn = jax.jit(lambda c: jax.lax.scan(step_fn, c,
                                             jnp.arange(test_len)))
    t0 = _time.time()
    (_, _), qpos_traj = jax.block_until_ready(
        eval_fn((state0, s_carry0)))
    wall = _time.time() - t0
    logger.info("wild forecast rollout: %d windows x %d frames in %.2fs "
                "(%.0f frames/s incl. compile)"
                % (n_lanes, test_len, wall,
                   n_lanes * test_len / max(wall, 1e-9)))
    qpos_traj = np.asarray(qpos_traj)  # (T, L, nq)

    traj_pred_dict = {}
    for i, take in enumerate(takes):
        sel = [li for li in range(n_lanes) if lane_take[li] == i]
        wins = [np.vstack([margin_rows[li], qpos_traj[:, li]]) for li in sel]
        traj_pred_dict[take] = np.stack(wins) if wins else \
            np.zeros((0, m + test_len, p.nq))
        logger.info("%s %s" % (take, traj_pred_dict[take].shape))

    results = {"traj_pred": traj_pred_dict}
    meta = {"algo": "ego_forecast"}
    os.makedirs(cfg.result_dir, exist_ok=True)
    res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                      args.test_feat)
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("saved results to %s" % res_path)

    if args.mode == "vis" or args.render:
        from ..utils.vis_modes import view_or_render_windows
        view_or_render_windows(results, res_path, logger,
                               vis_model=args.vis_model)
    return results


if __name__ == "__main__":
    main()
