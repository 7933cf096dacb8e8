"""Ego-forecast evaluation (mirrors /root/reference/ego_pose/
ego_forecast_eval.py --mode save): sliding-window closed-loop forecasting.

Windows start every fr_margin frames across each take
(ego_forecast_eval.py:191-196); each window rolls the forecast policy for
env_episode_len steps from a state taken from the ego-mimic estimation
results (or ground truth with --gt-init), conditioned only on the fr_margin
*past* video frames.  TPU-native: every window of every take is one lane of a
single vmapped scan.

Result pickle matches the reference: traj_pred/traj_orig dicts of
(n_windows, fr_margin + test_len, nq) arrays.
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
    parser.add_argument("--data", default="test")
    parser.add_argument("--mode", default="save")
    parser.add_argument("--gt-init", action="store_true", default=False)
    parser.add_argument("--em-iter", "--egomimic-iter", type=int,
                        dest="em_iter", default=None,
                        help="ego-mimic eval results iteration to initialize "
                             "windows from (default: cfg.ego_mimic_iter)")
    parser.add_argument("--synthetic", action="store_true", default=False)
    parser.add_argument("--f64", action="store_true", default=False,
                        help="evaluate in float64 (validation parity runs, "
                             "SURVEY 7.4.4); default f32")
    parser.add_argument("--expert-ind", type=int, default=-1,
                        help="restrict to one take's windows (reference "
                             "ego_forecast_eval.py:26; default all)")
    parser.add_argument("--start-ind", type=int, default=None,
                        help="restrict to the window starting at this frame "
                             "(ego_forecast_eval.py:27)")
    parser.add_argument("--show-noise", action="store_true", default=False,
                        help="sampled instead of mean actions "
                             "(ego_forecast_eval.py:158)")
    parser.add_argument("--render", action="store_true", default=False,
                        help="replay the rolled-out windows in the viewer "
                             "after the batched scan (the scan rolls all "
                             "windows at once, so rendering happens post-hoc "
                             "rather than live as in the reference)")
    parser.add_argument("--verbose", action="store_true", default=False,
                        help="per-window failure log lines "
                             "(ego_forecast_eval.py:175)")
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
    from ..rl.agent_forecast import make_forecast_agent, gather_past_windows
    from ..utils.config import EgoForecastConfig, EgoMimicConfig
    from ..utils.log import create_logger
    from ..utils.tools import sync_traj
    from .ego_mimic import build_world

    cfg = EgoForecastConfig(args.cfg, create_dirs=False)
    logger = create_logger(os.path.join(cfg.log_dir, "log_eval.txt"))
    np.random.seed(cfg.seed)

    spec, model, tables, p, expert, cnn_feat = build_world(
        cfg, dtype, synthetic=args.synthetic, data=args.data)
    agent = make_forecast_agent(model, spec, p, tables, expert, cnn_feat,
                                cfg, batch_lanes=1, seed=cfg.seed, dtype=dtype)
    cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
    if os.path.exists(cp_path):
        logger.info("loading policy from checkpoint: %s" % cp_path)
        agent.load(cp_path)
    else:
        logger.info("no checkpoint at %s -- evaluating untrained policy" % cp_path)

    takes = cfg.takes[args.data] if cfg.takes[args.data] else \
        [f"take_{i}" for i in range(expert.qpos.shape[0])]
    n_takes = expert.qpos.shape[0]
    m = cfg.fr_margin
    test_len = cfg.env_episode_len
    lens = np.asarray(expert.lens)

    # build the sliding-window lane list
    lane_take, lane_start = [], []
    for i in range(n_takes):
        start = m
        while start + test_len <= lens[i]:
            lane_take.append(i)
            lane_start.append(start)
            start += m
    lane_take = np.array(lane_take, np.int32)
    lane_start = np.array(lane_start, np.int32)
    keep = np.ones(len(lane_take), bool)
    if args.expert_ind >= 0:
        keep &= lane_take == args.expert_ind
    if args.start_ind is not None:
        keep &= lane_start == args.start_ind
    lane_take, lane_start = lane_take[keep], lane_start[keep]
    n_lanes = len(lane_take)
    if n_lanes == 0:
        raise SystemExit("no forecast windows match --expert-ind/--start-ind")
    logger.info("%d forecast windows across %d takes" % (n_lanes, n_takes))

    expert_qpos = np.asarray(expert.qpos)

    # initialize each window from the ego-mimic estimation results, the
    # paper's protocol (ego_forecast_eval.py:108-135): slice the estimation
    # trajectory around the window, re-anchor its heading/xy to the expert at
    # window_start - fr_margin (sync_traj), start the sim from the estimated
    # state at the window start, and replay the fr_margin past frames of the
    # estimate into traj_pred.  --gt-init keeps the ground-truth fallback.
    em_init = not args.gt_init
    if em_init:
        em_cfg = EgoMimicConfig(cfg.ego_mimic_cfg, create_dirs=False)
        em_iter = args.em_iter if args.em_iter is not None \
            else (cfg.ego_mimic_iter or 0)
        em_path = "%s/iter_%04d_%s.p" % (em_cfg.result_dir, em_iter,
                                         args.data)
        if not os.path.exists(em_path):
            raise SystemExit(
                f"estimation results not found at {em_path}; run "
                "ego_mimic_eval first (or pass --gt-init)")
        em_res, _ = pickle.load(open(em_path, "rb"))
        em_offset = em_cfg.fr_margin
        logger.info("initializing windows from estimation results %s"
                    % em_path)
        init_qpos = np.zeros((n_lanes, p.nq), np.float64)
        init_qvel = np.zeros((n_lanes, p.nv), np.float64)
        margin_rows = np.zeros((n_lanes, m, p.nq), np.float64)
        for li in range(n_lanes):
            i, s = int(lane_take[li]), int(lane_start[li])
            take = takes[i] if i < len(takes) else f"take_{i}"
            lo = max(0, s - m - em_offset)
            sp = np.asarray(em_res["traj_pred"][take][lo:s + test_len
                                                      - em_offset])
            vp = np.asarray(em_res["vel_pred"][take][lo:s + test_len
                                                     - em_offset])
            miss = m + test_len - sp.shape[0]
            if s - m - em_offset >= 0:
                sp, vp = sync_traj(sp, vp, expert_qpos[i, s - m])
            ind = m - miss
            init_qpos[li], init_qvel[li] = sp[ind], vp[ind]
            for t in range(-m, 0):
                margin_rows[li, t + m] = expert_qpos[i, s + t] \
                    if t + m < miss else sp[t + m - miss]

    ts = agent.train_state
    zstat = agent.zstat
    policy_apply = agent._applies[0]
    policy_vs = agent.policy_vs_net

    lane_take_j = jnp.asarray(lane_take)
    lane_start_j = jnp.asarray(lane_start)
    windows = gather_past_windows(jnp.asarray(cnn_feat, dtype), lane_take_j,
                                  lane_start_j, m)
    v_out = policy_vs.apply(ts.policy_vs, windows,
                            method=policy_vs.encode_video)

    def init_state(i, s):
        return envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                          fix_expert_ind=i, fix_start_ind=s)

    state0 = jax.vmap(init_state)(lane_take_j, lane_start_j)
    if em_init:
        def set_lane(st, qp, qv):
            bq = envs.get_body_quat(tables, qp)
            return st._replace(qpos=qp, qvel=qv, prev_qpos=qp,
                               prev_bquat=bq, bquat=bq)

        state0 = jax.vmap(set_lane)(state0, jnp.asarray(init_qpos, dtype),
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
            lambda s, a: envs.step(model, p, tables, expert, s, a))(st, action)
        return (new_st, s_carry), (qpos_rec, out.fail)

    (stf, _), (qpos_traj, fails) = jax.lax.scan(
        step_fn, (state0, s_carry0), jnp.arange(test_len))
    qpos_traj = np.asarray(qpos_traj)            # (T, L, nq)
    n_fail = int(np.asarray(fails).sum())
    logger.info("window failures: %d" % n_fail)
    if args.verbose:
        for li in np.where(np.asarray(fails).any(axis=0))[0]:
            logger.info("fail - expert_ind: %d, start_ind %d"
                        % (lane_take[li], lane_start[li]))

    # assemble per-take stacked windows incl. the margin of past frames
    # (estimation-result frames under em init, GT under --gt-init)
    traj_pred_dict, traj_orig_dict = {}, {}
    for i in range(n_takes):
        sel = np.where(lane_take == i)[0]
        if len(sel) == 0:           # take filtered out by --expert-ind
            continue
        preds, origs = [], []
        for li in sel:
            s = lane_start[li]
            past = margin_rows[li] if em_init else expert_qpos[i, s - m:s]
            pred = np.vstack([past, qpos_traj[:, li]])
            orig = expert_qpos[i, s - m:s + test_len]
            preds.append(pred)
            origs.append(orig)
        take = takes[i] if i < len(takes) else f"take_{i}"
        traj_pred_dict[take] = np.stack(preds)
        traj_orig_dict[take] = np.stack(origs)
        logger.info("%s %s" % (take, traj_pred_dict[take].shape))

    results = {"traj_pred": traj_pred_dict, "traj_orig": traj_orig_dict}
    meta = {"algo": "ego_forecast", "num_fail": n_fail}
    os.makedirs(cfg.result_dir, exist_ok=True)
    res_path = "%s/iter_%04d_%s%s.p" % (cfg.result_dir, args.iter, args.data,
                                        "_gt" if args.gt_init else "")
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("saved results to %s" % res_path)
    if args.mode == "vis" or args.render:
        # live window rendering in the reference (ego_forecast_eval.py:86-92);
        # interactive viewer here, replay + video when headless
        from ..utils.vis_modes import view_or_render_windows
        view_or_render_windows(results, res_path, logger)
    elif args.mode != "save":
        raise SystemExit("unknown --mode %s (save|vis)" % args.mode)
    return results, meta


if __name__ == "__main__":
    main()
