"""In-the-wild ego-mimic evaluation (mirrors /root/reference/ego_pose/
ego_mimic_eval_wild.py): no ground-truth experts -- the policy rolls out
against precomputed wild CNN features with the value fail-safe re-anchoring
to the state-regression prediction.  Records {traj_pred, vel_pred}.

TPU-native design: all wild takes evaluate simultaneously as one vmapped
lax.scan (lane = take, features padded to the longest take), replacing the
reference's sequential per-frame CPU loop (ego_mimic_eval_wild.py:100-150);
the value running-stat and the fail-safe trigger live in the scan carry."""
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
    parser.add_argument("--test-ind", type=int, default=-1)
    parser.add_argument("--show-noise", action="store_true", default=False)
    parser.add_argument("--render", action="store_true", default=False,
                        help="replay the predicted trajectories after the "
                             "batched scan (post-hoc; the reference renders "
                             "live during its sequential rollout)")
    parser.add_argument("--f64", action="store_true", default=False,
                        help="evaluate in float64 (validation parity runs, "
                             "SURVEY 7.4.4); default f32")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float64 if args.f64 else jnp.float32

    from .. import envs
    from ..ops import math_utils as M
    from ..ops import quat as Q
    from ..ops import running_norm
    from ..rl import AgentEgo
    from ..utils.config import EgoMimicConfig, StateRegConfig
    from ..utils.log import create_logger
    from .ego_mimic import build_world
    from .state_reg import get_traj_from_state_pred  # noqa: F401 (API parity)

    cfg = EgoMimicConfig(args.cfg, create_dirs=False)
    logger = create_logger(os.path.join(cfg.log_dir, "log_eval_wild.txt"))

    # wild cnn features
    feat_file = "%s/features/cnn_feat_%s.p" % (cfg.data_dir, args.test_feat)
    cnn = pickle.load(open(feat_file, "rb"))
    cnn_feat_dict = cnn[0] if isinstance(cnn, tuple) else cnn
    takes = list(cnn_feat_dict.keys())
    if args.test_ind >= 0:
        takes = [takes[args.test_ind]]

    spec, model, tables, p, expert, _ = build_world(cfg, dtype,
                                                    synthetic=True)
    agent = AgentEgo(model, spec, p, tables, expert,
                     np.zeros((1, 8, list(cnn_feat_dict.values())[0].shape[-1]),
                              np.float32),
                     cfg, batch_lanes=1, seed=cfg.seed, dtype=dtype)
    cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
    if os.path.exists(cp_path):
        agent.load(cp_path)
        logger.info("loaded policy from %s" % cp_path)

    # statereg inference net for the kinematic fallback predictions
    sr_cfg = StateRegConfig(cfg.state_net_cfg, create_dirs=False) \
        if cfg.state_net_cfg else None
    state_net = state_vars = sr_mean = sr_std = None
    if sr_cfg is not None and os.path.exists(cfg.state_net_model):
        from ..models import torch_import as ti
        from ..models.video_reg_net import VideoRegNet
        model_cp, meta = ti.tolerant_pickle_load(cfg.state_net_model)
        state_vars, sr_mean, sr_std = ti.maybe_import_statereg(
            model_cp, meta, cnn_type=sr_cfg.cnn_type,
            v_net_type=sr_cfg.v_net, causal=sr_cfg.causal, no_cnn=True)
        state_vars = ti.cast_floats(state_vars, dtype)
        state_net = VideoRegNet(sr_mean.size, sr_cfg.v_hdim,
                                sr_cfg.cnn_fdim, no_cnn=True,
                                mlp_dim=tuple(sr_cfg.mlp_dim),
                                cnn_type=sr_cfg.cnn_type,
                                v_net_type=sr_cfg.v_net,
                                v_net_param=sr_cfg.v_net_param,
                                causal=sr_cfg.causal)
        logger.info("loaded state net from %s" % cfg.state_net_model)

    ts = agent.train_state
    zstat = agent.zstat
    policy_apply, _, value_apply, _ = agent._applies
    m = cfg.fr_margin

    # pad all takes to one (B, T, F) batch: lane = take
    feats_list = [np.asarray(cnn_feat_dict[t], np.float32) for t in takes]
    test_lens = np.array([f.shape[0] - 2 * m for f in feats_list])
    if (test_lens <= 0).any():
        raise SystemExit("a wild take is shorter than 2*fr_margin frames")
    n_takes = len(takes)
    t_feat = max(f.shape[0] for f in feats_list)
    t_max = int(test_lens.max())
    fdim = feats_list[0].shape[-1]
    feats_np = np.zeros((n_takes, t_feat, fdim), np.float32)
    for i, f in enumerate(feats_list):
        feats_np[i, :f.shape[0]] = f
        feats_np[i, f.shape[0]:] = f[-1]
    feats = jnp.asarray(feats_np, dtype)

    v_out_p = agent.policy_vs_net.apply(ts.policy_vs, feats)  # (B, T-2m, vh)
    v_out_v = agent.value_vs_net.apply(ts.value_vs, feats)

    if state_net is not None:
        pred = np.asarray(state_net.apply(
            state_vars, feats.transpose(1, 0, 2), train=False))
        # (T, B, S) -> (B, T-m, S): frame index t maps to take frame m+t
        pred = pred.transpose(1, 0, 2)[:, m:]
        state_preds = pred * sr_std[None, None] + sr_mean[None, None]
    else:  # neutral standing prediction
        row = np.zeros(p.nq - 2 + p.nv, np.float32)
        row[0] = 0.9
        row[1] = 1.0
        state_preds = np.tile(row, (n_takes, t_feat - m, 1))
    state_preds = jnp.asarray(state_preds, dtype)

    def reset_to_pred(st, pred_row):
        ref_qpos = st.qpos
        qpos = jnp.concatenate([ref_qpos[:2], pred_row[:p.nq - 2]])
        qvel = pred_row[p.nq - 2:]
        hq = M.get_heading_q(ref_qpos[3:7])
        qpos = qpos.at[3:7].set(Q.quat_mul(hq, qpos[3:7]))
        qvel = qvel.at[:3].set(Q.quat_rotate(hq, qvel[:3]))
        bq = envs.get_body_quat(tables, qpos)
        return st._replace(qpos=qpos, qvel=qvel, prev_qpos=qpos,
                           prev_bquat=bq, bquat=bq)

    take_idx = jnp.arange(n_takes)

    def init_state(i):
        return envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                          fix_expert_ind=0, fix_start_ind=p.fr_margin)

    state0 = jax.vmap(reset_to_pred)(jax.vmap(init_state)(take_idx),
                                     state_preds[:, 0])
    lens_j = jnp.asarray(test_lens)

    def step_fn(carry, t):
        st, vstat_n, vstat_mean, n_reset = carry
        active = t < lens_j
        qpos_rec, qvel_rec = st.qpos, st.qvel
        obs = jax.vmap(lambda s: envs.observe(p, s))(st)
        zobs = running_norm.apply(zstat, obs, clip=5.0)
        pin = jnp.concatenate([v_out_p[:, t], zobs], -1)
        vin = jnp.concatenate([v_out_v[:, t], zobs], -1)
        action, log_std = policy_apply(ts.policy, pin)
        if args.show_noise:  # sampled instead of mean actions
            from ..rl.distributions import diag_gaussian_sample
            action = diag_gaussian_sample(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), t),
                action, log_std)
        value = value_apply(ts.value, vin)
        vstat_n = vstat_n + active
        vstat_mean = vstat_mean + jnp.where(
            active, (value - vstat_mean) / jnp.maximum(vstat_n, 1), 0.0)
        # fix_head_lb=-10: wild takes have no GT head bound, never naive-fail
        new_st, out = jax.vmap(
            lambda s, a: envs.step(model, p, tables, expert, s, a, 0.0,
                                   fix_head_lb=-10.0))(st, action)
        trigger = (value < 0.6 * vstat_mean) & active & (t + 1 < lens_j)
        resetted = jax.vmap(reset_to_pred)(new_st, state_preds[:, t + 1])
        sel = lambda c, a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(
                c.reshape((n_takes,) + (1,) * (x.ndim - 1)), x, y), a, b)
        new_st = sel(trigger, resetted, new_st)
        new_st = sel(active, new_st, st)  # frozen once past the take's end
        n_reset = n_reset + trigger.astype(jnp.int32)
        return (new_st, vstat_n, vstat_mean, n_reset), (qpos_rec, qvel_rec)

    import time as _time
    carry0 = (state0, jnp.zeros(n_takes), jnp.zeros(n_takes),
              jnp.zeros(n_takes, jnp.int32))
    eval_fn = jax.jit(lambda c: jax.lax.scan(step_fn, c, jnp.arange(t_max)))
    t0 = _time.time()
    (_, _, _, n_reset), (qpos_traj, qvel_traj) = \
        jax.block_until_ready(eval_fn(carry0))
    wall = _time.time() - t0
    n_frames = int(test_lens.sum())
    logger.info("wild eval rollout: %d frames over %d takes in %.2fs "
                "(%.0f frames/s incl. compile)"
                % (n_frames, n_takes, wall, n_frames / max(wall, 1e-9)))

    qpos_traj = np.asarray(qpos_traj)  # (T, B, nq)
    qvel_traj = np.asarray(qvel_traj)
    n_reset = np.asarray(n_reset)
    traj_pred, vel_pred = {}, {}
    for i, take in enumerate(takes):
        tl = int(test_lens[i])
        traj_pred[take] = qpos_traj[:tl, i]
        vel_pred[take] = qvel_traj[:tl, i]
        logger.info("%s: %d frames, %d resets" % (take, tl, n_reset[i]))
    results = {"traj_pred": traj_pred, "vel_pred": vel_pred}
    meta = {"algo": "ego_mimic"}
    os.makedirs(cfg.result_dir, exist_ok=True)
    res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                      args.test_feat)
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("saved results to %s" % res_path)
    if args.render:
        from ..utils.vis_modes import view_or_render_windows
        view_or_render_windows(
            {"traj_pred": {t: traj_pred[t][None] for t in traj_pred}},
            res_path, logger)
    return results


if __name__ == "__main__":
    main()
