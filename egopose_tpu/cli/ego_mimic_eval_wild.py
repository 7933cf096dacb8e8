"""In-the-wild ego-mimic evaluation (mirrors /root/reference/ego_pose/
ego_mimic_eval_wild.py): no ground-truth experts -- the policy rolls out
against precomputed wild CNN features with the value fail-safe re-anchoring
to the state-regression prediction.  Records {traj_pred, vel_pred}."""
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
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float32

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
        from ..models.video_reg_net import VideoRegNet
        model_cp, meta = pickle.load(open(cfg.state_net_model, "rb"))
        sr_mean, sr_std = meta["mean"], meta["std"]
        state_net = VideoRegNet(sr_mean.size, sr_cfg.v_hdim,
                                sr_cfg.cnn_fdim, no_cnn=True,
                                mlp_dim=tuple(sr_cfg.mlp_dim),
                                cnn_type=sr_cfg.cnn_type,
                                v_net_type=sr_cfg.v_net,
                                v_net_param=sr_cfg.v_net_param,
                                causal=sr_cfg.causal)
        state_vars = model_cp["state_net_dict"]
        logger.info("loaded state net from %s" % cfg.state_net_model)

    ts = agent.train_state
    zstat = agent.zstat
    policy_apply, _, value_apply, _ = agent._applies
    m = cfg.fr_margin

    def eval_take(take):
        logger.info("Testing on %s" % take)
        cnn_feat = jnp.asarray(cnn_feat_dict[take], dtype)[None]
        test_len = cnn_feat.shape[1] - 2 * m
        v_out_p = agent.policy_vs_net.apply(ts.policy_vs, cnn_feat)[0]
        v_out_v = agent.value_vs_net.apply(ts.value_vs, cnn_feat)[0]
        if state_net is not None:
            pred = np.asarray(state_net.apply(
                state_vars, cnn_feat.transpose(1, 0, 2), train=False))[m:-m, 0]
            state_pred = pred * sr_std[None] + sr_mean[None]
        else:  # neutral standing prediction
            row = np.zeros(p.nq - 2 + p.nv, np.float32)
            row[0] = 0.9
            row[1] = 1.0
            state_pred = np.tile(row, (test_len, 1))
        state_pred = jnp.asarray(state_pred, dtype)

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

        st = envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                        fix_expert_ind=0, fix_start_ind=m)
        st = reset_to_pred(st, state_pred[0])

        traj_pred, vel_pred = [], []
        vn, vmean, n_reset = 0.0, 0.0, 0
        for t in range(test_len):
            traj_pred.append(np.asarray(st.qpos))
            vel_pred.append(np.asarray(st.qvel))
            obs = envs.observe(p, st)
            zobs = running_norm.apply(zstat, obs, clip=5.0)
            action, _ = policy_apply(ts.policy,
                                     jnp.concatenate([v_out_p[t], zobs]))
            value = float(value_apply(ts.value,
                                      jnp.concatenate([v_out_v[t], zobs])))
            vn += 1
            vmean += (value - vmean) / vn
            st, out = envs.step(model, p, tables, expert, st, action,
                                fix_head_lb=jnp.asarray(-10.0, dtype))
            if value < 0.6 * vmean and t + 1 < test_len:
                n_reset += 1
                st = reset_to_pred(st, state_pred[t + 1])
        logger.info("%s: %d frames, %d resets" % (take, test_len, n_reset))
        return np.vstack(traj_pred), np.vstack(vel_pred)

    traj_pred, vel_pred = {}, {}
    for take in takes:
        traj_pred[take], vel_pred[take] = eval_take(take)
    results = {"traj_pred": traj_pred, "vel_pred": vel_pred}
    meta = {"algo": "ego_mimic"}
    os.makedirs(cfg.result_dir, exist_ok=True)
    res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                      args.test_feat)
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("saved results to %s" % res_path)
    return results


if __name__ == "__main__":
    main()
