"""Ego-mimic evaluation (mirrors /root/reference/ego_pose/ego_mimic_eval.py).

The product inference path: roll the trained policy (mean actions) through
each test take, with the value-based fail-safe re-anchoring the sim to the
state-regression prediction when the critic detects failure
(ego_mimic_eval.py:167-172).  TPU-native design: all takes evaluate
simultaneously as one vmapped lax.scan (lane = take), instead of a per-take
python loop.

Results pickle matches the reference: {traj_pred, traj_orig, vel_pred} dicts
keyed by take + meta num_reset, saved to
results/egomimic/<cfg>/results/iter_%04d_<data>[_naivefs].p
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def kinematic_state_pred(expert, take_idx, margin):
    """Fallback statereg prediction = ground-truth kinematic state in the
    statereg layout (de-headed qpos[2:] ++ heading-frame qvel).  Used when no
    trained state net is available; with one, its predictions replace this."""
    import jax.numpy as jnp
    from ..ops import math_utils as M
    qpos = np.asarray(expert.qpos[take_idx])
    qvel_fd = np.asarray(M.get_qvel_fd(jnp.asarray(qpos[:-1]),
                                       jnp.asarray(qpos[1:]), 1 / 30.0,
                                       "heading"))
    qvel_fd = np.vstack([qvel_fd, qvel_fd[-1:]])
    deheaded = np.asarray(M.de_heading(jnp.asarray(qpos[:, 3:7])))
    pos = np.hstack([qpos[:, 2:3], deheaded, qpos[:, 7:]])
    return np.hstack([pos, qvel_fd])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--render", action="store_true", default=False)
    parser.add_argument("--iter", type=int, default=0)
    parser.add_argument("--expert-ind", type=int, default=-1)
    parser.add_argument("--sync", action="store_true", default=False)
    parser.add_argument("--causal", action="store_true", default=False)
    parser.add_argument("--data", default="test")
    parser.add_argument("--show-noise", action="store_true", default=False)
    parser.add_argument("--fail-safe", default="valuefs",
                        choices=["valuefs", "naivefs", "nofs"])
    parser.add_argument("--synthetic", action="store_true", default=False)
    parser.add_argument("--f64", action="store_true", default=False,
                        help="evaluate in float64 (validation parity runs, "
                             "SURVEY 7.4.4); default f32")
    parser.add_argument("--engine", default="jax", choices=["jax", "mujoco"],
                        help="physics backend for the rollout: 'jax' (the "
                             "TPU engine, production path) or 'mujoco' (the "
                             "MuJoCo C oracle on host, closed-loop "
                             "cross-engine parity harness -- identical "
                             "policy/fail-safe/eval logic, reference "
                             "physics; envs/mujoco_oracle.py)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the eval scan "
                             "execution (post-compile)")
    parser.add_argument("--sp-devices", type=int, default=None,
                        help="shard the video-context encode along TIME over "
                             "an N-device mesh (sequence parallelism; TCN "
                             "context nets only -- parallel/seqpar.py); also "
                             "time-shards the statereg prediction forward "
                             "when its temporal net is a TCN")
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
    from ..rl import AgentEgo, rollout
    from ..utils.config import EgoMimicConfig
    from ..utils.log import create_logger
    from .ego_mimic import build_world

    cfg = EgoMimicConfig(args.cfg, create_dirs=False)
    logger = create_logger(os.path.join(cfg.log_dir, "log_eval.txt"))
    np.random.seed(cfg.seed)

    spec, model, tables, p, expert, cnn_feat = build_world(
        cfg, dtype, synthetic=args.synthetic, data=args.data)
    takes = cfg.takes[args.data] if cfg.takes[args.data] else \
        [f"take_{i}" for i in range(expert.qpos.shape[0])]
    if args.expert_ind >= 0:
        # single-take evaluation (reference ego_mimic_eval.py:181-186):
        # slice the lane set down to one expert
        i0 = args.expert_ind
        expert = jax.tree_util.tree_map(lambda x: x[i0:i0 + 1], expert)
        cnn_feat = cnn_feat[i0:i0 + 1]
        takes = [takes[i0] if i0 < len(takes) else f"take_{i0}"]
    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=1, seed=cfg.seed, dtype=dtype)
    cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
    orbax_path = "%s/iter_%04d.orbax" % (cfg.model_dir, args.iter)
    # orbax first: same precedence as training resume (ego_mimic.py), so
    # eval and resume always pick the same checkpoint when both formats exist
    if os.path.isdir(orbax_path):
        logger.info("loading policy net from orbax checkpoint: %s" % orbax_path)
        agent.load_orbax(orbax_path)
    elif os.path.exists(cp_path):
        logger.info("loading policy net from checkpoint: %s" % cp_path)
        agent.load(cp_path)
    else:
        logger.info("no checkpoint at %s -- evaluating untrained policy" % cp_path)

    n_takes = expert.qpos.shape[0]
    m = cfg.fr_margin
    lens = np.asarray(expert.lens)
    test_lens = lens - 2 * m
    t_max = int(test_lens.max())

    # state-regression predictions from the trained inference net
    # (ego_mimic_eval.py:70-78,121-122); falls back to GT kinematics when no
    # statereg checkpoint exists (e.g. synthetic smoke runs)
    state_net = None
    if getattr(cfg, "state_net_cfg", None) and \
            os.path.exists(getattr(cfg, "state_net_model", "")):
        from ..models import torch_import as ti
        from ..models.video_reg_net import VideoRegNet
        from ..utils.config import StateRegConfig
        model_cp, sr_meta = ti.tolerant_pickle_load(cfg.state_net_model)
        sr_cfg = StateRegConfig(cfg.state_net_cfg, create_dirs=False)
        state_vars, sr_mean, sr_std = ti.maybe_import_statereg(
            model_cp, sr_meta, cnn_type=sr_cfg.cnn_type,
            v_net_type=sr_cfg.v_net, causal=sr_cfg.causal, no_cnn=True)
        state_vars = ti.cast_floats(state_vars, dtype)
        state_net = VideoRegNet(sr_mean.size, sr_cfg.v_hdim, sr_cfg.cnn_fdim,
                                no_cnn=True, mlp_dim=tuple(sr_cfg.mlp_dim),
                                cnn_type=sr_cfg.cnn_type,
                                v_net_type=sr_cfg.v_net,
                                v_net_param=sr_cfg.v_net_param,
                                causal=sr_cfg.causal)
        logger.info("loaded state net from %s" % cfg.state_net_model)

    if state_net is not None:
        feats = jnp.asarray(cnn_feat, dtype).transpose(1, 0, 2)  # (T,B,F)
        if args.sp_devices is not None and state_net.v_net_type == "tcn":
            # time-shard the kinematic-prediction forward too (the TCN is
            # the only non-per-frame stage; parallel/seqpar.py)
            from ..parallel.mesh import make_mesh as _mk
            from ..parallel.seqpar import vregnet_apply_sp
            pred = np.asarray(vregnet_apply_sp(
                _mk(args.sp_devices), state_net, state_vars, feats))
        else:
            pred = np.asarray(state_net.apply(state_vars, feats,
                                              train=False))
        pred = pred.transpose(1, 0, 2) * sr_std[None, None] \
            + sr_mean[None, None]
        # align to expert frame indexing (full-take prediction)
        state_preds = jnp.asarray(pred, dtype)
    else:
        state_preds = jnp.asarray(np.stack([
            kinematic_state_pred(expert, i, m) for i in range(n_takes)]),
            dtype)

    # full-take video context (the eval path's fix_cnn_feat semantics:
    # set_fix_sampling with the whole take, ego_mimic_eval.py:115-120).
    # --causal limits the context to fr_margin frames of lookahead per step
    # (online inference, ego_mimic_eval.py:143-145)
    feats = jnp.asarray(cnn_feat, dtype)
    if args.sp_devices is not None:
        # sequence-parallel context encode: time sharded over the mesh with
        # halo exchange, numerically equal to the single-device pass
        # (parallel/seqpar.py; TCN only -- a causal TCN's causal_encode IS
        # its full pass, so --causal composes transparently)
        from ..parallel.mesh import make_mesh
        from ..parallel.seqpar import vsnet_encode_sp
        if args.causal and not agent.policy_vs_net.causal:
            raise SystemExit("--sp-devices with --causal requires a "
                             "causal context net (causal: true)")
        sp_mesh = make_mesh(args.sp_devices)
        v_out_p = vsnet_encode_sp(sp_mesh, agent.policy_vs_net,
                                  agent.train_state.policy_vs, feats)
        v_out_v = vsnet_encode_sp(sp_mesh, agent.value_vs_net,
                                  agent.train_state.value_vs, feats)
    elif args.causal:
        v_out_p = agent.policy_vs_net.apply(
            agent.train_state.policy_vs, feats,
            method=agent.policy_vs_net.causal_encode)
        v_out_v = agent.value_vs_net.apply(
            agent.train_state.value_vs, feats,
            method=agent.value_vs_net.causal_encode)
    else:
        v_out_p = agent.policy_vs_net.apply(agent.train_state.policy_vs,
                                            feats)
        v_out_v = agent.value_vs_net.apply(agent.train_state.value_vs, feats)

    policy_apply, _, value_apply, _ = agent._applies
    ts = agent.train_state
    zstat = agent.zstat

    def reset_to_pred(st, pred_row):
        """reset_env_state (ego_mimic_eval.py:93-99): statereg state +
        align to the current sim xy/heading."""
        ref_qpos = st.qpos
        nq = p.nq
        qpos = jnp.concatenate([ref_qpos[:2], pred_row[:nq - 2]])
        qvel = pred_row[nq - 2:]
        hq = M.get_heading_q(ref_qpos[3:7])
        qpos = qpos.at[3:7].set(Q.quat_mul(hq, qpos[3:7]))
        qvel = qvel.at[:3].set(Q.quat_rotate(hq, qvel[:3]))
        bq = envs.get_body_quat(tables, qpos)
        return st._replace(qpos=qpos, qvel=qvel, prev_qpos=qpos,
                           prev_bquat=bq, bquat=bq)

    take_idx = jnp.arange(n_takes)
    start_idx = jnp.full(n_takes, m, jnp.int32)

    def init_state(i):
        st = envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                        fix_expert_ind=i, fix_start_ind=m)
        return reset_to_pred(st, state_preds[i, m])

    state0 = jax.vmap(init_state)(take_idx)
    fix_head_lb = 0.3 if args.fail_safe == "naivefs" else None

    # sync_expert bookkeeping (humanoid_v1.py:254-262): every
    # sync_exp_interval steps re-anchor the expert's heading/xy to the sim's
    # drifted frame; used to express traj_orig in the sim frame (--sync,
    # ego_mimic_eval.py:136-138)
    sync_interval = int(getattr(cfg, "sync_exp_interval", 100))

    def sync_update(sim_qpos, e_qpos):
        rel_h = Q.quat_mul(M.get_heading_q(sim_qpos[3:7]),
                           Q.quat_inv(M.get_heading_q(e_qpos[3:7])))
        start_p = e_qpos[:3]
        sim_p = jnp.concatenate([sim_qpos[:2], e_qpos[2:3]])
        return rel_h, start_p, sim_p

    def sync_apply(e_qpos, rel_h, start_p, sim_p):
        pos = Q.quat_rotate(rel_h, e_qpos[:3] - start_p) + sim_p
        quat = Q.quat_mul(rel_h, e_qpos[3:7])
        return jnp.concatenate([pos, quat, e_qpos[7:]])

    if args.engine == "mujoco":
        # cross-engine parity harness: the MuJoCo C oracle steps the physics
        # on host while every other piece of the eval (policy, value
        # fail-safe, sync bookkeeping) is the identical code below
        from ..envs.mujoco_oracle import MuJoCoOracle
        oracle = MuJoCoOracle(spec, n_takes, np.asarray(p.jkp),
                              np.asarray(p.jkd), np.asarray(p.torque_lim),
                              frame_skip=int(p.frame_skip))

        def phys_step(st, action):
            ctrl = jax.vmap(lambda a: envs.apply_action(p, a))(action)
            qp, qv = oracle.control_step(st.qpos, st.qvel, ctrl)
            return jax.vmap(lambda s, a, b: envs.finish_step(
                model, p, tables, expert, s, a, b, 0.0,
                fix_head_lb=fix_head_lb))(
                st, jnp.asarray(qp, dtype), jnp.asarray(qv, dtype))
    else:
        def phys_step(st, action):
            return jax.vmap(
                lambda s, a: envs.step(model, p, tables, expert, s, a, 0.0,
                                       fix_head_lb=fix_head_lb))(st, action)

    def step_fn(carry, t):
        st, vstat_n, vstat_mean, n_reset, (rel_h, start_p, sim_p) = carry
        active = t < jnp.asarray(test_lens)

        e_qpos_t = expert.qpos[take_idx, m + t]
        do_sync = (t % sync_interval) == 0
        new_anchor = jax.vmap(sync_update)(st.qpos, e_qpos_t)
        rel_h, start_p, sim_p = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_sync, a, b),
            new_anchor, (rel_h, start_p, sim_p))
        epos_sync = jax.vmap(sync_apply)(e_qpos_t, rel_h, start_p, sim_p)

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
        vstat_mean = vstat_mean + jnp.where(active,
                                            (value - vstat_mean)
                                            / jnp.maximum(vstat_n, 1), 0.0)

        new_st, out = phys_step(st, action)
        if args.fail_safe == "valuefs":
            trigger = value < 0.6 * vstat_mean
        elif args.fail_safe == "naivefs":
            trigger = out.fail
        else:
            trigger = jnp.zeros(n_takes, bool)
        trigger = trigger & active & (t + 1 < jnp.asarray(test_lens))
        pred_next = state_preds[take_idx, m + t + 1]
        resetted = jax.vmap(reset_to_pred)(new_st, pred_next)
        new_st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                trigger.reshape((n_takes,) + (1,) * (a.ndim - 1)), a, b),
            resetted, new_st)
        # frozen once inactive
        new_st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                active.reshape((n_takes,) + (1,) * (a.ndim - 1)), a, b),
            new_st, st)
        n_reset = n_reset + trigger.astype(jnp.int32)
        return (new_st, vstat_n, vstat_mean, n_reset,
                (rel_h, start_p, sim_p)), \
            (qpos_rec, qvel_rec, out.reward, epos_sync)

    anchor0 = (jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (n_takes, 1)),
               jnp.zeros((n_takes, 3), dtype), jnp.zeros((n_takes, 3), dtype))
    carry0 = (state0, jnp.zeros(n_takes), jnp.zeros(n_takes),
              jnp.zeros(n_takes, jnp.int32), anchor0)
    import time as _time
    if args.engine == "mujoco":
        # host loop: the oracle cannot live inside a traced scan.  Eager
        # jax ops + per-step MuJoCo C; semantics identical to the scan.
        t_compile = 0.0
        t0 = _time.time()
        carry, ys = carry0, []
        for t in range(t_max):
            carry, y = step_fn(carry, jnp.asarray(t))
            ys.append(jax.device_get(y))
        (stf, _, _, n_reset, _) = carry
        qpos_traj, qvel_traj, rewards, epos_sync_traj = [
            np.stack([y[j] for y in ys]) for j in range(4)]
        wall = _time.time() - t0
    else:
        eval_fn = jax.jit(lambda c: jax.lax.scan(step_fn, c,
                                                 jnp.arange(t_max)))
        t0 = _time.time()
        compiled = eval_fn.lower(carry0).compile()
        t_compile = _time.time() - t0
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        t0 = _time.time()
        (stf, _, _, n_reset, _), \
            (qpos_traj, qvel_traj, rewards, epos_sync_traj) \
            = jax.block_until_ready(compiled(carry0))
        wall = _time.time() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
            logger.info("wrote profiler trace to %s" % args.profile_dir)
    n_frames = int(test_lens.sum())
    logger.info("eval rollout: %d frames over %d takes -- compile %.2fs "
                "(cached across runs), execute %.2fs = %.0f frames/s "
                "steady-state"
                % (n_frames, n_takes, t_compile, wall,
                   n_frames / max(wall, 1e-9)))

    qpos_traj = np.asarray(qpos_traj)  # (T, B, nq)
    qvel_traj = np.asarray(qvel_traj)
    n_reset = np.asarray(n_reset)

    epos_sync_traj = np.asarray(epos_sync_traj)
    traj_pred, traj_orig, vel_pred, orig_sync = {}, {}, {}, {}
    for i in range(n_takes):
        take = takes[i] if i < len(takes) else f"take_{i}"
        tl = int(test_lens[i])
        traj_pred[take] = qpos_traj[:tl, i]
        vel_pred[take] = qvel_traj[:tl, i]
        traj_orig[take] = np.asarray(expert.qpos[i, m:m + tl])
        orig_sync[take] = epos_sync_traj[:tl, i]
        logger.info("take %s: len %d resets %d avg reward %.4f"
                    % (take, tl, n_reset[i],
                       float(np.asarray(rewards)[:tl, i].mean())))

    results = {"traj_pred": traj_pred, "traj_orig": traj_orig,
               "vel_pred": vel_pred}
    if args.sync:
        # expert re-expressed in the sim's drifted frame (sync_expert +
        # ego_mimic_eval.py:136-138); consumed by the viewer
        results["traj_orig_synced"] = orig_sync
    if args.render:
        from ..utils.render import save_replay
        vis_path = "%s/iter_%04d_%s_replay.npz" % (cfg.result_dir, args.iter,
                                                   args.data)
        save_replay(vis_path, traj_pred,
                    orig_sync if args.sync else traj_orig)
        logger.info("saved replay for the viewer to %s" % vis_path)
    meta = {"algo": "ego_mimic", "num_reset": int(n_reset.sum()),
            "frames_per_sec": n_frames / max(wall, 1e-9),
            "compile_s": t_compile, "engine": args.engine}
    fs_tag = "" if args.fail_safe == "valuefs" else "_" + args.fail_safe
    c_tag = "_causal" if args.causal else ""
    e_tag = "_mj" if args.engine == "mujoco" else ""
    res_path = "%s/iter_%04d_%s%s%s%s.p" % (cfg.result_dir, args.iter,
                                            args.data, fs_tag, c_tag, e_tag)
    os.makedirs(cfg.result_dir, exist_ok=True)
    pickle.dump((results, meta), open(res_path, "wb"))
    logger.info("num reset: %d" % int(n_reset.sum()))
    logger.info("saved results to %s" % res_path)
    return results, meta


if __name__ == "__main__":
    main()
