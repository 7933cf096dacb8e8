"""Ego-mimic (pose estimation) PPO training entry point.

Mirrors /root/reference/ego_pose/ego_mimic.py: same flags, same config
schema, same checkpoint naming (results/egomimic/<cfg>/models/iter_%04d.p),
same per-iteration log line and adaptive-parameter schedule.  When the
EgoPose dataset features are absent (``--synthetic``), trains against
synthetic mocap so the full pipeline can run anywhere.
"""
from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def build_world(cfg, dtype, synthetic=False, synthetic_takes=None,
                synthetic_len=None, model_xml=None, data="train"):
    """Load physics model + experts + cnn features for a config.

    ``data`` selects the take split (cfg.takes[data]) whose experts and CNN
    features are loaded -- trainers pass "train", the eval CLIs their
    ``--data`` flag (matching env.load_experts(takes=cfg.takes[args.data]),
    reference ego_mimic_eval.py:56-59).

    Synthetic world size defaults to 4 takes x 400 frames; overridable with
    EGOPOSE_SYNTHETIC_TAKES / EGOPOSE_SYNTHETIC_LEN (used by subprocess-based
    tests that cannot monkeypatch this function)."""
    if synthetic_takes is None:
        synthetic_takes = int(os.environ.get("EGOPOSE_SYNTHETIC_TAKES", 4))
    if synthetic_len is None:
        synthetic_len = int(os.environ.get("EGOPOSE_SYNTHETIC_LEN", 400))
    import jax.numpy as jnp
    from ..physics import parse_mjcf, build_model
    from .. import envs
    from ..utils.config import make_env_params

    from ..utils.assets import find_model_xml
    from ..utils.config import apply_model_params
    xml = find_model_xml(model_xml or cfg.mujoco_model)
    spec = apply_model_params(parse_mjcf(xml), cfg)
    model = build_model(spec, dtype=dtype)
    tables = envs.make_body_tables(spec)
    # obs dim from config layout
    obs_dim = (1 if cfg.obs_heading else 0) + (spec.nq - 2) \
        + {"root": 6, "full": spec.ndof}.get(cfg.obs_vel, 0) \
        + (1 if cfg.obs_phase else 0)
    p = make_env_params(cfg, spec, obs_dim=obs_dim,
                        dtype=np.float32 if dtype == jnp.float32 else np.float64)

    if not synthetic and cfg.expert_feat_file and os.path.exists(cfg.expert_feat_file):
        expert_dict = pickle.load(open(cfg.expert_feat_file, "rb"))
        experts = [expert_dict[t] for t in cfg.takes[data]]
        expert = envs.stack_experts(experts)
        cnn = pickle.load(open(cfg.cnn_feat_file, "rb"))
        cnn_feat_dict = cnn[0] if isinstance(cnn, tuple) else cnn
        feats = [np.asarray(cnn_feat_dict[t]) for t in cfg.takes[data]]
        tmax = int(expert.qpos.shape[1])
        cnn_feat = np.zeros((len(feats), tmax, feats[0].shape[-1]), np.float32)
        for i, f in enumerate(feats):
            n = min(tmax, f.shape[0])
            cnn_feat[i, :n] = f[:n]
            cnn_feat[i, n:] = f[n - 1]
    else:
        expert = envs.synthetic_experts(model, p, tables, spec,
                                        n_takes=synthetic_takes,
                                        t_len=synthetic_len, seed=cfg.seed)
        rng = np.random.RandomState(cfg.seed)
        # synthetic "CNN features": noisy linear projection of expert obs
        proj = rng.randn(expert.obs.shape[-1], 64).astype(np.float32) / 8
        cnn_feat = np.einsum("etf,fc->etc", np.asarray(expert.obs, np.float32), proj)
        cnn_feat += 0.1 * rng.randn(*cnn_feat.shape).astype(np.float32)
    import jax
    expert = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.float64)
        else x, expert)
    return spec, model, tables, p, expert, np.asarray(cnn_feat)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--render", action="store_true", default=False)
    parser.add_argument("--num-threads", type=int, default=12,
                        help="accepted for CLI parity; lanes come from --batch-lanes")
    parser.add_argument("--gpu-index", type=int, default=0,
                        help="accepted for CLI parity (device is the TPU)")
    parser.add_argument("--iter", type=int, default=0)
    parser.add_argument("--show-noise", action="store_true", default=False)
    parser.add_argument("--batch-lanes", type=int, default=1024)
    parser.add_argument("--dp-devices", type=int, default=None,
                        help="data-parallel device count: shard rollout lanes "
                             "and update batches over an N-device mesh "
                             "(params replicated; errors if fewer devices)")
    parser.add_argument("--sp-devices", type=int, default=None,
                        help="sequence-parallel device count: additionally "
                             "shard the TCN video-context encode along TIME "
                             "(dp x sp 2-D mesh; TCN context nets only)")
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true", default=False)
    parser.add_argument("--f64", action="store_true", default=False)
    parser.add_argument("--min-batch", type=int, default=None,
                        help="override cfg.min_batch_size (debug)")
    parser.add_argument("--episode-len", type=int, default=None,
                        help="override cfg.env_episode_len (debug)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of one iteration")
    parser.add_argument("--ckpt-format", default="pickle",
                        choices=("pickle", "orbax"),
                        help="checkpoint format: reference-compatible pickle "
                             "(iter_%%04d.p) or native orbax directory "
                             "(iter_%%04d.orbax); resume auto-detects")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float64 if args.f64 else jnp.float32

    from ..utils.config import EgoMimicConfig
    from ..utils.log import create_logger, ScalarWriter
    from ..rl import AgentEgo

    cfg = EgoMimicConfig(args.cfg, create_dirs=not (args.render or args.iter > 0))
    if args.min_batch is not None:
        cfg.min_batch_size = args.min_batch
    if args.episode_len is not None:
        cfg.env_episode_len = args.episode_len
    np.random.seed(cfg.seed)
    logger = create_logger(os.path.join(cfg.log_dir, "log.txt"),
                           file_handle=not args.render)
    tb = ScalarWriter(cfg.tb_dir) if not args.render else None

    spec, model, tables, p, expert, cnn_feat = build_world(
        cfg, dtype, synthetic=args.synthetic)
    logger.info(f"devices: {jax.devices()}  lanes: {args.batch_lanes}  "
                f"experts: {expert.qpos.shape}")
    if args.num_threads != parser.get_default("num_threads"):
        logger.info(f"--num-threads {args.num_threads} accepted for reference "
                    f"CLI parity but has no effect here: sampling runs as "
                    f"{args.batch_lanes} batched device lanes, not host "
                    f"threads (use --batch-lanes to scale)")

    mesh = None
    if args.sp_devices is not None:
        from ..parallel.mesh import make_mesh_2d
        mesh = make_mesh_2d(args.dp_devices or 1, args.sp_devices)
        logger.info(f"2-D mesh: {args.dp_devices or 1} data-parallel x "
                    f"{args.sp_devices} sequence-parallel devices")
    elif args.dp_devices is not None:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(args.dp_devices)
        logger.info(f"data-parallel mesh over {args.dp_devices} devices")

    agent_cls = AgentEgo
    if getattr(cfg, "discriminator", None):
        # discriminator: config block -> adversarial VGAIL training
        # (reference ego_pose/core/agent_vgail.py via rl/vgail.AgentVGAIL)
        from ..rl.vgail import AgentVGAIL as agent_cls
        logger.info("discriminator block present: training with VGAIL "
                    "reward shaping (reward_weight=%s)"
                    % dict(cfg.discriminator).get("reward_weight", 1.0))
    agent = agent_cls(model, spec, p, tables, expert, cnn_feat, cfg,
                      batch_lanes=args.batch_lanes, seed=cfg.seed,
                      dtype=dtype, mesh=mesh)
    if args.iter > 0:
        orbax_path = "%s/iter_%04d.orbax" % (cfg.model_dir, args.iter)
        if os.path.isdir(orbax_path):
            logger.info("loading model from orbax checkpoint: %s" % orbax_path)
            agent.load_orbax(orbax_path)
        else:
            cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
            logger.info("loading model from checkpoint: %s" % cp_path)
            agent.load(cp_path)

    key = jax.random.PRNGKey(cfg.seed)

    if args.render:
        # the reference's --render samples and visualizes rollouts instead of
        # training (ego_mimic.py:103-110); headless analogue: one mean-action
        # (or noisy, --show-noise) segment saved as a viewer replay
        batch, log = agent.sample(key, cfg.min_batch_size,
                                  mean_action=not args.show_noise)
        logger.info("render sample: %d steps, R_avg %.4f"
                    % (log.num_steps, log.avg_c_reward))
        out = "%s/render_iter_%04d.npz" % (cfg.result_dir, args.iter)
        os.makedirs(cfg.result_dir, exist_ok=True)
        # states are z-filtered obs; save per-lane reward curves instead
        np.savez_compressed(out,
                            rewards=np.asarray(batch.rewards),
                            actions=np.asarray(batch.actions),
                            expert_ind=np.asarray(batch.expert_ind),
                            start_ind=np.asarray(batch.start_ind))
        logger.info("saved rollout sample to %s" % out)
        return agent

    max_iter = args.max_iter if args.max_iter is not None else cfg.max_iter_num

    for i_iter in range(args.iter, max_iter):
        cfg.update_adaptive_params(i_iter)
        agent.set_noise_rate(cfg.adp_noise_rate)
        agent.set_policy_lr(cfg.adp_policy_lr)
        if cfg.fix_std:
            agent.fill_log_std(cfg.adp_log_std)

        key, sub = jax.random.split(key)
        profiling = args.profile_dir and i_iter == args.iter + 1
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        batch, log = agent.sample(sub, cfg.min_batch_size,
                                  mean_action=args.render and not args.show_noise)
        agent.end_reward = log.avg_c_reward * cfg.gamma / (1 - cfg.gamma)

        t0 = time.time()
        metrics = agent.update_params(batch)
        t_update = time.time() - t0
        if profiling:
            jax.profiler.stop_trace()
            logger.info("wrote profiler trace to %s" % args.profile_dir)

        info_str = np.array2string(log.avg_c_info,
                                   formatter={"all": lambda x: "%.4f" % x},
                                   separator=",")
        skips = metrics.get("policy_grad_skips", 0) \
            + metrics.get("value_grad_skips", 0)
        logger.info(
            "{}\tT_sample {:.2f}\tT_update {:.2f}\tR_avg {:.4f} {}"
            "\tR_range ({:.4f}, {:.4f})\teps_len_avg {:.2f}\tsteps/s {:.0f}{}"
            .format(i_iter, log.sample_time, t_update, log.avg_c_reward,
                    info_str, log.min_c_reward, log.max_c_reward,
                    log.avg_episode_len, log.num_steps / max(log.sample_time, 1e-9),
                    "\tgrad_skips %d" % skips if skips else ""))
        if tb:
            tb.scalar("total_reward", log.avg_c_reward, i_iter)
            tb.scalar("episode_len", log.avg_episode_len, i_iter)
            tb.scalar("env_steps_per_sec", log.num_steps / max(log.sample_time, 1e-9), i_iter)
            for i in range(log.avg_c_info.shape[0]):
                tb.scalar(f"reward_{i}", log.avg_c_info[i], i_iter)

        if cfg.save_model_interval > 0 and (i_iter + 1) % cfg.save_model_interval == 0:
            if args.ckpt_format == "orbax":
                cp_path = "%s/iter_%04d.orbax" % (cfg.model_dir, i_iter + 1)
                agent.save_orbax(cp_path)
            else:
                cp_path = "%s/iter_%04d.p" % (cfg.model_dir, i_iter + 1)
                agent.save(cp_path)
            logger.info("saved checkpoint %s" % cp_path)

    logger.info("training done!")
    return agent


if __name__ == "__main__":
    main()
