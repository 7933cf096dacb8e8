"""Ego-forecast PPO training entry point (mirrors
/root/reference/ego_pose/ego_forecast.py): same flags, warm start from an
ego-mimic checkpoint, adaptive init-noise schedule, end-reward flag."""
from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--render", action="store_true", default=False)
    parser.add_argument("--num-threads", type=int, default=12)
    parser.add_argument("--gpu-index", type=int, default=0)
    parser.add_argument("--iter", type=int, default=0)
    parser.add_argument("--show-noise", action="store_true", default=False)
    parser.add_argument("--batch-lanes", type=int, default=1024)
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true", default=False)
    parser.add_argument("--f64", action="store_true", default=False)
    parser.add_argument("--min-batch", type=int, default=None)
    parser.add_argument("--episode-len", type=int, default=None)
    parser.add_argument("--dp-devices", type=int, default=None,
                        help="data-parallel device count: shard rollout "
                             "lanes and update batches over an N-device "
                             "mesh (params replicated)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of one iteration")
    parser.add_argument("--ckpt-format", default="pickle",
                        choices=("pickle", "orbax"),
                        help="checkpoint format: reference-compatible pickle "
                             "or native orbax directory; resume auto-detects")
    parser.add_argument("--kl-target", type=float, default=None,
                        help="PPO trust-region early stop: halt the policy "
                             "epochs once approx KL to the sampling policy "
                             "exceeds this (config key policy_kl_target; "
                             "default off = reference-exact update)")
    args = parser.parse_args(argv)

    import dataclasses
    import jax
    import jax.numpy as jnp
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()
    dtype = jnp.float64 if args.f64 else jnp.float32

    from ..utils.config import EgoForecastConfig, EgoMimicConfig
    from ..utils.log import create_logger, ScalarWriter
    from ..rl.agent_forecast import make_forecast_agent, warmstart_from_mimic
    from .ego_mimic import build_world

    cfg = EgoForecastConfig(args.cfg,
                            create_dirs=not (args.render or args.iter > 0))
    if args.min_batch is not None:
        cfg.min_batch_size = args.min_batch
    if args.kl_target is not None:
        cfg.policy_kl_target = args.kl_target
    if args.episode_len is not None:
        cfg.env_episode_len = args.episode_len
    np.random.seed(cfg.seed)
    logger = create_logger(os.path.join(cfg.log_dir, "log.txt"),
                           file_handle=not args.render)
    tb = ScalarWriter(cfg.tb_dir) if not args.render else None

    spec, model, tables, p, expert, cnn_feat = build_world(
        cfg, dtype, synthetic=args.synthetic)

    mesh = None
    if args.dp_devices is not None:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(args.dp_devices)
        logger.info(f"data-parallel mesh over {args.dp_devices} devices")

    agent = make_forecast_agent(model, spec, p, tables, expert, cnn_feat,
                                cfg, batch_lanes=args.batch_lanes,
                                seed=cfg.seed, dtype=dtype, mesh=mesh)

    if args.iter > 0:
        orbax_path = "%s/iter_%04d.orbax" % (cfg.model_dir, args.iter)
        if os.path.isdir(orbax_path):
            logger.info("loading model from orbax checkpoint: %s" % orbax_path)
            agent.load_orbax(orbax_path)
        else:
            cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
            logger.info("loading model from checkpoint: %s" % cp_path)
            agent.load(cp_path)
    elif cfg.ego_mimic_cfg is not None:
        em_cfg_path = "results/egomimic/%s/models/iter_%04d.p" % (
            cfg.ego_mimic_cfg, cfg.ego_mimic_iter or 0)
        if os.path.exists(em_cfg_path):
            from ..models import torch_import as ti
            logger.info("warm start from ego mimic checkpoint: %s" % em_cfg_path)
            mimic_cp = ti.tolerant_pickle_load(em_cfg_path)
            if ti.looks_torch_state_dict(mimic_cp.get("policy_dict")):
                em_cfg = EgoMimicConfig(cfg.ego_mimic_cfg, create_dirs=False)
                mimic_cp = ti.import_mimic_checkpoint(
                    mimic_cp, bi_dir=not em_cfg.causal,
                    v_net_type=em_cfg.policy_v_net,
                    value_v_net_type=em_cfg.value_v_net)
            agent.train_state = warmstart_from_mimic(agent.train_state,
                                                     mimic_cp)
        else:
            logger.info("no ego mimic checkpoint at %s, cold start" % em_cfg_path)

    key = jax.random.PRNGKey(cfg.seed)
    max_iter = args.max_iter if args.max_iter is not None else cfg.max_iter_num
    base_p = p

    for i_iter in range(args.iter, max_iter):
        cfg.update_adaptive_params(i_iter)
        agent.set_noise_rate(cfg.adp_noise_rate)
        agent.set_policy_lr(cfg.adp_policy_lr)
        if cfg.fix_std:
            agent.fill_log_std(cfg.adp_log_std)
        # adaptive episode init noise (egoforecast_config.py:90-91)
        agent.p = dataclasses.replace(
            base_p, env_init_noise=jnp.asarray(cfg.adp_init_noise,
                                               base_p.env_init_noise.dtype))

        key, sub = jax.random.split(key)
        profiling = args.profile_dir and i_iter == args.iter + 1
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        batch, log = agent.sample(sub, cfg.min_batch_size,
                                  mean_action=args.render and not args.show_noise)
        if cfg.end_reward:
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
            "\tR_range ({:.4f}, {:.4f})\teps_len_avg {:.2f}"
            "\tP_loss {:.4f}\tV_loss {:.4f}{}"
            .format(i_iter, log.sample_time, t_update, log.avg_c_reward,
                    info_str, log.min_c_reward, log.max_c_reward,
                    log.avg_episode_len,
                    metrics.get("policy_loss", float("nan")),
                    metrics.get("value_loss", float("nan")),
                    ("\tgrad_skips %d" % skips if skips else "")
                    + ("\tkl_stop" if metrics.get("kl_stopped") else "")))
        if tb:
            tb.scalar("total_reward", log.avg_c_reward, i_iter)
            tb.scalar("episode_len", log.avg_episode_len, i_iter)

        if cfg.save_model_interval > 0 and \
                (i_iter + 1) % cfg.save_model_interval == 0:
            if args.ckpt_format == "orbax":
                agent.save_orbax("%s/iter_%04d.orbax" % (cfg.model_dir,
                                                         i_iter + 1))
            else:
                agent.save("%s/iter_%04d.p" % (cfg.model_dir, i_iter + 1))

    logger.info("training done!")
    return agent


if __name__ == "__main__":
    main()
