"""State-regression training/eval entry point (mirrors
/root/reference/ego_pose/state_reg.py: modes train / test / save_inf, same
checkpoint + results naming)."""
from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def get_traj_from_state_pred(state_pred, init_pos, init_heading, dt, traj_dim):
    """Integrate predicted kinematic states into a qpos trajectory
    (state_reg.py:103-122)."""
    import jax.numpy as jnp
    from ..ops import quat as Q
    from ..ops import math_utils as M

    nv = (traj_dim + 1) // 2
    nq = nv + 1
    pos = np.array(init_pos, dtype=float)
    heading = np.array(init_heading, dtype=float)
    traj_pred = []
    for i in range(state_pred.shape[0]):
        qpos = np.concatenate([pos, state_pred[i, :nq - 2]])
        qvel = state_pred[i, nq - 2:]
        qpos[3:7] = np.asarray(Q.quat_mul(jnp.asarray(heading),
                                          jnp.asarray(qpos[3:7])))
        linv = np.asarray(Q.quat_rotate(jnp.asarray(heading),
                                        jnp.asarray(qvel[:3])))
        angv = np.asarray(Q.quat_rotate(jnp.asarray(qpos[3:7]),
                                        jnp.asarray(qvel[3:6])))
        pos = pos + linv[:2] * dt
        new_q = np.asarray(Q.quat_mul(Q.quat_from_expmap(jnp.asarray(angv * dt)),
                                      jnp.asarray(qpos[3:7])))
        heading = np.asarray(M.get_heading_q(jnp.asarray(new_q)))
        traj_pred.append(qpos)
    return np.vstack(traj_pred)


def prepare_of(of_np, fr_num, dtype, pad_channels=True):
    """2-channel optical flow -> padded 3-channel frames, time-major,
    padded to fr_num frames (mask returned).  fr_num must be the max chunk
    size: the dataset's final take chunk can reach cfg.fr_num + 30 frames
    (statereg_dataset.py:98).

    ``pad_channels=False`` keeps the raw 2 flow channels: the zero third
    channel carries no information, so the product pipeline pads ON DEVICE
    (pad_flow_channels) after the transfer -- one third less host memcpy
    and host->device bandwidth on the (T,224,224) frames."""
    t = of_np.shape[0]
    of = of_np
    if pad_channels:
        of = np.concatenate([of, np.zeros(of.shape[:-1] + (1,),
                                          of.dtype)], axis=-1)
    if t < fr_num:
        pad = np.repeat(of[-1:], fr_num - t, axis=0)
        of = np.concatenate([of, pad], axis=0)
    mask = np.zeros(fr_num, dtype)
    mask[:t] = 1.0
    return of[:, None].astype(dtype), mask  # (T, 1, H, W, 3 or 2)


def pad_flow_channels(of):
    """Device-side half of prepare_of(pad_channels=False): append the zero
    third channel the CNN stems expect.  No-op on already-3-channel input."""
    import jax.numpy as jnp
    if of.shape[-1] == 2:
        of = jnp.concatenate(
            [of, jnp.zeros(of.shape[:-1] + (1,), of.dtype)], axis=-1)
    return of


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--mode", default="train")
    parser.add_argument("--data", default=None)
    parser.add_argument("--test-feat", default=None)
    parser.add_argument("--gpu-index", type=int, default=0)
    parser.add_argument("--iter", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true", default=False)
    parser.add_argument("--max-epoch", type=int, default=None)
    parser.add_argument("--batch-chunks", type=int, default=None,
                        help="chunks per training batch (batch axis of the "
                             "(T,B,...) net input); default cfg.batch_size "
                             "or 4")
    parser.add_argument("--dp-devices", type=int, default=None,
                        help="data-parallel device count: shard the chunk "
                             "batch axis of every training step over an "
                             "N-device mesh (params replicated; SURVEY 2.3 "
                             "statereg DP)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of one post-compile "
                             "training epoch")
    parser.add_argument("--data-on-device", action="store_true",
                        default=False,
                        help="upload the epoch's chunk batches to device "
                             "HBM once and index them there, instead of "
                             "streaming every batch over the host->device "
                             "link each epoch.  The production corpus is "
                             "sub-HBM-sized (a subject's packed flow is a "
                             "few GB vs 16 GB HBM), so on link-bound rigs "
                             "(tunneled dev chips: ~10-20 MB/s measured, "
                             "tools/bench_link.py) this removes the link "
                             "from the steady-state loop entirely.  "
                             "Requires iter_method 'iter' without shuffle "
                             "(fixed batch order across epochs); falls "
                             "back to streaming otherwise")
    parser.add_argument("--transfer-dtype", default="f32",
                        choices=("f16", "f32"),
                        help="dtype for the optical-flow host->device "
                             "transfer (cast back on device); f16 halves "
                             "the ingest bandwidth (2x throughput measured "
                             "at 224x224 on PCIe-less dev hosts) at the "
                             "cost of quantizing the flow input -- opt in "
                             "for ingest-bound runs")
    args = parser.parse_args(argv)
    if args.data is None:
        args.data = args.mode if args.mode in {"train", "test"} else "train"

    import jax
    import jax.numpy as jnp
    import optax
    from ..utils.jax_cache import setup_compilation_cache
    setup_compilation_cache()

    from ..data.dataset import Dataset
    from ..models.video_reg_net import VideoRegNet
    from ..utils.config import StateRegConfig
    from ..utils.log import create_logger, ScalarWriter

    cfg = StateRegConfig(args.cfg, create_dirs=(args.iter == 0))
    np.random.seed(cfg.seed)
    logger = create_logger(os.path.join(cfg.log_dir, "log.txt"))
    tb = ScalarWriter(cfg.tb_dir)
    dtype = np.float32

    dataset = Dataset(cfg.meta_id, args.data, cfg.fr_num, cfg.iter_method,
                      cfg.shuffle, 2 * cfg.fr_margin, cfg.num_sample,
                      synthetic=args.synthetic, seed=cfg.seed)
    state_dim = (dataset.traj_dim - 1) // 2 + 6 if cfg.pose_only \
        else dataset.traj_dim
    no_cnn = (args.mode == "save_inf" or args.test_feat is not None)
    frame_shape = dataset.load_of(0, 0, 1).shape[1:3] + (3,) \
        if not no_cnn else (224, 224, 3)
    net = VideoRegNet(state_dim, cfg.v_hdim, cfg.cnn_fdim, no_cnn=no_cnn,
                      frame_shape=frame_shape, mlp_dim=tuple(cfg.mlp_dim),
                      cnn_type=cfg.cnn_type, v_net_type=cfg.v_net,
                      v_net_param=cfg.v_net_param, causal=cfg.causal)
    key = jax.random.PRNGKey(cfg.seed)
    if no_cnn:
        dummy = jnp.zeros((cfg.fr_num, 1, cfg.cnn_fdim), jnp.float32)
    else:
        dummy = jnp.zeros((2, 1) + frame_shape, jnp.float32)
    variables = net.init(key, dummy, train=False)

    if args.iter > 0:
        from ..models import torch_import as ti
        cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.iter)
        logger.info("loading model from checkpoint: %s" % cp_path)
        model_cp, meta = ti.tolerant_pickle_load(cp_path)
        if args.data != "train":
            dataset.set_mean_std(meta["mean"], meta["std"])
        loaded = model_cp["state_net_dict"]
        if ti.looks_torch_state_dict(loaded):
            # reference-format torch checkpoint (state_reg.py:91-95)
            loaded = ti.cast_floats(
                ti.import_video_reg_net(loaded, cfg.cnn_type, cfg.v_net,
                                        cfg.causal), dtype)
        if no_cnn:  # drop CNN params (reference strict=False load)
            for coll in loaded:
                loaded[coll] = {k: v for k, v in loaded[coll].items()
                                if not k.startswith("cnn")}
            merged = jax.tree_util.tree_map(lambda x: x, variables)
            for coll in loaded:
                if not loaded[coll]:
                    # e.g. batch_stats holds only CNN BN stats -- nothing
                    # left after the filter, and the no_cnn net has no such
                    # collection at all
                    continue
                merged.setdefault(coll, {}).update(loaded[coll])
            variables = merged
        else:
            variables = loaded
    fr_margin = cfg.fr_margin
    chunk_max = cfg.fr_num + 30

    if args.mode == "train":
        tx = optax.adam(cfg.lr)
        opt_state = tx.init(variables["params"])
        # batch chunks on the (T,B,...) batch axis: the reference trains one
        # chunk at a time (state_reg.py:66-76), which starves the MXU; >=4
        # keeps the conv/LSTM batched (SURVEY §7.4.7)
        n_chunks = args.batch_chunks or \
            (cfg.batch_size if cfg.batch_size > 1 else 4)
        mesh = None
        if args.dp_devices is not None:
            from ..parallel.mesh import make_mesh, replicate
            mesh = make_mesh(args.dp_devices)
            if n_chunks % args.dp_devices != 0:
                raise SystemExit(
                    f"--batch-chunks {n_chunks} not divisible by "
                    f"--dp-devices {args.dp_devices}")
            variables = replicate(mesh, variables)
            opt_state = replicate(mesh, opt_state)
            logger.info("data-parallel mesh over %d devices (chunk axis "
                        "sharded)" % args.dp_devices)
        logger.info("training with %d chunks per batch" % n_chunks)
        drop_key = jax.random.PRNGKey(cfg.seed + 1)

        @jax.jit
        def train_step(variables, opt_state, of, gt, mask, step):
            """One step over a (T, B, ...) batch of B chunks.  The mask is
            (T', B) so variable-length tail chunks and zero-padded batch
            slots contribute nothing to the loss.  ``of`` may arrive as
            float16 (halves the host->device transfer, which dominates at
            224x224 on tunneled dev chips) and 2-channel (the zero third
            channel is appended here, not shipped); cast/pad on device."""
            of = pad_flow_channels(of.astype(dtype))
            def loss_fn(params):
                vs = {**variables, "params": params}
                pred, updates = net.apply(
                    vs, of, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(drop_key, step)})
                pred = pred[fr_margin:-fr_margin]
                err = ((gt - pred) ** 2 * mask[..., None]).sum(-1)
                return err.sum() / jnp.maximum(mask.sum(), 1.0), updates
            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            upd, opt_state = tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], upd)
            new_vars = {**variables, "params": params, **updates}
            return new_vars, opt_state, loss

        gt_len = chunk_max - 2 * fr_margin

        def host_batches():
            """Stack n_chunks dataset chunks on the batch axis; zero-mask
            padding keeps shapes static (one compile).  Runs on a prefetch
            thread so host I/O overlaps device compute."""
            buf = []
            for of_np, traj_np, _ in dataset:
                num = traj_np.shape[0] - 2 * fr_margin
                if num <= 0:
                    continue
                of, _ = prepare_of(of_np, chunk_max, dtype,
                                   pad_channels=False)
                gt = np.zeros((gt_len, state_dim), dtype)
                gt[:num] = traj_np[fr_margin:-fr_margin, :state_dim]
                mask = np.zeros(gt_len, dtype)
                mask[:num] = 1.0
                buf.append((of[:, 0], gt, mask, num))
                if len(buf) == n_chunks:
                    yield buf
                    buf = []
            if buf:
                pad = buf[0]
                buf += [(pad[0], pad[1], np.zeros_like(pad[2]), 0)] \
                    * (n_chunks - len(buf))
                yield buf

        def device_batches():
            import queue
            import threading
            q = queue.Queue(maxsize=2)

            tdtype = np.float16 if args.transfer_dtype == "f16" else dtype
            if mesh is not None:
                # shard the chunk/batch axis (axis 1 of (T,B,...)) across
                # the mesh; params stay replicated and XLA psums the grads
                from ..parallel.mesh import lane_sharding
                put = lambda x: jax.device_put(
                    x, lane_sharding(mesh, x.ndim, axis_index=1))
            else:
                put = jax.device_put

            def worker():
                try:
                    for buf in host_batches():
                        of = put(
                            np.stack([b[0] for b in buf], 1).astype(tdtype))
                        gt = put(np.stack([b[1] for b in buf], 1))
                        mask = put(np.stack([b[2] for b in buf], 1))
                        q.put((of, gt, mask, sum(b[3] for b in buf)))
                finally:
                    q.put(None)

            threading.Thread(target=worker, daemon=True).start()
            while True:
                item = q.get()
                if item is None:
                    return
                yield item

        resident = None
        if args.data_on_device:
            if cfg.shuffle or cfg.iter_method != "iter":
                logger.info("--data-on-device needs iter_method 'iter' "
                            "without shuffle (fixed batch order); falling "
                            "back to streaming")
            else:
                # One-time upload of every chunk batch to HBM; the epoch
                # loop then indexes device arrays and the host->device
                # link drops out of the steady state (it is the binding
                # constraint on tunneled dev rigs: ~10-20 MB/s honest-
                # fenced, tools/bench_link.py).
                tdtype = np.float16 if args.transfer_dtype == "f16" \
                    else dtype
                t_up = time.time()
                resident = []
                up_bytes = 0
                for buf in host_batches():
                    of = np.stack([b[0] for b in buf], 1).astype(tdtype)
                    gt = np.stack([b[1] for b in buf], 1)
                    mask = np.stack([b[2] for b in buf], 1)
                    up_bytes += of.nbytes + gt.nbytes + mask.nbytes
                    resident.append((jax.device_put(of),
                                     jax.device_put(gt),
                                     jax.device_put(mask),
                                     sum(b[3] for b in buf)))
                # fence the upload honestly: device_put is lazy on the
                # tunneled backend (block_until_ready does not cover the
                # bytes); a readback that consumes the last buffer does
                float(resident[-1][0].astype(jnp.float32).sum())
                logger.info(
                    "data-on-device: %d batches (%.0f MB) resident in "
                    "%.1fs" % (len(resident), up_bytes / 1e6,
                               time.time() - t_up))

        max_epoch = args.max_epoch or cfg.num_epoch
        step = 0
        for i_epoch in range(args.iter, max_epoch):
            # second epoch = first past the compile wall (tracing epoch 0
            # would record compilation, not the steady-state pipeline)
            profiling = args.profile_dir and i_epoch == args.iter + 1
            if profiling:
                jax.profiler.start_trace(args.profile_dir)
            t0 = time.time()
            n_sample, losses, counts = 0, [], []
            for of, gt, mask, num in (resident if resident is not None
                                      else device_batches()):
                variables, opt_state, loss = train_step(
                    variables, opt_state, of, gt, mask, step)
                step += 1
                losses.append(loss)  # device array: don't block the pipeline
                counts.append(num)
                n_sample += num
            ep_loss = float(sum(float(l) * c for l, c in
                                zip(losses, counts)) / max(n_sample, 1))
            dt_ep = time.time() - t0
            if profiling:
                jax.profiler.stop_trace()
                logger.info("wrote profiler trace to %s" % args.profile_dir)
            logger.info("epoch {:4d}    time {:.2f}     nsample {}   "
                        "loss {:.4f}   frames/s {:.1f}"
                        .format(i_epoch, dt_ep, n_sample, ep_loss,
                                n_sample / max(dt_ep, 1e-9)))
            tb.scalar("loss", ep_loss, i_epoch)
            tb.scalar("frames_per_sec", n_sample / max(dt_ep, 1e-9), i_epoch)
            if cfg.save_model_interval > 0 and \
                    (i_epoch + 1) % cfg.save_model_interval == 0:
                cp_path = "%s/iter_%04d.p" % (cfg.model_dir, i_epoch + 1)
                model_cp = {"state_net_dict": jax.device_get(variables)}
                meta = {"mean": dataset.mean, "std": dataset.std}
                pickle.dump((model_cp, meta), open(cp_path, "wb"))
        return variables, dataset

    elif args.mode == "test":
        dataset.iter_method = "iter"
        dataset.shuffle = False

        @jax.jit
        def fwd(variables, of):
            return net.apply(variables, pad_flow_channels(of),
                             train=False)[:, 0]

        n_sample, ep_loss = 0, 0.0
        res_pred, res_orig, meta = {}, {}, {}
        if args.test_feat is None:
            state_pred_arr, traj_orig_arr = [], []
            take = dataset.takes[0]
            dataset.__iter__()
            while True:
                try:
                    of_np, traj_np, traj_orig_np = dataset.__next__()
                except StopIteration:
                    break
                num = traj_np.shape[0] - 2 * fr_margin
                if num <= 0:
                    continue
                of, mask = prepare_of(of_np, chunk_max, dtype,
                                      pad_channels=False)
                pred = np.asarray(fwd(variables, jnp.asarray(of)))
                pred = pred[fr_margin:fr_margin + num]
                gt = traj_np[fr_margin:-fr_margin, :state_dim]
                ep_loss += float(((gt - pred) ** 2).sum(-1).mean()) * num
                n_sample += num
                pred = pred * dataset.std[None, :state_dim] \
                    + dataset.mean[None, :state_dim]
                state_pred_arr.append(pred)
                traj_orig_arr.append(traj_orig_np[fr_margin:-fr_margin])
                if dataset.cur_ind >= len(dataset.takes) or \
                        dataset.takes[dataset.cur_tid] != take:
                    sp = np.vstack(state_pred_arr)
                    to = np.vstack(traj_orig_arr)
                    from ..ops import math_utils as M
                    import jax.numpy as jnp2
                    init_heading = np.asarray(
                        M.get_heading_q(jnp2.asarray(to[0, 3:7])))
                    res_pred[take] = get_traj_from_state_pred(
                        sp, to[0, :2], init_heading, dataset.dt,
                        dataset.traj_dim)
                    res_orig[take] = to
                    state_pred_arr, traj_orig_arr = [], []
                    if dataset.cur_ind < len(dataset.takes):
                        take = dataset.takes[dataset.cur_tid]
            ep_loss /= max(n_sample, 1)
            results = {"traj_pred": res_pred, "traj_orig": res_orig}
            res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                              args.data)
        else:
            cnn_feat_file = "%s/features/cnn_feat_%s.p" % (
                dataset.base_folder, args.test_feat)
            cnn_feat_dict, _ = pickle.load(open(cnn_feat_file, "rb"))
            import jax.numpy as jnp2
            for take, cnn_feat in cnn_feat_dict.items():
                pred = np.asarray(net.apply(
                    variables, jnp2.asarray(cnn_feat)[:, None], train=False))
                pred = pred[cfg.fr_margin:-cfg.fr_margin, 0]
                pred = pred * dataset.std[None, :state_dim] \
                    + dataset.mean[None, :state_dim]
                res_pred[take] = get_traj_from_state_pred(
                    pred, np.zeros(2), np.array([1.0, 0, 0, 0]), dataset.dt,
                    dataset.traj_dim)
                n_sample += pred.shape[0]
            results = {"traj_pred": res_pred}
            res_path = "%s/iter_%04d_%s.p" % (cfg.result_dir, args.iter,
                                              args.test_feat)
        meta.update({"algo": "state_reg", "num_sample": n_sample,
                     "epoch_loss": ep_loss})
        os.makedirs(cfg.result_dir, exist_ok=True)
        pickle.dump((results, meta), open(res_path, "wb"))
        logger.info("nsample {}   loss {:.4f}".format(n_sample, ep_loss))
        logger.info("saved results to %s" % res_path)
        return results

    elif args.mode == "save_inf":
        cp_path = "%s/iter_%04d_inf.p" % (cfg.model_dir, args.iter)
        model_cp = {"state_net_dict": jax.device_get(variables)}
        meta = {"mean": dataset.mean, "std": dataset.std, "cfg_id": cfg.id}
        pickle.dump((model_cp, meta), open(cp_path, "wb"))
        logger.info("saved inference model to %s" % cp_path)


if __name__ == "__main__":
    main()
