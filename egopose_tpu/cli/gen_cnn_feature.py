"""CNN feature extraction CLI (mirrors /root/reference/ego_pose/
data_process/gen_cnn_feature.py): stream optical flow through the trained
statereg CNN -> datasets/features/cnn_feat_<out-id>.p."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta-id", default=None)
    parser.add_argument("--out-id", default=None)
    parser.add_argument("--statereg-cfg", default=None)
    parser.add_argument("--statereg-iter", type=int, default=100)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--synthetic", action="store_true", default=False)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..data.dataset import Dataset
    from ..models.video_reg_net import VideoRegNet
    from ..utils.config import StateRegConfig

    cfg = StateRegConfig(args.statereg_cfg, create_dirs=False)
    dataset = Dataset(args.meta_id, "all", 0, "iter", False, 0,
                      synthetic=args.synthetic)
    cp_path = "%s/iter_%04d.p" % (cfg.model_dir, args.statereg_iter)
    model_cp, meta = pickle.load(open(cp_path, "rb"))
    frame_shape = dataset.load_of(0, 0, 1).shape[1:3] + (3,)
    state_dim = (dataset.traj_dim - 1) // 2 + 6 if cfg.pose_only \
        else dataset.traj_dim
    net = VideoRegNet(state_dim, cfg.v_hdim, cfg.cnn_fdim, no_cnn=False,
                      frame_shape=frame_shape, mlp_dim=tuple(cfg.mlp_dim),
                      cnn_type=cfg.cnn_type, v_net_type=cfg.v_net,
                      v_net_param=cfg.v_net_param, causal=cfg.causal)
    variables = model_cp["state_net_dict"]

    @jax.jit
    def extract(frames):
        return net.apply(variables, frames, train=False,
                         method=net.cnn_feature)

    cnn_feat_dict = {}
    for ti, take in enumerate(dataset.takes):
        im_offset, lb, ub = dataset.msync[take]
        feats = []
        for s in range(lb, ub, args.batch):
            e = min(s + args.batch, ub)
            of = dataset.load_of(ti, s + im_offset, e + im_offset)
            of = np.concatenate([of, np.zeros(of.shape[:-1] + (1,),
                                              of.dtype)], -1)
            pad = args.batch - of.shape[0]
            if pad:
                of = np.concatenate([of, np.repeat(of[-1:], pad, 0)])
            f = np.asarray(extract(jnp.asarray(of, jnp.float32)))
            feats.append(f[:e - s])
        cnn_feat_dict[take] = np.vstack(feats)
        print(take, cnn_feat_dict[take].shape)

    os.makedirs("datasets/features", exist_ok=True)
    path = "datasets/features/cnn_feat_%s.p" % args.out_id
    pickle.dump((cnn_feat_dict, meta.get("mean")), open(path, "wb"))
    print("saved", path)


if __name__ == "__main__":
    main()
