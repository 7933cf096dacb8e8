"""Expert feature generation CLI (mirrors /root/reference/ego_pose/
data_process/gen_expert.py): kinematic replay of GT trajectories ->
datasets/features/expert_<out-id>.p, with identical field names."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--meta-id", default=None)
    parser.add_argument("--out-id", default=None)
    parser.add_argument("--model-xml",
                        default="assets/mujoco_models/humanoid_1205_v1.xml")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from .. import envs
    from ..physics import parse_mjcf, build_model
    from ..utils.config import EgoMimicConfig
    from ..data.dataset import Dataset

    cfg = EgoMimicConfig(None, create_dirs=False, cfg_dict={
        "meta_id": args.meta_id, "mujoco_model": "humanoid_1205_v1",
        "vis_model": "humanoid_1205_vis", "obs_coord": "heading"})
    spec = parse_mjcf(args.model_xml)
    model = build_model(spec, dtype=jnp.float64)
    tables = envs.make_body_tables(spec)
    from ..utils.config import make_env_params
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)

    dataset = Dataset(args.meta_id, "all", 0, "iter", False, 0)
    expert_dict = {}
    num_sample = 0
    for i, take in enumerate(dataset.takes):
        _, lb, ub = dataset.msync[take]
        qpos = envs.zero_hands(spec, dataset.orig_trajs[i])
        feats = jax.device_get(envs.gen_expert_features(
            model, p, tables, jnp.asarray(qpos), dataset.dt))
        expert = {k: np.asarray(v)[lb:ub] for k, v in feats.items()
                  if k != "len"}
        expert["len"] = ub - lb
        expert["height_lb"] = expert["qpos"][:, 2].min()
        expert["head_height_lb"] = expert["head_pos"][:, 2].min()
        expert_dict[take] = expert
        num_sample += expert["len"]
        print(take, expert["len"], expert["qvel"].min(), expert["qvel"].max(),
              expert["head_height_lb"])

    print("meta: %s, total sample: %d, dataset length: %d"
          % (args.meta_id, num_sample, dataset.len))
    os.makedirs("datasets/features", exist_ok=True)
    path = "datasets/features/expert_%s.p" % args.out_id
    pickle.dump(expert_dict, open(path, "wb"))
    print("saved", path)


if __name__ == "__main__":
    main()
