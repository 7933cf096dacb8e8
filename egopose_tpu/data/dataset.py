"""State-regression dataset (mirrors /root/reference/ego_pose/utils/
statereg_dataset.py) with a TPU-friendly packed fast path.

The reference reads one optical-flow ``.npy`` per frame
(statereg_dataset.py:151-159) -- a host-I/O hot spot that would starve a TPU.
This loader supports that layout for compatibility AND a packed per-take
``<take>.npy`` memmap (one (T,H,W,2) array) produced by ``pack_optical_flow``;
synthetic mode serves generated data for end-to-end runs without the dataset.
"""
from __future__ import annotations

import os

import numpy as np
import yaml

from ..ops import math_utils as M


def _de_heading_np(q):
    import jax.numpy as jnp
    return np.asarray(M.de_heading(jnp.asarray(q)))


def _qvel_fd_np(a, b, dt, transform):
    import jax.numpy as jnp
    return np.asarray(M.get_qvel_fd(jnp.asarray(a), jnp.asarray(b), dt,
                                    transform))


class Dataset:
    """Iterates (optical_flow, norm_traj, orig_traj) chunks.

    Modes mirror the reference: ``iter`` walks takes sequentially with
    ``overlap`` frames of context overlap; ``sample`` draws random chunks.
    """

    def __init__(self, meta_id, mode, fr_num, iter_method="iter",
                 shuffle=False, overlap=0, num_sample=20000,
                 base_folder="datasets", synthetic=False, seed=0):
        self.meta_id = meta_id
        self.mode = mode
        self.fr_num = fr_num
        self.iter_method = iter_method
        self.shuffle = shuffle
        self.overlap = overlap
        self.num_sample = num_sample
        self.base_folder = base_folder
        self.of_folder = os.path.join(base_folder, "fpv_of")
        self.traj_folder = os.path.join(base_folder, "traj")
        self.synthetic = synthetic
        self._rng = np.random.RandomState(seed)

        if synthetic:
            self._init_synthetic()
        else:
            meta_file = f"{base_folder}/meta/{meta_id}.yml"
            self.meta = yaml.safe_load(open(meta_file))
            self.no_traj = self.meta.get("no_traj", False)
            self.msync = self.meta["video_mocap_sync"]
            self.dt = 1 / self.meta["capture"]["fps"]
            if mode == "all":
                self.takes = self.meta["train"] + self.meta["test"]
            else:
                self.takes = self.meta[mode]
        self.len = int(np.sum([self.msync[x][2] - self.msync[x][1]
                               for x in self.takes]))

        if self.no_traj:
            self.trajs = self.orig_trajs = self.norm_trajs = None
            self.traj_dim = None
        else:
            self.trajs, self.orig_trajs = [], []
            for take in self.takes:
                orig = self._load_traj(take).copy()
                # remove noisy hand pose (statereg_dataset.py:45-46)
                orig[:, 32:35] = 0.0
                orig[:, 42:45] = 0.0
                pos = self.get_traj_pos(orig)
                vel = self.get_traj_vel(orig)
                self.trajs.append(np.hstack([pos, vel]))
                self.orig_trajs.append(orig)
            if mode == "train" or synthetic:
                all_traj = np.vstack(self.trajs)
                self.mean = all_traj.mean(axis=0)
                self.std = all_traj.std(axis=0)
                self.norm_trajs = self.normalize_traj()
            else:
                self.mean = self.std = self.norm_trajs = None
            self.traj_dim = self.trajs[0].shape[1]

        self._packed_reader = None
        self.sample_count = None
        self.take_indices = None
        self.cur_ind = self.cur_tid = self.cur_fr = None
        self.fr_lb = self.fr_ub = self.im_offset = None

    # -- synthetic data -----------------------------------------------------
    def _init_synthetic(self, n_takes=2, t_len=240, nq=59, res=(32, 32)):
        # EGOPOSE_SYN_RES overrides the synthetic flow resolution so the
        # end-to-end pipeline can be exercised at the production 224x224
        # shape (tools + BASELINE.md receipts) without the real dataset
        r = int(os.environ.get("EGOPOSE_SYN_RES", "0"))
        if r:
            res = (r, r)
        n_takes = int(os.environ.get("EGOPOSE_SYN_TAKES", n_takes))
        t_len = int(os.environ.get("EGOPOSE_SYN_LEN", t_len))
        self.meta = None
        self.no_traj = False
        self.dt = 1 / 30.0
        self.takes = [f"synthetic_{i:02d}" for i in range(n_takes)]
        self.msync = {t: (0, 0, t_len) for t in self.takes}
        self._syn_res = res
        self._syn_trajs = {}
        self._syn_of = {}
        for t in self.takes:
            tt = np.arange(t_len) / 30.0
            traj = np.zeros((t_len, nq))
            traj[:, 2] = 0.9
            traj[:, 3] = 1.0
            freqs = self._rng.uniform(0.2, 0.8, nq - 7)
            phases = self._rng.uniform(0, 2 * np.pi, nq - 7)
            traj[:, 7:] = 0.4 * np.sin(2 * np.pi * freqs * tt[:, None] + phases)
            self._syn_trajs[t] = traj
            # synthetic "optical flow": low-dim function of the pose + noise
            if r:
                # overridden-res path (new in round 5): legacy RandomState
                # gaussians cost ~90 s at 224x224x4 takes; SFC64 is ~10x
                # faster and only this benchmark-only path uses it, so the
                # default-res data every test depends on is bit-identical
                import zlib
                fast = np.random.Generator(
                    np.random.SFC64(zlib.crc32(t.encode())))
                w = fast.standard_normal(
                    (nq, res[0] * res[1] * 2), dtype=np.float32) / nq
                noise = 0.05 * fast.standard_normal(
                    (t_len, res[0], res[1], 2), dtype=np.float32)
            else:
                w = self._rng.randn(
                    nq, res[0] * res[1] * 2).astype(np.float32) / nq
                noise = 0.05 * self._rng.randn(
                    t_len, res[0], res[1], 2).astype(np.float32)
            of = (traj @ w).reshape(t_len, res[0], res[1], 2).astype(np.float32)
            of += noise
            self._syn_of[t] = of

    # -- loading ------------------------------------------------------------
    def _load_traj(self, take):
        if self.synthetic:
            return self._syn_trajs[take]
        return np.load(f"{self.traj_folder}/{take}_traj.p", allow_pickle=True)

    def load_of(self, take_ind, start, end):
        take = self.takes[take_ind]
        if self.synthetic:
            return self._syn_of[take][start:end]
        packed = f"{self.of_folder}/{take}.npy"
        if os.path.exists(packed):
            if self._packed_reader is None:
                from .fastload import PackedFlowReader
                avail = {t: f"{self.of_folder}/{t}.npy" for t in self.takes
                         if os.path.exists(f"{self.of_folder}/{t}.npy")}
                self._packed_reader = PackedFlowReader(avail)
            return self._packed_reader.read_batch([(take, start,
                                                    end - start)])[0]
        return np.stack([np.load(f"{self.of_folder}/{take}/{i:05d}.npy")
                         for i in range(start, end)])

    # -- trajectory channels (statereg_dataset.py:111-124) ------------------
    def get_traj_pos(self, orig_traj):
        traj_pos = orig_traj[:, 2:].copy()
        traj_pos[:, 1:5] = _de_heading_np(traj_pos[:, 1:5])
        return traj_pos

    def get_traj_vel(self, orig_traj):
        vel = _qvel_fd_np(orig_traj[:-1], orig_traj[1:], self.dt, "heading")
        return np.vstack([vel, vel[-1:]])

    def set_mean_std(self, mean, std):
        self.mean, self.std = mean, std
        if not self.no_traj:
            self.norm_trajs = self.normalize_traj()

    def normalize_traj(self):
        return [(t - self.mean[None]) / (self.std[None] + 1e-8)
                for t in self.trajs]

    # -- iteration (mirrors statereg_dataset.py:70-109,138-149) -------------
    def __iter__(self):
        if self.iter_method == "sample":
            self.sample_count = 0
        else:
            self.cur_ind = -1
            self.take_indices = np.arange(len(self.takes))
            if self.shuffle:
                self._rng.shuffle(self.take_indices)
            self.__next_take()
        return self

    def __next_take(self):
        self.cur_ind += 1
        if self.cur_ind < len(self.take_indices):
            self.cur_tid = self.take_indices[self.cur_ind]
            self.im_offset, self.fr_lb, self.fr_ub = \
                self.msync[self.takes[self.cur_tid]]
            self.cur_fr = self.fr_lb

    def __next__(self):
        if self.iter_method == "sample":
            if self.sample_count >= self.num_sample:
                raise StopIteration
            self.sample_count += self.fr_num - self.overlap
            return self.sample()
        if self.cur_ind >= len(self.takes):
            raise StopIteration
        fr_start = self.cur_fr
        fr_end = self.cur_fr + self.fr_num \
            if self.cur_fr + self.fr_num + 30 < self.fr_ub else self.fr_ub
        of = self.load_of(self.cur_tid, fr_start + self.im_offset,
                          fr_end + self.im_offset)
        if self.no_traj:
            norm_traj = orig_traj = None
        else:
            norm_traj = self.norm_trajs[self.cur_tid][fr_start:fr_end]
            orig_traj = self.orig_trajs[self.cur_tid][fr_start:fr_end]
        self.cur_fr = fr_end - self.overlap
        if fr_end == self.fr_ub:
            self.__next_take()
        return of, norm_traj, orig_traj

    def sample(self):
        take_ind = self._rng.randint(len(self.takes))
        im_offset, fr_lb, fr_ub = self.msync[self.takes[take_ind]]
        fr_start = self._rng.randint(fr_lb, fr_ub - self.fr_num)
        fr_end = fr_start + self.fr_num
        of = self.load_of(take_ind, fr_start + im_offset, fr_end + im_offset)
        if self.no_traj:
            norm_traj = orig_traj = None
        else:
            norm_traj = self.norm_trajs[take_ind][fr_start:fr_end]
            orig_traj = self.orig_trajs[take_ind][fr_start:fr_end]
        return of, norm_traj, orig_traj


def pack_optical_flow(base_folder, take):
    """Convert per-frame .npy optical flow into one packed memmap-able array
    (the TPU-friendly on-disk layout; removes the per-frame I/O hot spot)."""
    folder = os.path.join(base_folder, "fpv_of", take)
    files = sorted(f for f in os.listdir(folder) if f.endswith(".npy"))
    arrs = [np.load(os.path.join(folder, f)) for f in files]
    out = np.stack(arrs)
    np.save(os.path.join(base_folder, "fpv_of", f"{take}.npy"), out)
    return out.shape
