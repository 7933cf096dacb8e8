"""Measure the REAL host->device link (VERDICT r4 item 8): device_put of
production-shaped statereg flow batches (fr_num=90 x batch=4 x 2ch x
224x224) to the attached TPU, f32 vs f16, frames/s and MB/s.

BASELINE.md's ingest table measures the HOST half on a CPU-backend
device_put stand-in, where f16 loses (downcast costs more than the memcpy
it saves).  Over a real link the bytes dominate; this tool settles which
dtype is the production configuration ON THIS RIG's tunneled link with a
number instead of a claim.

Usage: python tools/bench_link.py   (needs the TPU; one process at a time)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

H = W = 224
FR_NUM = int(os.environ.get("LINK_FRNUM", "90"))
BATCH = int(os.environ.get("LINK_BATCH", "4"))
TRIALS = int(os.environ.get("LINK_TRIALS", "3"))


def main():
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    base = rng.randn(FR_NUM, BATCH, 2, H, W).astype(np.float32)
    out = {"device": str(dev), "batch_shape": list(base.shape)}
    for dt, name in ((np.float32, "f32"), (np.float16, "f16")):
        arr = base.astype(dt)
        nbytes = arr.nbytes
        # warm: first put pays allocator setup
        jax.block_until_ready(jax.device_put(arr, dev))
        rates, mbs = [], []
        for _ in range(TRIALS):
            t0 = time.time()
            jax.block_until_ready(jax.device_put(arr, dev))
            dtr = time.time() - t0
            rates.append(FR_NUM * BATCH / dtr)
            mbs.append(nbytes / dtr / 1e6)
        out[name] = {"frames_per_sec": round(float(np.median(rates)), 1),
                     "MB_per_sec": round(float(np.median(mbs)), 1),
                     "trials_fps": [round(r, 1) for r in rates]}
    f32, f16 = out["f32"]["frames_per_sec"], out["f16"]["frames_per_sec"]
    out["f16_speedup"] = round(f16 / f32, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
