"""Measure the REAL host->device link (VERDICT r4 item 8): device_put of
production-shaped statereg flow batches (fr_num=90 x batch=4 x 2ch x
224x224) to the attached TPU, f32 vs f16, frames/s and MB/s.

BASELINE.md's ingest table measures the HOST half on a CPU-backend
device_put stand-in, where f16 loses (downcast costs more than the memcpy
it saves).  Over a real link the bytes dominate; this tool settles which
dtype is the production configuration ON THIS RIG's tunneled link with a
number instead of a claim.  The transfer is fenced by a device-side
reduction + scalar readback: block_until_ready() does not fence
device_put bytes on this backend (see main()).

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
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    base = rng.randn(FR_NUM, BATCH, 2, H, W).astype(np.float32)
    out = {"device": str(dev), "batch_shape": list(base.shape)}
    # FENCE CAVEAT: on the tunneled axon backend block_until_ready() does
    # NOT wait for the host->device bytes of a device_put -- timing the put
    # alone reports GB/s-class fiction (measured: 1.4 GB/s "put" vs ~10
    # MB/s actual).  The only honest fence is a device computation that
    # consumes the transferred array followed by a scalar readback.
    reduce_sum = jax.jit(lambda x: x.astype(jnp.float32).sum())
    for dt, name in ((np.float32, "f32"), (np.float16, "f16")):
        nbytes = base.astype(dt).nbytes
        # warm: first put pays allocator setup + reduce compile
        float(reduce_sum(jax.device_put(base.astype(dt), dev)))
        rates, mbs = [], []
        for i in range(TRIALS):
            # fresh bytes each trial: the tunnel must actually move them
            arr = (base + np.float32(i + 1)).astype(dt)
            t0 = time.time()
            float(reduce_sum(jax.device_put(arr, dev)))
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
