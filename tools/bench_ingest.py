"""Statereg ingest throughput from ramdisk (VERDICT r3 item 7).

The dev rig's tunneled host->device link (~19 MB/s) hides the loader's real
capability; production TPU hosts feed chips over PCIe-class links.  This
tool measures the HOST half of the ingest pipeline -- packed-flow read
(native threaded reader, /dev/shm ramdisk), prepare_of padding, batch
stacking, dtype cast, and a host-memory device_put stand-in (JAX CPU
backend, a memcpy-class transfer) -- in 224x224 frames/s, f32 and f16,
with the production double-buffered prefetch (queue depth 2, same as
cli/state_reg.py device_batches).

Target: loader rate >= the device-resident forward rate (1,165 frames/s,
BASELINE.md), proving ingest saturates the model on PCIe hosts.

Usage: JAX_PLATFORMS=cpu python tools/bench_ingest.py
"""
import json
import os
import queue
import shutil
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from egopose_tpu.data.fastload import PackedFlowReader
from egopose_tpu.cli.state_reg import prepare_of

SHM = "/dev/shm/egopose_ingest_bench"
H = W = 224
N_TAKES = int(os.environ.get("INGEST_TAKES", "6"))
T_TAKE = int(os.environ.get("INGEST_FRAMES", "120"))
FR_NUM = 90          # chunk length (cfg.fr_num production value)
N_CHUNKS = 4         # chunks per batch (cfg.batch_size default)
EPOCHS = int(os.environ.get("INGEST_EPOCHS", "5"))


def make_data():
    os.makedirs(SHM, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = {}
    for i in range(N_TAKES):
        p = os.path.join(SHM, f"take_{i}.npy")
        if not os.path.exists(p):
            np.save(p, rng.randn(T_TAKE, H, W, 2).astype(np.float32))
        paths[f"take_{i}"] = p
    return paths


def chunk_requests():
    reqs = []
    for i in range(N_TAKES):
        for s in range(0, T_TAKE - FR_NUM + 1, FR_NUM):
            reqs.append((f"take_{i}", s, FR_NUM))
    return reqs


def run_pipeline(reader, reqs, tdtype, do_put):
    """One epoch of the double-buffered pipeline: reader -> prepare_of ->
    stack -> cast -> (device_put); returns frames/s."""
    import jax

    q = queue.Queue(maxsize=2)  # two batches in flight, as in state_reg

    def worker():
        buf = []
        for take, s, c in reqs:
            of_np = reader.read_batch([(take, s, c)])[0]
            # production pipeline ships 2 channels; the zero third channel
            # is appended on device (state_reg.pad_flow_channels)
            of, _ = prepare_of(of_np, FR_NUM, np.float32, pad_channels=False)
            buf.append(of[:, 0])
            if len(buf) == N_CHUNKS:
                arr = np.stack(buf, 1).astype(tdtype)
                if do_put:
                    arr = jax.device_put(arr)
                q.put(arr)
                buf = []
        q.put(None)

    t0 = time.time()
    threading.Thread(target=worker, daemon=True).start()
    frames = 0
    while True:
        item = q.get()
        if item is None:
            break
        if do_put:
            item.block_until_ready()
        frames += FR_NUM * N_CHUNKS
    return frames / (time.time() - t0)


def main():
    paths = make_data()
    reader = PackedFlowReader(paths)
    reqs = chunk_requests()
    native = bool(reader.native)

    # raw loader (no pipeline): pure read_batch over all chunks
    for _ in range(2):  # warm page cache
        t0 = time.time()
        reader.read_batch(reqs)
        raw = len(reqs) * FR_NUM / (time.time() - t0)

    results = {"native_loader": native,
               "raw_read_frames_per_sec": round(raw, 1)}
    for tdtype, name in ((np.float32, "f32"), (np.float16, "f16")):
        rates = [run_pipeline(reader, reqs, tdtype, do_put=True)
                 for _ in range(EPOCHS)]
        results[f"pipeline_{name}_frames_per_sec"] = round(
            float(np.median(rates)), 1)
        results[f"pipeline_{name}_trials"] = [round(r, 1) for r in rates]
    print(json.dumps(results))
    if os.environ.get("INGEST_KEEP") != "1":
        shutil.rmtree(SHM, ignore_errors=True)


if __name__ == "__main__":
    main()
