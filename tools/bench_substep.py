"""Validate + benchmark the substep-resident kernel on the real TPU.

Usage (one TPU process at a time!):
  PYTHONPATH=/root/repo:$PYTHONPATH python /root/repo/tools/bench_substep.py

Prints RMS divergence vs the split path over one 15-substep control step and
median timings for split vs resident at B lanes.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import yaml

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("EGOPOSE_JAX_CACHE", "/root/.jax_cache"))
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from egopose_tpu.physics import build_model, parse_mjcf
from egopose_tpu.physics import engine as E

B = int(os.environ.get("BSUB", "1024"))
TRIALS = int(os.environ.get("TRIALS", "5"))
RUN_SPLIT = os.environ.get("RUN_SPLIT", "1") == "1"  # split at new B costs a
                                                     # ~20 min fresh compile

spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
model = build_model(spec, dtype=jnp.float32)
cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
jp = list(zip(*cfg["joint_params"]))
jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"],
                jnp.float32)
jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"],
                jnp.float32)
tl = jnp.array(np.array(jp[5], dtype=float), jnp.float32)

rng = np.random.RandomState(0)
qpos = np.tile(np.concatenate([[0, 0, 0.85, 1, 0, 0, 0],
                               0.05 * rng.randn(52)]), (B, 1))
qpos = jnp.asarray(qpos + 0.01 * rng.randn(B, 59), jnp.float32)
qvel = jnp.asarray(0.1 * rng.randn(B, 58), jnp.float32)
ctrl = jnp.asarray(0.1 * rng.randn(B, 52), jnp.float32)

split = E.DEFAULT_CONTACT._replace(substep_resident=False)
resident = E.DEFAULT_CONTACT._replace(
    substep_resident=True,
    sparse_ldl=os.environ.get("SPARSE_LDL", "1") == "1")


def make(params):
    @jax.jit
    def f(qp, qv, c):
        return jax.vmap(lambda a, b, cc: E.pd_control_step(
            model, a, b, cc, jkp, jkd, tl, 15, params))(qp, qv, c)
    return f


f_res = make(resident)
t0 = time.time()
qr, vr = jax.block_until_ready(f_res(qpos, qvel, ctrl))
print(f"resident compile+run {time.time()-t0:.1f}s", flush=True)

if RUN_SPLIT:
    f_split = make(split)
    t0 = time.time()
    qs, vs = jax.block_until_ready(f_split(qpos, qvel, ctrl))
    print(f"split compile+run {time.time()-t0:.1f}s", flush=True)
    dq = np.asarray(qr) - np.asarray(qs)
    dv = np.asarray(vr) - np.asarray(vs)
    print(f"qpos rms diff {np.sqrt((dq**2).mean()):.3e}  max {np.abs(dq).max():.3e}")
    print(f"qvel rms diff {np.sqrt((dv**2).mean()):.3e}  max {np.abs(dv).max():.3e}")


def timeit(f):
    ts = []
    for _ in range(TRIALS):
        t0 = time.time()
        jax.block_until_ready(f(qpos, qvel, ctrl))
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1000


def timeit_pipelined(f, depth=8):
    """Issue ``depth`` dependent calls then block once: amortizes the
    tunneled-chip dispatch latency, isolating device compute -- the regime
    the sampling scan runs in (steps issued back-to-back in one dispatch)."""
    ts = []
    for _ in range(TRIALS):
        t0 = time.time()
        qp, qv = qpos, qvel
        for _ in range(depth):
            qp, qv = f(qp, qv, ctrl)
        jax.block_until_ready((qp, qv))
        ts.append((time.time() - t0) / depth)
    return float(np.median(ts)) * 1000


ms_res = timeit(f_res)
out = {"B": B, "resident_ms": round(ms_res, 2),
       "resident_pipelined_ms": round(timeit_pipelined(f_res), 2)}
if RUN_SPLIT:
    ms_split = timeit(f_split)
    out.update(split_ms=round(ms_split, 2),
               split_pipelined_ms=round(timeit_pipelined(f_split), 2),
               speedup=round(ms_split / ms_res, 3))
print(json.dumps(out))
