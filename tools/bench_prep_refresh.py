"""On-chip prep-refresh measurement + kernel equivalence.

For each cadence R (PREP_RS, default "1 2 3 5"):
  * resident-kernel control step at R: pipelined ms at B lanes
  * kernel-vs-split equivalence AT THE SAME R: one 15-substep control step,
    qpos/qvel RMS (the split path's group() implements identical frozen-prep
    semantics, engine.pd_control_step:677-718, so the diff isolates kernel
    numerics, not the cadence)
  * resident R vs resident R=1: qpos RMS after one control step (the isolated
    cadence effect on-chip, f32)

Usage (one TPU process at a time):
  PYTHONPATH=/root/repo python tools/bench_prep_refresh.py
  PREP_RS="1 2 3" BSUB=1024 RUN_SPLIT=0 to override.
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
RS = [int(x) for x in os.environ.get("PREP_RS", "1 2 3 5").split()]
RUN_SPLIT = os.environ.get("RUN_SPLIT", "1") == "1"

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


def make(params):
    @jax.jit
    def f(qp, qv, c):
        return jax.vmap(lambda a, b, cc: E.pd_control_step(
            model, a, b, cc, jkp, jkd, tl, 15, params))(qp, qv, c)
    return f


def timeit_pipelined(f, depth=8):
    ts = []
    for _ in range(TRIALS):
        t0 = time.time()
        qp, qv = qpos, qvel
        for _ in range(depth):
            qp, qv = f(qp, qv, ctrl)
        jax.block_until_ready((qp, qv))
        ts.append((time.time() - t0) / depth)
    return float(np.median(ts)) * 1000


base_q = None
for r in RS:
    resident = E.DEFAULT_CONTACT._replace(substep_resident=True,
                                          prep_refresh=r)
    f_res = make(resident)
    t0 = time.time()
    qr, vr = jax.block_until_ready(f_res(qpos, qvel, ctrl))
    compile_s = time.time() - t0
    row = {"prep_refresh": r, "B": B,
           "resident_pipelined_ms": round(timeit_pipelined(f_res), 2),
           "compile_s": round(compile_s, 1)}
    if base_q is None:
        base_q = np.asarray(qr)
    else:
        row["qpos_rms_vs_r1"] = float(
            np.sqrt(((np.asarray(qr) - base_q) ** 2).mean()))
    if RUN_SPLIT:
        f_split = make(resident._replace(substep_resident=False))
        qs, vs = jax.block_until_ready(f_split(qpos, qvel, ctrl))
        dq = np.asarray(qr) - np.asarray(qs)
        dv = np.asarray(vr) - np.asarray(vs)
        row["kernel_vs_split_qpos_rms"] = float(np.sqrt((dq ** 2).mean()))
        row["kernel_vs_split_qvel_rms"] = float(np.sqrt((dv ** 2).mean()))
    print(json.dumps(row), flush=True)
