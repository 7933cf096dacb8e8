"""Attribute the self-collision pair-contact cost inside the resident kernel.

Monkeypatches substep_pallas._pair_narrowphase / _pair_select with
right-shaped stubs and times each variant on the real TPU:

  select  = top-KP selection + row build         ~ full - narrow_stub? no:
  narrow  = W matmul + seg-seg + seg-box search  ~ full - narrow_stub
  W       = world-coordinate matmul alone        ~ w_stub - all_stub
  select+rows+sweep-width = all_stub - kp0

Usage (one TPU process at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python /root/repo/tools/ablate_pairs.py
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
from egopose_tpu.physics import substep_pallas as SP

B = int(os.environ.get("BSUB", "1024"))
TRIALS = int(os.environ.get("TRIALS", "3"))
DEPTH = 8

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

_orig_narrow = SP._pair_narrowphase
_orig_select = SP._pair_select


def _stub_narrow(st, C, xpos, rot, dot, dtype):
    """Right-shaped trivial outputs with a q-dependency (defeats DCE)."""
    PP = st["npair"] + st["nbpair"]
    L = xpos.shape[-1]
    dep = xpos[0, 0, :] * 1e-6                            # (L,)
    phi = jnp.zeros((PP, L), dtype) + dep - 1.0           # inactive
    n = [jnp.zeros((PP, L), dtype) + dep + (1.0 if i == 2 else 0.0)
         for i in range(3)]
    p = [jnp.zeros((PP, L), dtype) + dep for i in range(3)]
    return phi, n, p


def _w_stub_narrow(st, C, xpos, rot, dot, dtype):
    """Compute the W matmul, then trivial narrowphase from its rows."""
    PP = st["npair"] + st["nbpair"]
    W = [dot(C["prpk"],
             jnp.concatenate([xpos[:, i, :]] + [rot[i][j] for j in range(3)],
                             axis=0)) for i in range(3)]
    phi = W[0][:PP] * 1e-6 - 1.0
    n = [W[i][:PP] * 1e-6 + (1.0 if i == 2 else 0.0) for i in range(3)]
    p = [W[i][:PP] * 1e-6 for i in range(3)]
    return phi, n, p


def _stub_select(st, C, s_lin, s_ang, phi_pair, n_pair, p_pair, dt, dtype):
    kp = st["kp"]
    dep = jnp.max(phi_pair, axis=0, keepdims=True) * 1e-6  # (1,L)
    row = (s_lin[:, 0, :] * dep)[None]                     # (1,nd,L)
    return [row] * kp, [dep] * kp


def make_fn(params):
    @jax.jit
    def f(qp, qv, c):
        return jax.vmap(lambda a, b, cc: E.pd_control_step(
            model, a, b, cc, jkp, jkd, tl, 15, params))(qp, qv, c)
    return f


def timeit(f):
    jax.block_until_ready(f(qpos, qvel, ctrl))            # compile
    ts = []
    for _ in range(TRIALS):
        t0 = time.time()
        qp, qv = qpos, qvel
        for _ in range(DEPTH):
            qp, qv = f(qp, qv, ctrl)
        jax.block_until_ready((qp, qv))
        ts.append((time.time() - t0) / DEPTH)
    return float(np.median(ts)) * 1000


def run(name, params=None, narrow=None, select=None):
    SP._pair_narrowphase = narrow or _orig_narrow
    SP._pair_select = select or _orig_select
    try:
        ms = timeit(make_fn(params or E.DEFAULT_CONTACT))
    finally:
        SP._pair_narrowphase = _orig_narrow
        SP._pair_select = _orig_select
    print(json.dumps({"variant": name, "B": B, "ms": round(ms, 2)}),
          flush=True)
    return ms


full = run("full")
narrow_stub = run("narrow_stub", narrow=_stub_narrow)
w_stub = run("w_stub", narrow=_w_stub_narrow)
select_stub = run("select_stub", select=_stub_select)
kp0 = run("kp0", params=E.DEFAULT_CONTACT._replace(max_pair_contacts=0))

print(json.dumps({
    "B": B,
    "narrowphase_ms": round(full - narrow_stub, 2),
    "w_matmul_ms": round(w_stub - narrow_stub, 2),
    "segseg_plus_box_ms": round(full - w_stub, 2),
    "select_ms": round(full - select_stub, 2),
    "rows_plus_sweepwidth_ms": round(narrow_stub - kp0, 2),
    "pair_total_ms": round(full - kp0, 2),
    "full_ms": round(full, 2),
}))
