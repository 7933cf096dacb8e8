"""Per-commit kernel timing for the BASELINE.md attribution table.

Checks out each optimization commit into a throwaway git worktree and times
the full B=1024 stable-PD control step (15 substeps, resident kernel) on the
real TPU -- the before/after receipts VERDICT r3 item 4 asked for on the
127.4k -> 213.6k env-steps/s jump.  One TPU process at a time (serial).

Usage: python tools/perf_history.py [commit ...]
"""
import json
import os
import subprocess
import sys

REPO = "/root/repo"
COMMITS = sys.argv[1:] or [
    "dc69912",  # compressed CRBA (127.4k bench era)
    "53ec8f2",  # tree recursions as MXU mask matmuls
    "c0296cb",  # forward-only LDL Delassus
    "b333f00",  # contact-point transform as mask matmuls
    "745720e",  # level-batched FK
    "f4dcbf3",  # sweep iterations 25 -> 10
    "7d230e0",  # round-3 final (BENCH_r03 = 213.6k)
    "HEAD",     # current
]

TIMER = r"""
import os, sys, time, json
import numpy as np
import jax, jax.numpy as jnp, yaml
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
wt = sys.argv[1]
sys.path.insert(0, wt); os.chdir(wt)
from egopose_tpu.physics import build_model, parse_mjcf
from egopose_tpu.physics import engine as E
B, TRIALS, DEPTH = 1024, 3, 8
spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
model = build_model(spec, dtype=jnp.float32)
cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
jp = list(zip(*cfg["joint_params"]))
jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"], jnp.float32)
jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"], jnp.float32)
tl = jnp.array(np.array(jp[5], dtype=float), jnp.float32)
rng = np.random.RandomState(0)
qpos = np.tile(np.concatenate([[0,0,0.85,1,0,0,0], 0.05*rng.randn(52)]), (B,1))
qpos = jnp.asarray(qpos + 0.01*rng.randn(B,59), jnp.float32)
qvel = jnp.asarray(0.1*rng.randn(B,58), jnp.float32)
ctrl = jnp.asarray(0.1*rng.randn(B,52), jnp.float32)
f = jax.jit(jax.vmap(lambda a,b,c: E.pd_control_step(
    model, a, b, c, jkp, jkd, tl, 15, E.DEFAULT_CONTACT)))
jax.block_until_ready(f(qpos, qvel, ctrl))
ts = []
for _ in range(TRIALS):
    t0 = time.time()
    qp, qv = qpos, qvel
    for _ in range(DEPTH):
        qp, qv = f(qp, qv, ctrl)
    jax.block_until_ready((qp, qv))
    ts.append((time.time() - t0) / DEPTH)
print(json.dumps({"ms": round(float(np.median(ts)) * 1000, 2),
                  "trials_ms": [round(t*1000, 2) for t in ts]}))
"""


def main():
    os.makedirs("/tmp/perfhist", exist_ok=True)
    with open("/tmp/perfhist/timer.py", "w") as f:
        f.write(TIMER)
    results = []
    for c in COMMITS:
        wt = f"/tmp/perfhist/{c.replace('/', '_')}"
        if c == "HEAD":
            wt = REPO
        elif not os.path.isdir(wt):
            subprocess.run(["git", "-C", REPO, "worktree", "add",
                            "--detach", wt, c], check=True,
                           capture_output=True)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["PYTHONPATH"] = "/root/.axon_site"
        r = subprocess.run([sys.executable, "/tmp/perfhist/timer.py", wt],
                           env=env, capture_output=True, text=True,
                           timeout=1200)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            data = json.loads(line)
        except Exception:
            data = {"error": (r.stderr or r.stdout)[-400:]}
        subj = subprocess.run(["git", "-C", REPO, "log", "-1",
                               "--format=%h %s", c],
                              capture_output=True, text=True).stdout.strip()
        row = {"commit": subj[:72], **data}
        results.append(row)
        print(json.dumps(row), flush=True)
    for c in COMMITS:
        wt = f"/tmp/perfhist/{c.replace('/', '_')}"
        if c != "HEAD" and os.path.isdir(wt):
            subprocess.run(["git", "-C", REPO, "worktree", "remove",
                            "--force", wt], capture_output=True)


if __name__ == "__main__":
    main()
