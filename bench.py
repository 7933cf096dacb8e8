"""Headline benchmark: PPO sampling throughput (env-steps/sec) on TPU.

Prints ONE JSON line:
  {"metric": "ppo_env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Baseline = the reference's sampling architecture (stable-PD MuJoCo C physics
stepped per-worker on CPU, agents/agent.py:93-105) measured on this host and
scaled to the reference's default 12 worker processes.  The baseline number
is cached in .bench_baseline.json after the first run.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, ".bench_baseline.json")
LANES = int(os.environ.get("BENCH_LANES", "2048"))
SEGMENTS = int(os.environ.get("BENCH_SEGMENTS", "2"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "3"))


def measure_cpu_baseline(seconds=8.0):
    """Reference-equivalent sampling loop: MuJoCo C + stable-PD at 30 Hz."""
    import mujoco
    import yaml
    from scipy.linalg import cho_factor, cho_solve
    from egopose_tpu.physics import parse_mjcf, export_mjcf

    spec = parse_mjcf(os.path.join(HERE, "assets/mujoco_models/humanoid_1205_v1.xml"))
    mj = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    d = mujoco.MjData(mj)
    cfg = yaml.safe_load(open(os.path.join(HERE, "config/egomimic/subject_03.yml")))
    jp = list(zip(*cfg["joint_params"]))
    jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
    jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
    tl = np.array(jp[5], dtype=float)
    d.qpos[2] = 0.91
    d.qpos[3] = 1.0
    kp = np.zeros(mj.nv)
    kd = np.zeros(mj.nv)
    kp[6:] = jkp
    kd[6:] = jkd
    mfull = np.zeros((mj.nv, mj.nv))
    ctrl = np.zeros(spec.nu)
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        for _ in range(15):
            mujoco.mj_forward(mj, d)
            mujoco.mj_fullM(mj, d, mfull)
            e = np.concatenate([np.zeros(6), d.qpos[7:] - ctrl])
            qacc = cho_solve(cho_factor(mfull + np.diag(kd) * mj.opt.timestep),
                             -d.qfrc_bias - kp * e - kd * d.qvel)
            tq = -jkp * e[6:] - jkd * (d.qvel + qacc * mj.opt.timestep)[6:]
            d.ctrl[:] = np.clip(tq, -tl, tl)
            mujoco.mj_step(mj, d)
        n += 1
        if d.qpos[2] < 0.3 or not np.isfinite(d.qpos).all():
            mujoco.mj_resetData(mj, d)
            d.qpos[2] = 0.91
            d.qpos[3] = 1.0
    per_core = n / (time.time() - t0)
    return per_core * 12.0  # reference default: --num-threads 12


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        return json.load(open(BASELINE_CACHE))["cpu12_env_steps_per_sec"]
    v = measure_cpu_baseline()
    json.dump({"cpu12_env_steps_per_sec": v}, open(BASELINE_CACHE, "w"))
    return v


def measure_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EGOPOSE_JAX_CACHE", "/root/.jax_cache"))
    import jax.numpy as jnp
    import yaml
    from egopose_tpu.utils.config import EgoMimicConfig
    from egopose_tpu.rl import AgentEgo
    from egopose_tpu.cli.ego_mimic import build_world

    cfg_dict = yaml.safe_load(open(os.path.join(HERE, "config/egomimic/subject_03.yml")))
    cfg = EgoMimicConfig(cfg_dict=cfg_dict,
                         base_dir=os.path.join(HERE, "results"))
    spec, model, tables, p, expert, cnn_feat = build_world(
        cfg, jnp.float32, synthetic=True)
    fallback = None
    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=LANES, seed=0, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    # warmup / compile.  If the substep-resident Pallas kernel fails to
    # compile on this libtpu (Mosaic lowering moves between releases), fall
    # back to the split path so the benchmark degrades instead of dying.
    try:
        key, sub = jax.random.split(key)
        _ = agent.sample(sub, min_batch_size=1)
    except Exception as e:
        fallback = "substep_resident kernel failed (%s); split path" \
            % type(e).__name__
        print(f"bench: {fallback}", file=sys.stderr)
        p = p._replace(contact=p.contact._replace(substep_resident=False))
        agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                         batch_lanes=LANES, seed=0, dtype=jnp.float32)
        key, sub = jax.random.split(key)
        _ = agent.sample(sub, min_batch_size=1)
    # median of TRIALS timed measurements: the shared tunneled chip shows
    # run-to-run variance (BASELINE.md), so one sample can masquerade as a
    # regression or an improvement across rounds
    samples = []
    for _ in range(TRIALS):
        t0 = time.time()
        total = 0.0
        for _ in range(SEGMENTS):
            key, sub = jax.random.split(key)
            batch, log = agent.sample(sub, min_batch_size=1)
            total += float(np.asarray(batch.valids).sum())
        samples.append(total / (time.time() - t0))

    # end-to-end train loop (sample + PPO update) steady-state: the second
    # metric VERDICT r2 asked to regression-guard mechanically
    agent.update_params(batch)  # compile the update once
    train_samples = []
    for _ in range(TRIALS):
        t0 = time.time()
        key, sub = jax.random.split(key)
        batch, _log = agent.sample(sub, min_batch_size=1)
        agent.update_params(batch)
        steps = float(np.asarray(batch.valids).sum())
        train_samples.append(steps / (time.time() - t0))
    return float(np.median(samples)), samples, \
        float(np.median(train_samples)), train_samples, fallback


def latest_checkpoint_iter(model_dir):
    """Highest iter with a reference-format pickle in ``model_dir`` (0 if
    none): the eval metric should roll the best trained policy present, not
    the untrained one whose rollout is dominated by fail-safe re-anchors
    (VERDICT r4 item 6)."""
    import re
    best = 0
    if os.path.isdir(model_dir):
        for f in os.listdir(model_dir):
            m = re.fullmatch(r"iter_(\d{4})\.p", f)
            if m:
                best = max(best, int(m.group(1)))
    return best


def measure_eval():
    """Third metric (VERDICT r3 item 9): product inference throughput --
    the ego_mimic_eval scan (policy + value fail-safe + physics, lane =
    take) on the synthetic suite, steady-state frames/s after the first
    call warms the compile cache.  Rolls the latest trained checkpoint in
    results/egomimic/subject_03/models when present (untrained fallback),
    and reports which plus its fail-safe reset count so the realism of the
    measured rollout is visible."""
    from egopose_tpu.cli import ego_mimic_eval
    os.chdir(HERE)
    it = latest_checkpoint_iter(
        os.path.join(HERE, "results/egomimic/subject_03/models"))
    rates = []
    meta = {}
    for _ in range(TRIALS + 1):  # first call pays (cached) compile
        _res, meta = ego_mimic_eval.main(
            ["--cfg", "subject_03", "--synthetic", "--iter", str(it)])
        rates.append(meta["frames_per_sec"])
    rates = rates[1:]
    return float(np.median(rates)), rates, it, int(meta.get("num_reset", -1))


def probe_device(timeout_s: float) -> None:
    """Fail fast if the accelerator is unreachable.  The tunneled-TPU plugin
    blocks indefinitely inside jax init while the tunnel is down (observed:
    multi-hour outages); a bounded subprocess probe turns that into a clear
    error instead of hanging the whole benchmark window."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.numpy.zeros(8).block_until_ready(); "
             "print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"bench: device probe timed out after {timeout_s:.0f}s "
              "(accelerator tunnel down?)", file=sys.stderr)
        raise SystemExit(2)
    if r.returncode != 0:
        print(f"bench: device probe failed rc={r.returncode}: "
              f"{r.stderr[-500:]}", file=sys.stderr)
        raise SystemExit(2)


def main():
    probe_device(float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600")))
    tpu, samples, train, train_samples, fallback = measure_tpu()
    ev, ev_rates, ev_iter, ev_resets = measure_eval()
    base = get_baseline()
    out = {
        "metric": "ppo_env_steps_per_sec",
        "value": round(tpu, 1),
        "unit": "steps/s",
        "vs_baseline": round(tpu / base, 3),
        "trials": [round(s, 1) for s in samples],
        "train_loop_steps_per_sec": round(train, 1),
        "train_loop_trials": [round(s, 1) for s in train_samples],
        "eval_frames_per_sec": round(ev, 1),
        "eval_trials": [round(s, 1) for s in ev_rates],
        "eval_checkpoint_iter": ev_iter,
        "eval_num_reset": ev_resets,
    }
    if fallback:
        out["fallback"] = fallback
    print(json.dumps(out))


if __name__ == "__main__":
    main()
