"""Sweep (max_contacts k, max_pair_contacts kp) against the MuJoCo C goldens.

Motivation: the resident kernel's contact block has c = 3k + kp rows; every
per-dof op in the solve chain works on (c, L) tiles whose sublane dim pads to
a multiple of 8.  The shipped (k=8, kp=4) gives c=28 -> pads to 32 (4 tiles),
while (7,3) or (6,6) give c=24 (3 tiles exactly) -- a ~25% saving on the
solve chain IF accuracy holds.  This tool reruns the four golden scenarios
(tests/test_physics_golden.py) at each config on the split path (CPU, f64)
and reports qpos RMS vs MuJoCo C, plus how often two of the global top-kp
deepest pairs fall in the same static selection block (the error mode of
blocked two-stage selection).

Usage:  JAX_PLATFORMS=cpu python tools/sweep_contact_params.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import os
os.chdir("/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import mujoco
import yaml
from scipy.linalg import cho_factor, cho_solve

from egopose_tpu.physics import parse_mjcf, export_mjcf, build_model, engine

XML = "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml"
spec = parse_mjcf(XML)
model = build_model(spec, dtype=jnp.float64)
mj = mujoco.MjModel.from_xml_string(export_mjcf(spec))

cfg = yaml.safe_load(open("/root/reference/config/egomimic/subject_03.yml"))
jp = list(zip(*cfg["joint_params"]))
jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
tl = np.array(jp[5], dtype=float)
jn = {n: i for i, n in enumerate(spec.jnt_names)}


def mj_rollout(qpos0, ctrl, n_steps):
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0
    for _ in range(n_steps):
        for _ in range(15):
            mujoco.mj_forward(mj, d)
            mfull = np.zeros((mj.nv, mj.nv))
            mujoco.mj_fullM(mj, d, mfull)
            kp_ = np.zeros(mj.nv)
            kd_ = np.zeros(mj.nv)
            kp_[6:] = jkp
            kd_[6:] = jkd
            e = np.concatenate([np.zeros(6), d.qpos[7:] - ctrl])
            ed = d.qvel.copy()
            qacc = cho_solve(
                cho_factor(mfull + np.diag(kd_) * mj.opt.timestep),
                -d.qfrc_bias - kp_ * e - kd_ * ed)
            tq = -jkp * e[6:] - jkd * (ed + qacc * mj.opt.timestep)[6:]
            d.ctrl[:] = np.clip(tq, -tl, tl)
            mujoco.mj_step(mj, d)
    return d


def our_rollout(qpos0, ctrl, n_steps, k, kp):
    params = engine.DEFAULT_CONTACT._replace(
        substep_resident=False, max_contacts=k, max_pair_contacts=kp)
    step = jax.jit(lambda a, b: engine.pd_control_step(
        model, a, b, jnp.array(ctrl), jnp.array(jkp), jnp.array(jkd),
        jnp.array(tl), 15, params))
    q, v = jnp.array(qpos0), jnp.zeros(model.ndof)
    traj = []
    for _ in range(n_steps):
        q, v = step(q, v)
        traj.append(np.asarray(q))
    return np.asarray(q), np.asarray(v), traj


def block_collision_rate(traj, kp):
    """Fraction of control steps where >=2 of the global top-kp deepest
    ACTIVE pairs (phi > -margin) fall in the same static selection block --
    the states where blocked per-block-top-1 selection would differ."""
    # block id per pair row (seg-seg then seg-box, matching phi layout)
    bid = np.empty(model.npair + model.nbpair, dtype=int)
    nb = 0
    for s, e in model.pair_blocks:
        bid[s:e] = nb
        nb += 1
    for s, e in model.bpair_blocks:
        bid[model.npair + s:model.npair + e] = nb
        nb += 1
    margin = float(engine.DEFAULT_CONTACT.margin)
    phis = np.asarray(jax.jit(jax.vmap(
        lambda q: engine.pair_candidates(model, engine.fk(model, q))[0]))(
        jnp.asarray(np.stack(traj))))
    hits = 0
    for phi in phis:
        top = np.argsort(phi)[::-1][:kp]
        top = top[phi[top] > -margin]
        if len(set(bid[top].tolist())) < len(top):
            hits += 1
    return hits / max(len(traj), 1)


def scen_standing():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    return qpos0, np.zeros(spec.nu), 45


def scen_prone():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.35
    qpos0[3] = np.cos(np.pi / 4)
    qpos0[5] = np.sin(np.pi / 4)
    return qpos0, np.zeros(spec.nu), 90


def scen_arms_folded():
    ctrl = np.zeros(spec.nu)
    for k_, v_ in {"RightArm_z": -1.05, "LeftArm_z": 1.05,
                   "RightForeArm_z": 2.9, "LeftForeArm_z": -2.9}.items():
        ctrl[jn[k_]] = v_
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    return qpos0, ctrl, 45


def scen_crossed_thighs():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    qpos0[7 + jn["RightUpLeg_x"]] = -0.5
    qpos0[7 + jn["RightUpLeg_y"]] = -0.45
    qpos0[7 + jn["LeftUpLeg_y"]] = 0.45
    return qpos0, qpos0[7:].copy(), 30


SCENARIOS = {
    "standing": scen_standing,
    "prone": scen_prone,
    "arms_folded": scen_arms_folded,
    "crossed_thighs": scen_crossed_thighs,
}

CONFIGS = [tuple(int(x) for x in c.split(","))
           for c in os.environ.get("SWEEP_CONFIGS",
                                   "8,4 7,3 6,6 6,4").split()]

mj_final = {}
_MJ_CACHE = "/tmp/sweep_mj_cache.npz"
if os.path.exists(_MJ_CACHE):
    mj_final = dict(np.load(_MJ_CACHE))
for name, fn in SCENARIOS.items():
    if name not in mj_final:
        qpos0, ctrl, n = fn()
        mj_final[name] = mj_rollout(qpos0, ctrl, n).qpos.copy()
        np.savez(_MJ_CACHE, **mj_final)
    print(json.dumps({"scenario": name, "mj_root_z":
                      round(float(mj_final[name][2]), 4)}), flush=True)

for k, kp in CONFIGS:
    row = {"k": k, "kp": kp, "c": 3 * k + kp}
    for name, fn in SCENARIOS.items():
        qpos0, ctrl, n = fn()
        q, v, traj = our_rollout(qpos0, ctrl, n, k, kp)
        rms = float(np.sqrt(np.mean((q - mj_final[name]) ** 2)))
        row[name] = round(rms, 5)
        if (k, kp) == CONFIGS[0]:
            row[name + "_blockdup"] = round(
                block_collision_rate(traj, kp), 3)
    print(json.dumps(row), flush=True)
