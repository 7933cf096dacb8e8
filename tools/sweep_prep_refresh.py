"""Sweep the prep-refresh cadence (ContactParams.prep_refresh) against the
MuJoCo C goldens.

Motivation: the substep-resident kernel's dominant stages (LDL factor,
Delassus Y/G assembly, CRBA, pair narrowphase -- ~140k of the 208k element
ops per lane-substep, BASELINE.md roofline) depend only on configuration,
which drifts by ~|v|*2.2ms per 450 Hz substep.  Refreshing them every R-th
substep and solving against the frozen factors/geometry in between skips
those stages on (R-1)/R of the substeps.  MuJoCo C recomputes everything
every substep, so the question is purely numerical: does the R-substep-stale
geometry stay inside the same golden bounds as full recompute?

This tool reruns the golden scenarios (tests/test_physics_golden.py) on the
split path (CPU, f64 -- numerically identical to frozen factorizations,
since all solve inputs are frozen) at each R and reports final-qpos RMS vs
MuJoCo C plus the R=1 self-distance (the isolated cadence effect).

Usage:  JAX_PLATFORMS=cpu python tools/sweep_prep_refresh.py
        SWEEP_R="1 2 3 5" to override the cadences.
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import os
os.chdir("/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# XLA:CPU (LLVM) compile time scales badly with the unrolled substep body
# (same reason tests/conftest.py pins it); cadence groups already unroll
# their substeps, so this only affects the r=1 reference path
os.environ.setdefault("EGOPOSE_SUBSTEP_UNROLL", "1")

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


def mj_rollout(qpos0, ctrl, n_steps, qvel0=None):
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0
    if qvel0 is not None:
        d.qvel[:] = qvel0
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


_STEP_CACHE = {}


def our_rollout(qpos0, ctrl, n_steps, r, qvel0=None):
    if r not in _STEP_CACHE:   # one compile per cadence, ctrl as an arg
        params = engine.DEFAULT_CONTACT._replace(
            substep_resident=False, prep_refresh=r)
        _STEP_CACHE[r] = jax.jit(lambda a, b, c: engine.pd_control_step(
            model, a, b, c, jnp.array(jkp), jnp.array(jkd),
            jnp.array(tl), 15, params))
    step = _STEP_CACHE[r]
    q = jnp.array(qpos0)
    v = jnp.zeros(model.ndof) if qvel0 is None else jnp.array(qvel0)
    c = jnp.array(ctrl)
    for _ in range(n_steps):
        q, v = step(q, v, c)
    return np.asarray(q), np.asarray(v)


def scen_standing():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    return qpos0, np.zeros(spec.nu), 45, None


def scen_prone():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.35
    qpos0[3] = np.cos(np.pi / 4)
    qpos0[5] = np.sin(np.pi / 4)
    return qpos0, np.zeros(spec.nu), 90, None


def scen_arms_folded():
    ctrl = np.zeros(spec.nu)
    for k_, v_ in {"RightArm_z": -1.05, "LeftArm_z": 1.05,
                   "RightForeArm_z": 2.9, "LeftForeArm_z": -2.9}.items():
        ctrl[jn[k_]] = v_
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    return qpos0, ctrl, 45, None


def scen_crossed_thighs():
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    qpos0[7 + jn["RightUpLeg_x"]] = -0.5
    qpos0[7 + jn["RightUpLeg_y"]] = -0.45
    qpos0[7 + jn["LeftUpLeg_y"]] = 0.45
    return qpos0, qpos0[7:].copy(), 30, None


def scen_pushed():
    """Dynamic stress for the cadence: standing start shoved forward at
    1.5 m/s with a 2 rad/s yaw spin -- large velocities make the frozen
    bias (Coriolis) and the frozen contact geometry (feet sliding/catching)
    maximally stale between refreshes."""
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    qvel0 = np.zeros(spec.ndof)
    qvel0[0] = 1.5
    qvel0[5] = 2.0
    return qpos0, np.zeros(spec.nu), 45, qvel0


def scen_landing():
    """Impact stress: drop from 8 cm -- contact activation happens between
    refreshes at R>1, the worst case for frozen candidate selection."""
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.99
    qpos0[3] = 1.0
    return qpos0, np.zeros(spec.nu), 45, None


SCENARIOS = {
    "standing": scen_standing,
    "landing": scen_landing,
    "pushed": scen_pushed,
    "prone": scen_prone,
    "arms_folded": scen_arms_folded,
    "crossed_thighs": scen_crossed_thighs,
}

RS = [int(x) for x in os.environ.get("SWEEP_R", "1 2 3 5").split()]

mj_final = {}
_MJ_CACHE = "/tmp/sweep_prep_mj_cache.npz"
if os.path.exists(_MJ_CACHE):
    mj_final = dict(np.load(_MJ_CACHE))
for name, fn in SCENARIOS.items():
    if name not in mj_final:
        qpos0, ctrl, n, qvel0 = fn()
        mj_final[name] = mj_rollout(qpos0, ctrl, n, qvel0).qpos.copy()
        np.savez(_MJ_CACHE, **mj_final)
    print(json.dumps({"scenario": name, "mj_root_z":
                      round(float(mj_final[name][2]), 4)}), flush=True)

base = {}
for r in RS:
    row = {"prep_refresh": r}
    for name, fn in SCENARIOS.items():
        qpos0, ctrl, n, qvel0 = fn()
        q, v = our_rollout(qpos0, ctrl, n, r, qvel0)
        rms = float(np.sqrt(np.mean((q - mj_final[name]) ** 2)))
        row[name] = round(rms, 5)
        if r == RS[0]:
            base[name] = q
        else:
            row[name + "_vs_r1"] = round(
                float(np.sqrt(np.mean((q - base[name]) ** 2))), 5)
    print(json.dumps(row), flush=True)
