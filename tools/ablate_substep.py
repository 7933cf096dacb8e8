"""Attribute time inside the substep-resident kernel by stage ablation.

Monkeypatches stages of substep_pallas out of the kernel body at trace time
and times each variant on the real TPU (pipelined, dispatch-latency
amortized).  Stage costs (per control step, B lanes):

  prep  = FK + CRBA + RNEA + limits + contact top-K  ~ full - no_prep
  solve = 2x blocked Cholesky factor + substitutions ~ no_sweep - no_solve
  sweep = Delassus accumulation + projected Jacobi   ~ full - no_sweep

Usage (one TPU process at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python /root/repo/tools/ablate_substep.py
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

resident = E.DEFAULT_CONTACT._replace(
    substep_resident=True,
    sparse_ldl=os.environ.get("SPARSE_LDL", "1") == "1")

_NAMES = {"prep": "_lane_prep_geom", "lfac": "ldl_factor",
          "lsol": "ldl_solve", "ltsol": "ldl_tsolve", "lfsol": "ldl_fsolve",
          "sweep": "_contact_sweep", "sweep_sym": "_sweep_lam_from",
          "delassus": "_delassus_sym"}
_orig = {k: getattr(SP, v) for k, v in _NAMES.items()}


def _stub_prep(st, C, q, v, dtype, compressed=False):
    """Right-shaped constants with a trivial q/v dependency (defeats DCE);
    matches _lane_prep_geom's (mmat, bias, jf, target, mu) contract."""
    nd, k, L = st["nd"], st["k"], q.shape[-1]
    dep = q[0] * 1e-6                                     # (L,)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 1)
    mmat = jnp.where(r_iota == c_iota, 2.0 + dep, 0.0)
    bias = jnp.zeros((nd, L), dtype) + dep
    jf = jnp.zeros((3 * k, nd, L), dtype) + dep
    target = jnp.zeros((3 * k, L), dtype) + dep
    mu = jnp.zeros((k, L), dtype) + 0.5
    return mmat, bias, jf, target, mu


def make_fn():
    @jax.jit
    def f(qp, qv, c):
        return jax.vmap(lambda a, b, cc: E.pd_control_step(
            model, a, b, cc, jkp, jkd, tl, 15, resident))(qp, qv, c)
    return f


def timeit(f):
    jax.block_until_ready(f(qpos, qvel, ctrl))           # compile
    ts = []
    for _ in range(TRIALS):
        t0 = time.time()
        qp, qv = qpos, qvel
        for _ in range(DEPTH):
            qp, qv = f(qp, qv, ctrl)
        jax.block_until_ready((qp, qv))
        ts.append((time.time() - t0) / DEPTH)
    return float(np.median(ts)) * 1000


def run(name, **patches):
    for k_, v_ in patches.items():
        setattr(SP, _NAMES[k_], v_)
    try:
        ms = timeit(make_fn())
    except Exception as exc:  # see run_prep: stub variants can tickle
        # Mosaic compile bugs; skip the variant, keep the run alive
        print(json.dumps({"variant": name, "B": B,
                          "error": str(exc).splitlines()[0][:160]}),
              flush=True)
        ms = float("nan")
    finally:
        for k_ in patches:
            setattr(SP, _NAMES[k_], _orig[k_])
    if ms == ms:
        print(json.dumps({"variant": name, "B": B, "ms": round(ms, 2)}),
              flush=True)
    return ms


def _stub_ldl_factor(mrows, dvals, anc):
    return [1.0 / jnp.maximum(d, 1e-12) for d in dvals]


def _stub_sweep_sym(acc, jf, tgt, mu, v_pred, k_, *a, **kw):
    c_ = acc.shape[0]
    return jnp.zeros((c_, 1, v_pred.shape[-1]), v_pred.dtype) \
        + v_pred[:c_] * 1e-6


def _stub_delassus(x_s, invd, n, c_, *a, **kw):
    L_ = x_s.shape[-1] if hasattr(x_s, "shape") else x_s[...].shape[-1]
    return jnp.zeros((c_, c_, L_), jnp.float32) \
        + x_s[0:1, 0:1, :] * 1e-6 + 2.0


full = run("full")
no_sweep = run("no_sweep",
               sweep=lambda jf, tgt, mu, x_s, v_pred, *a, **kw: v_pred,
               sweep_sym=_stub_sweep_sym)
no_solve = run("no_solve",
               sweep=lambda jf, tgt, mu, x_s, v_pred, *a, **kw: v_pred,
               sweep_sym=_stub_sweep_sym,
               delassus=_stub_delassus,
               lfac=_stub_ldl_factor,
               lsol=lambda mrows, invd, anc, xv: None,
               ltsol=lambda mrows, anc, xv: None,
               lfsol=lambda mrows, invd, anc, xv: None)
# no_prep (_stub_prep) crashes Mosaic: rank-1 -> rank-3 broadcasts inside
# the kernel hit "Check failed: limits[i] <= dim(i)".  The residual
# (no_solve) already bounds prep+limits+integration, so we skip it.

print(json.dumps({
    "B": B,
    "sweep_ms": round(full - no_sweep, 2),
    "solve_ms": round(no_sweep - no_solve, 2),
    "prep_plus_integ_ms": round(no_solve, 2),
    "full_ms": round(full, 2),
}))


# ---- finer-grained prep ablation: stub FK (cheap right-shaped outputs) ----
def _stub_fk(q, topo, dtype):
    nb = len(topo["parent"]) if isinstance(topo, dict) and "parent" in topo \
        else 21
    L = q.shape[-1]
    row3 = q[0:3] * 1e-6                                  # (3,L)
    row4 = jnp.concatenate([1.0 + q[0:1] * 0, q[1:4] * 1e-6], axis=0)
    xpos = jnp.stack([row3] * nb, axis=0)                 # (nb,3,L)
    xquat = jnp.stack([row4] * nb, axis=0)                # (nb,4,L)
    com = jnp.stack([row3] * nb, axis=0)
    srow = jnp.concatenate([q[0:6] * 1e-6], axis=0)       # (6,L)
    s = jnp.stack([srow] * 58, axis=0)                    # (nd,6,L)
    return xpos, xquat, com, s


_orig_fk = SP._fk_compute_lvl
try:
    SP._fk_compute_lvl = _stub_fk
    no_fk = run("no_fk")
finally:
    SP._fk_compute_lvl = _orig_fk
print(json.dumps({"fk_ms": round(full - no_fk, 2)}))


# ---------------------------------------------------------------------------
# analytic op-count + roofline (VERDICT r3 item 3)
# ---------------------------------------------------------------------------
# The kernel is vector-register-pass bound (BASELINE.md round-3 scheduling
# experiments), so the roofline that matters is VPU element-op throughput,
# not MXU FLOPs or HBM bytes (the whole working set is VMEM-resident; HBM
# traffic is one state read + write per control step ~ B*(59+58)*4 bytes,
# thousands of times below the 819 GB/s v5e ceiling).  Element ops below
# count one per lane per array element per arithmetic pass, with sublane
# padding (ceil to 8) applied where Mosaic tiles (c,L)/(n,L) rows.


def _pad8(x):
    return (x + 7) // 8 * 8


def op_estimate():
    from egopose_tpu.physics.ldl_pallas import dof_anc_lists
    st = SP._build_static(model, resident)
    nd, nb = st["nd"], st["nb"]
    k, kp = st["k"], st["kp"]
    c = 3 * k + kp
    PP = st["npair"] + st["nbpair"]
    iters = resident.iters
    anc = dof_anc_lists(model.anc_mask)
    slots = [len(a) for a in anc]                   # compressed row lengths
    S1 = sum(slots)
    S2 = sum(s * s for s in slots)

    ops = {}
    # FK (level-batched): ~8 levels x (4,m) quat chains ~ 40 ops/body + the
    # one-shot 52-dof screw-axis batch (~30 ops/dof on (nd-6,L))
    ops["fk"] = 40 * nb + 30 * (nd - 6)
    # CRBA compressed: 6 f_crb spatial rows/dof + inner products over slots
    ops["crba"] = 36 * nd + 12 * S1
    # RNEA bias: forward vel/acc + backward force, ~60 ops/body + gather
    ops["rnea"] = 60 * nb + 12 * nd
    # 2x sparse LDL factor (PD + dynamics): elimination ~ 2 ops per slot^2
    ops["ldl_factor"] = 2 * 2 * S2
    # substitutions: PD solve (2 cols) + dyn qacc col + tsolve (c cols,
    # padded) + final fsolve col -- each col costs ~2*S1
    ops["ldl_subst"] = 2 * S1 * (2 + 1 + _pad8(c) + 1)
    # Delassus accumulate: sym lower blocks x nd rank-1 FMAs (2 ops each)
    g = [k, k, k] + ([kp] if kp else [])
    area = sum(g[a] * g[b] for a in range(len(g)) for b in range(a + 1))
    ops["delassus"] = 2 * nd * area
    # projected-Jacobi sweep: iters x (acc matvec (c x pad8(c)) + clamps)
    ops["sweep"] = iters * (2 * c * _pad8(c) + 6 * _pad8(c))
    # stable-PD torque + limits + integration, ~20 passes on (nd,L)
    ops["pd_integ"] = 20 * nd
    # pair narrowphase: seg-seg closed form (~30 ops) + box golden search
    # (GOLDEN_EVALS sdist evals x ~18 ops) + select (kp x ~11 over PP)
    from egopose_tpu.physics.model import GOLDEN_EVALS
    ops["pair_narrow"] = 30 * st["npair"] + GOLDEN_EVALS * 18 * st["nbpair"]
    ops["pair_select"] = kp * 11 * PP if kp else 0
    # floor candidate top-K: k passes x ~6 ops over ncp rows
    ops["floor_topk"] = k * 6 * model.ncpoint

    total_per_substep = sum(ops.values())           # element ops per lane
    n_sub = 15
    total = total_per_substep * n_sub * B
    # v5e VPU: 8 sublanes x 128 lanes x 1 op/cycle @ ~0.94 GHz
    vpu_ops_per_s = 8 * 128 * 0.94e9
    t_roof_ms = total / vpu_ops_per_s * 1000
    util = t_roof_ms / full
    # MXU side (mask matmuls, W, pdmp): count real FLOPs for completeness
    mxu_flops = 2 * B * n_sub * (
        (4 * st["npair"] * 4 + 6 * st["nbpair"] * 4) * nb * 3   # W matmul
        + (kp * nd * PP if kp else 0)                           # pdmp
        + 3 * nb * nb * 12)                                     # tree masks
    print(json.dumps({
        "element_ops_per_lane_substep": total_per_substep,
        "breakdown": {k_: v for k_, v in sorted(
            ops.items(), key=lambda kv: -kv[1])},
        "vpu_roofline_ms": round(t_roof_ms, 2),
        "measured_full_ms": round(full, 2),
        "vpu_utilization": round(util, 3),
        "mxu_gflops_per_step": round(mxu_flops / 1e9, 2),
        "note": "utilization ~ fraction of the measured step that pure "
                "VPU element throughput explains; the remainder is "
                "latency/layout/scheduling, not spare compute",
    }))


op_estimate()


# ---- finer prep attribution (round 4): CRBA / RNEA / floor top-K --------
# Each stub returns right-shaped values with a trivial input dependency
# (defeats DCE) while keeping downstream numerics finite.
def _stub_fcrb(st, C, dot, s, s_ang, s_lin, com, io):
    return s * 1e-6                                       # (nd,6,L)


def _stub_crba_assemble(st, C, f_crb, s, compressed, dtype):
    # dep kept rank-2 (1,L): rank-1 sources broadcast into the kernel's
    # tiled rows crash Mosaic's ApplyVectorLayoutPass ("Check failed:
    # limits[i] <= dim(i)"), same class as the _stub_prep note below.
    nd = st["nd"]
    dep = f_crb[0, 0:1] * 1e-6                            # (1,L)
    if compressed:
        from egopose_tpu.physics.ldl_pallas import dof_anc_lists
        anc = dof_anc_lists(model.anc_mask)
        mrows = [None if not len(a)
                 else jnp.zeros((len(a), dep.shape[-1]), dtype) + dep
                 for a in anc]
        dvals = [2.0 + dep for _ in range(nd)]
        return (mrows, dvals)
    L = f_crb.shape[-1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 1)
    return jnp.where(r_iota == c_iota, 2.0 + dep[None], dep[None])


def _stub_rnea(st, C, dot, s, v, com, ic, dtype):
    return v * 1e-6                                       # (nd,L)


def _stub_floor_topk(st, C, dot, xpos, rot, s_ang, s_lin, dtype):
    k, nd = st["k"], st["nd"]
    L = xpos.shape[-1]
    dep = xpos[0, 0] * 1e-6
    jf = jnp.zeros((3 * k, nd, L), dtype) + dep[None, None]
    target = jnp.zeros((3 * k, L), dtype) + dep[None]
    mu = jnp.zeros((k, L), dtype) + 0.5
    return jf, target, mu


_prep_orig = {n: getattr(SP, n) for n in
              ("_crba_fcrb", "_crba_assemble", "_rnea_bias", "_floor_topk")}


def run_prep(name, **patches):
    for n, v_ in patches.items():
        setattr(SP, n, v_)
    try:
        ms = timeit(make_fn())
    except Exception as exc:  # a stub can tickle Mosaic compile bugs;
        # report and keep attributing the other stages (only works when
        # the compile ran in the remote helper -- an in-process Mosaic
        # crash is a SIGABRT and takes the tool with it)
        print(json.dumps({"variant": name, "B": B,
                          "error": str(exc).splitlines()[0][:160]}),
              flush=True)
        ms = None
    finally:
        for n in patches:
            setattr(SP, n, _prep_orig[n])
    if ms is not None:
        print(json.dumps({"variant": name, "B": B, "ms": round(ms, 2)}),
              flush=True)
    return ms


def _delta(base, v):
    return None if v is None else round(base - v, 2)


no_fcrb = run_prep("no_crba_fcrb", _crba_fcrb=_stub_fcrb)
no_casm = run_prep("no_crba_assemble", _crba_assemble=_stub_crba_assemble)
no_crba = run_prep("no_crba_both", _crba_fcrb=_stub_fcrb,
                   _crba_assemble=_stub_crba_assemble)
no_rnea = run_prep("no_rnea", _rnea_bias=_stub_rnea)
no_topk = run_prep("no_floor_topk", _floor_topk=_stub_floor_topk)
print(json.dumps({
    "B": B,
    "crba_fcrb_ms": _delta(full, no_fcrb),
    "crba_assemble_ms": _delta(full, no_casm),
    "crba_total_ms": _delta(full, no_crba),
    "rnea_ms": _delta(full, no_rnea),
    "floor_topk_ms": _delta(full, no_topk),
}))
