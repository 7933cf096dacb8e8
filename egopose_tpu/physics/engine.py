"""Batched rigid-body dynamics engine in JAX (world-frame spatial algebra).

This is the TPU-native replacement for the MuJoCo C engine the reference
drives through mujoco_py (/root/reference/envs/common/mujoco_env.py,
/root/reference/ego_pose/envs/humanoid_v1.py:130-174).  Design:

- All functions are pure and operate on a single environment; thousands of
  rollout lanes batch with ``jax.vmap`` (throughput comes from the batch, not
  from per-env parallelism -- the humanoid has only 58 dofs).
- Tree algorithms are *vectorized*, not unrolled: forward kinematics runs as
  a ``lax.scan`` over tree depth with all bodies of a level processed as one
  batch, and CRBA / RNEA / contact-force propagation use precomputed 0/1
  path-and-subtree masks so accumulation over the kinematic tree becomes a
  handful of dense matmuls (MXU-friendly; also keeps the XLA graph small).
- Algorithms: sequential-joint forward kinematics (MuJoCo semantics), CRBA
  for the joint-space inertia matrix, RNEA for bias forces (gravity +
  Coriolis; validated to 1e-8 against mj_fullM / qfrc_bias), penalty floor
  contacts with regularized Coulomb friction, soft joint limits, and
  semi-implicit Euler integration with implicit joint damping (MuJoCo Euler).
- Free-joint conventions match MuJoCo: qvel[0:3] world-frame linear velocity
  of the body frame origin, qvel[3:6] body-local angular velocity; quaternion
  integration via the local-frame exponential map.

Spatial vectors are [omega; v_O] (angular; linear velocity of the body-fixed
point coinciding with the world origin).  Spatial forces are [n_O; f].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import quat as Q
from .linalg_pallas import (make_fused_contact_solve, make_pd_fused_step,
                            spd_solve)
from .model import PhysicsModel, golden_min01
import functools


@functools.lru_cache(maxsize=8)
def _fused_solver(iters: int, relax: float):
    return make_fused_contact_solve(iters, relax)


@functools.lru_cache(maxsize=8)
def _pd_fused(iters: int, relax: float):
    return make_pd_fused_step(iters, relax)

# TPU matmuls default to reduced (bf16) precision for f32 inputs, which is
# fatal for mass-matrix algebra -- pin every contraction in the engine to
# full precision.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class Kin(NamedTuple):
    """World-frame kinematic state of all bodies."""
    xpos: jax.Array    # (nb,3) body frame origins
    xquat: jax.Array   # (nb,4) body frame orientations
    com: jax.Array     # (nb,3) body coms (world)
    s: jax.Array       # (nd,6) joint motion subspaces (world)


class ContactParams(NamedTuple):
    """Contact-solver / joint-limit parameters (see contact_project)."""
    margin: float = 1.0e-3   # activation margin (m)
    beta: float = 0.2        # Baumgarte penetration-recovery factor
    slop: float = 1.0e-4     # penetration allowed without correction (m)
    iters: int = 10          # projected-Jacobi iterations.  The row-sum-
                             # preconditioned sweep converges fast on the
                             # humanoid's foot contacts: vs MuJoCo C the
                             # landing/standing golden tracks identically
                             # for iters in [6, 25] (RMS 0.0019-0.0023) and
                             # the prone 24-contact collapse settles at the
                             # same height with qpos RMS drift <= 0.005 vs
                             # iters=25 over 3 s -- 10 keeps 2x margin over
                             # the knee while dropping 60% of the sweep's
                             # vector-register passes in the substep kernel
    relax: float = 1.0       # relaxation for the (row-sum-scaled) sweep
    max_contacts: int = 6    # top-K deepest candidate points kept per substep.
                             # A rigid foot is fully constrained by 3-4
                             # points; 6 tracks MuJoCo C within 0.003 qpos
                             # RMS of K=8 on every golden scenario incl. the
                             # prone 24-contact collapse (tools/
                             # sweep_contact_params.py, round 4), and
                             # together with max_pair_contacts=6 puts the
                             # contact block at c = 3K+KP = 24 rows -- an
                             # exact 3-sublane-tile width, vs (8,4)'s 28
                             # padding to 32 in every per-dof solve op
    max_pair_contacts: int = 6  # top-K deepest body-body (self-collision)
                             # candidates kept per substep.  The reference
                             # model resolves body-body pairs frictionless
                             # (condim=1, humanoid_1205_v1.xml:11), so each
                             # selected pair contributes ONE normal-only row
                             # to the contact system (vs 3 for floor points);
                             # 6 covers the persistent Neck/Shoulder contacts
                             # plus crossed-limb poses with slack (two of the
                             # top-4 deepest pairs sharing one anatomical
                             # region-pair class was never observed on the
                             # golden scenarios).  0 disables self-collision
                             # (floor-only, rounds 1-3 behavior)
    fused_solver: bool = False  # use the single fused Pallas kernel for the
                                # whole solve+contact chain (measured slightly
                                # slower than the split path on v5e: the
                                # mega-kernel serializes work XLA overlaps)
    pd_fused: bool = False   # fuse the whole PD substep (stable-PD solve ->
                             # torque -> dynamics + contact solve -> sweep)
                             # into one Pallas kernel so M crosses HBM once
                             # per substep.  Measured ~9% slower than the
                             # split path on v5e at B=1024 (the mega-kernel
                             # serializes work XLA overlaps across lanes);
                             # kept as an option for parts where per-op
                             # dispatch dominates.  Takes precedence over
                             # fused_solver inside pd_control_step.
    substep_resident: bool = False  # run the ENTIRE control step (all
                             # n_frames substeps incl. FK/CRBA/RNEA) as one
                             # lane-major Pallas kernel resident in VMEM
                             # (substep_pallas.py) -- attacks the fk+crba+
                             # bias dependency-chain latency the round-2
                             # profile identified.  TPU only; single-env and
                             # CPU calls fall back to the split path.
                             # Takes precedence over pd_fused/fused_solver.
    sparse_ldl: bool = True  # inside the substep-resident kernel, solve the
                             # stable-PD and dynamics systems with the sparse
                             # tree-structured LDL^T (ldl_pallas.py,
                             # compressed ancestor-slot rows, zero fill-in)
                             # instead of the dense blocked Cholesky --
                             # ~10x fewer multiplies on the humanoid tree.
                             # Ignored outside the resident kernel.
    klim: float = 200.0      # joint-limit stiffness (N m / rad)
    blim: float = 5.0        # joint-limit damping (N m s / rad)
    prep_refresh: int = 1    # recompute the configuration-dependent prep
                             # (FK, CRBA mass matrix, RNEA bias, contact
                             # candidates/Jacobian and the factorizations
                             # derived from them) every `prep_refresh`-th
                             # substep, reusing the frozen geometry for the
                             # substeps in between; the per-substep solves,
                             # PD error terms, joint limits, torque clamp,
                             # sweep and integration always use fresh q/v.
                             # At 450 Hz the configuration drifts ~|v|*2.2ms
                             # per substep, so short reuse windows track
                             # MuJoCo C within the same golden bounds as
                             # full recompute (measured in
                             # tests/test_physics_golden.py and
                             # tools/sweep_contact_params.py) while skipping
                             # the dominant kernel stages (factor/Delassus/
                             # CRBA) on the reused substeps.  1 = reference
                             # behavior (MuJoCo recomputes everything every
                             # substep).  Applies to the split scan path and
                             # the substep-resident kernel (sparse-LDL mode);
                             # ignored by the rejected pd_fused/fused_solver
                             # variants.


# substep_resident on by default: batched TPU callers (sampling/eval scans)
# get the VMEM-resident kernel (1.7x control-step compute on v5e, numerics
# within 1e-6 of the split path per step); CPU, single-env, and unsupported
# actuator layouts fall back to the split path automatically.
# EGOPOSE_PREP_REFRESH overrides the prep-refresh cadence for measurement
# tools (tools/bench_prep_refresh.py, bench.py ablations).  The shipped
# default R=3 (refresh factorization/Delassus/CRBA geometry every 3rd
# 450 Hz substep, solve against frozen prep in between) comes from the
# round-5 receipts in BASELINE.md: golden RMS vs MuJoCo C stays inside
# every bound with margin (worst case pushed 0.0345 < 0.05; the isolated
# cadence effect is below the engine-vs-MuJoCo distance everywhere) while
# the control-step kernel drops 7.37 -> 5.69 ms at B=1024 (-23%).  R=5
# starts to drift (standing cadence effect 0.0036 exceeds its own golden
# distance) for only 3% more; R=1 pins MuJoCo-C reference behavior
# (config key `prep_refresh: 1`).
import os as _os_dc
DEFAULT_CONTACT = ContactParams(
    substep_resident=True,
    prep_refresh=int(_os_dc.environ.get("EGOPOSE_PREP_REFRESH", "3")))

# substep-scan unroll factor: lets XLA fuse across substep boundaries
# (integrate -> next fk); +10% on v5e at B=1024, 5 measured no better than 3.
# Overridable because CPU (LLVM) compile time scales badly with body size --
# the test suite pins it to 1 (tests/conftest.py).
import os as _os
_SUBSTEP_UNROLL = int(_os.environ.get("EGOPOSE_SUBSTEP_UNROLL", "3"))


# ---------------------------------------------------------------------------
# forward kinematics (scan over tree depth, batched within a level)
# ---------------------------------------------------------------------------

def fk(m: PhysicsModel, qpos: jax.Array) -> Kin:
    """Forward kinematics: world pose of every body + joint motion subspaces.

    MuJoCo joint semantics: within a body, hinge joints apply sequentially,
    each about its locally-specified axis/anchor in the frame produced by the
    preceding joints (verified to 1e-12 against mj_kinematics).

    Level-scan formulation: all bodies at one tree depth are processed as a
    batch per scan step.  (A fully unrolled static-index traversal was tried
    and measured within noise of this on v5e at B=1024 -- the chain is bound
    by the sequential depth dependency, not by op count -- while blowing up
    CPU compile times, so the scan form stays.)
    """
    nb, nd = m.nbody, m.ndof
    dtype = qpos.dtype

    qpos_pad = jnp.concatenate([qpos, jnp.zeros(1, dtype)])

    # carries are padded with one dummy row so masked lanes write nowhere
    xpos0 = jnp.zeros((nb + 1, 3), dtype)
    xquat0 = jnp.zeros((nb + 1, 4), dtype).at[:, 0].set(1.0)
    s0 = jnp.zeros((nd + 1, 6), dtype)

    root_q = Q.quat_normalize(qpos[3:7])
    r0 = Q.quat_to_mat(root_q)
    xpos0 = xpos0.at[0].set(qpos[:3])
    xquat0 = xquat0.at[0].set(root_q)
    # free joint: 3 world-frame translations, 3 body-frame rotations about the
    # body origin (MuJoCo convention)
    eye = jnp.eye(3, dtype=dtype)
    s0 = s0.at[0:3, 3:].set(eye)
    s0 = s0.at[3:6, :3].set(r0.T)  # rows = world directions of local axes
    s0 = s0.at[3:6, 3:].set(jnp.cross(jnp.broadcast_to(qpos[:3], (3, 3)), r0.T))

    def level(carry, xs):
        xpos, xquat, s = carry
        body, parent, bodypos, axis, anchor, qidx, didx = xs
        # W = parent world transform composed with the fixed body offset
        wq = xquat[parent]                       # (B,4)
        wt = xpos[parent] + Q.quat_rotate(wq, bodypos)
        for k in range(3):                       # 3 hinge slots, masked by pad
            a = axis[:, k]                       # (B,3) local axis (constant)
            c = anchor[:, k]
            angle = qpos_pad[qidx[:, k]]
            axis_w = Q.quat_rotate(wq, a)
            anchor_w = wt + Q.quat_rotate(wq, c)
            s = s.at[didx[:, k]].set(
                jnp.concatenate([axis_w, jnp.cross(anchor_w, axis_w)], -1))
            # rotate about the local axis through the local anchor:
            # W <- W o [T(c) R(a,angle) T(-c)]
            r = Q.axis_angle_to_quat(a, angle)
            wq = Q.quat_mul(wq, r)
            wt = anchor_w - Q.quat_rotate(wq, c)
        xpos = xpos.at[body].set(wt)
        xquat = xquat.at[body].set(wq)
        return (xpos, xquat, s), None

    xs = (m.level_body, m.level_parent, m.level_bodypos, m.level_axis,
          m.level_anchor, m.level_qpos_idx, m.level_dof_idx)
    (xposp, xquatp, sp), _ = jax.lax.scan(level, (xpos0, xquat0, s0), xs)
    xpos, xquat, s = xposp[:nb], xquatp[:nb], sp[:nd]
    com = xpos + Q.quat_rotate(xquat, m.body_ipos)
    return Kin(xpos=xpos, xquat=xquat, com=com, s=s)


def subtree_com(m: PhysicsModel, kin: Kin) -> jax.Array:
    """Whole-model center of mass (reference: data.subtree_com[0],
    humanoid_v1.py:127-128)."""
    return jnp.sum(m.body_mass[:, None] * kin.com, axis=0) / jnp.sum(m.body_mass)


# ---------------------------------------------------------------------------
# velocities / inertias
# ---------------------------------------------------------------------------

def body_velocities(m: PhysicsModel, kin: Kin, qvel: jax.Array) -> jax.Array:
    """Spatial velocity [w; v_O] of each body, world frame.  (nb,6).
    v[b] = sum of S_d qdot_d over the dofs on the path root->b: one matmul."""
    sq = kin.s * qvel[:, None]
    return _mm(m.body_dof_mask, sq)


def spatial_inertia_world(m: PhysicsModel, kin: Kin):
    """Per-body world-frame inertia (nb,3,3) about the body com."""
    r = Q.quat_to_mat(kin.xquat)
    return jnp.einsum("bij,bjk,blk->bil", r, m.body_inertia, r,
                      precision=_HI)


def _apply_inertia(mass, com, ic, v):
    """I * v for spatial inertia about world origin.  v (...,6) -> (...,6)."""
    w, vo = v[..., :3], v[..., 3:]
    p = mass[..., None] * (vo + jnp.cross(w, com))
    n = jnp.einsum("...ij,...j->...i", ic, w, precision=_HI) + jnp.cross(com, p)
    return jnp.concatenate([n, p], axis=-1)


def _cross_motion(a, b):
    """Spatial motion cross product a x b."""
    wa, va = a[..., :3], a[..., 3:]
    wb, vb = b[..., :3], b[..., 3:]
    return jnp.concatenate([jnp.cross(wa, wb), jnp.cross(wa, vb) + jnp.cross(va, wb)], -1)


def _cross_force(v, f):
    """Spatial force cross product v x* f."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], -1)


# ---------------------------------------------------------------------------
# CRBA: joint-space inertia matrix
# ---------------------------------------------------------------------------

def crba(m: PhysicsModel, kin: Kin) -> jax.Array:
    """Composite-rigid-body mass matrix M (nd,nd), including armature.
    Mirrors what mjf.mj_fullM exposes to the reference
    (/root/reference/ego_pose/envs/humanoid_v1.py:133-135).

    Composite subtree inertias are formed with the descendant mask (matmuls),
    then M = S I^C S^T gated by the ancestor mask."""
    ic_c = spatial_inertia_world(m, kin)
    eye = jnp.eye(3, dtype=kin.xpos.dtype)
    # second moment about world origin per body
    io = ic_c + m.body_mass[:, None, None] * (
        jnp.sum(kin.com * kin.com, -1)[:, None, None] * eye
        - jnp.einsum("bi,bj->bij", kin.com, kin.com))
    mom = m.body_mass[:, None] * kin.com
    # composite (subtree) quantities
    cmass = _mm(m.body_desc_mask, m.body_mass)
    cmom = _mm(m.body_desc_mask, mom)
    cio = jnp.einsum("bc,cij->bij", m.body_desc_mask, io, precision=_HI)

    db = jnp.asarray(m.dof_body)
    w, vo = kin.s[:, :3], kin.s[:, 3:]
    cm_d, cmom_d, cio_d = cmass[db], cmom[db], cio[db]
    p = cm_d[:, None] * vo + jnp.cross(w, cmom_d)
    n = jnp.einsum("dij,dj->di", cio_d, w, precision=_HI) + jnp.cross(cmom_d, vo)
    f = jnp.concatenate([n, p], axis=-1)  # (nd,6)

    u = _mm(f, kin.s.T)
    mm = m.anc_mask * u + m.anc_mask.T * (1.0 - m.anc_mask) * u.T
    return mm + jnp.diag(m.dof_armature)


# ---------------------------------------------------------------------------
# RNEA: bias forces (gravity + Coriolis/centrifugal)
# ---------------------------------------------------------------------------

def bias_force(m: PhysicsModel, kin: Kin, qvel: jax.Array) -> jax.Array:
    """qfrc_bias (nd,): generalized force such that M qacc = tau - qfrc_bias
    for the unconstrained system.  Matches MuJoCo data.qfrc_bias.

    The velocity-product (Sdot qdot) term uses the precomputed vp_mask: each
    dof's motion subspace is materially attached to the frame carrying its
    ancestors plus the *earlier* dofs of the same body (free rotational dofs:
    the whole root body; free translational dofs: the world)."""
    ic_c = spatial_inertia_world(m, kin)
    v = body_velocities(m, kin, qvel)  # (nb,6)

    sq = kin.s * qvel[:, None]
    v_frame = _mm(m.vp_mask, sq)                      # (nd,6)
    cj = _cross_motion(v_frame, sq)               # (nd,6) per-dof Sdot qdot
    # gravity trick: fictitious base acceleration -g
    a0 = jnp.concatenate([jnp.zeros(3, qvel.dtype), -m.gravity.astype(qvel.dtype)])
    a = a0 + _mm(m.body_dof_mask, cj)                 # (nb,6)

    iv = _apply_inertia(m.body_mass, kin.com, ic_c, v)
    ia = _apply_inertia(m.body_mass, kin.com, ic_c, a)
    f = ia + _cross_force(v, iv)                  # (nb,6)
    ftot = jnp.einsum("bd,bi->di", m.body_dof_mask, f, precision=_HI)
    return jnp.sum(kin.s * ftot, axis=-1)


# ---------------------------------------------------------------------------
# contacts (penalty model vs the z=0 floor plane) and joint limits
# ---------------------------------------------------------------------------

def pair_candidates(m: PhysicsModel, kin: Kin):
    """Body-body (self-collision) contact candidates: one candidate per
    enabled geom pair (see model._collision_pairs_np for the MuJoCo filter).

    Returns (phi (PP,), n (PP,3), p (PP,3)) for PP = npair + nbpair pair
    candidates: penetration depth (positive = overlapping), contact normal
    (pointing from body2/box toward body1/segment, world frame), and the
    contact point (midpoint between the two surfaces).  The corresponding
    signed dof masks are the static model columns
    [m.pair_dof_mask | m.bpair_dof_mask].

    This is the candidate-generation half of what the MuJoCo C broadphase/
    narrowphase does for the reference every substep
    (/root/reference/envs/common/mujoco_env.py:22-24).  Deviations: parallel
    capsule overlaps produce one contact (MuJoCo: up to two), and segment-box
    distance minimizes a convex signed distance with a fixed 16-step ternary
    search instead of MPR."""
    eps = 1e-12
    outs = []
    if m.npair:
        q1, x1 = kin.xquat[m.pair_body1], kin.xpos[m.pair_body1]
        q2, x2 = kin.xquat[m.pair_body2], kin.xpos[m.pair_body2]
        a1 = x1 + Q.quat_rotate(q1, m.pair_a1)
        b1 = x1 + Q.quat_rotate(q1, m.pair_b1)
        a2 = x2 + Q.quat_rotate(q2, m.pair_a2)
        b2 = x2 + Q.quat_rotate(q2, m.pair_b2)
        # closest points between segments (Ericson 5.1.9, branch-free):
        # degenerate (zero-length = sphere) segments divide by eps and clamp
        d1, d2, r = b1 - a1, b2 - a2, a1 - a2
        A = jnp.sum(d1 * d1, -1)
        E = jnp.sum(d2 * d2, -1)
        B = jnp.sum(d1 * d2, -1)
        C = jnp.sum(d1 * r, -1)
        F = jnp.sum(d2 * r, -1)
        denom = A * E - B * B
        s = jnp.clip((B * F - C * E) / jnp.maximum(denom, eps), 0.0, 1.0)
        t = jnp.clip((B * s + F) / jnp.maximum(E, eps), 0.0, 1.0)
        s = jnp.clip((B * t - C) / jnp.maximum(A, eps), 0.0, 1.0)
        c1 = a1 + s[:, None] * d1
        c2 = a2 + t[:, None] * d2
        diff = c1 - c2
        dist = jnp.sqrt(jnp.sum(diff * diff, -1))
        n = diff / jnp.maximum(dist, 1e-9)[:, None]
        phi = m.pair_rsum - dist
        p = 0.5 * (c1 + c2) - 0.5 * m.pair_rdiff[:, None] * n
        outs.append((phi, n, p))
    if m.nbpair:
        qs, xs = kin.xquat[m.bpair_body_seg], kin.xpos[m.bpair_body_seg]
        qb, xb = kin.xquat[m.bpair_body_box], kin.xpos[m.bpair_body_box]
        qw = Q.quat_mul(qb, m.bpair_boxquat)       # box world orientation
        cb = xb + Q.quat_rotate(qb, m.bpair_boxpos)
        aw = xs + Q.quat_rotate(qs, m.bpair_a)
        bw = xs + Q.quat_rotate(qs, m.bpair_b)
        al = Q.quat_rotate_inv(qw, aw - cb)        # segment in box frame
        bl = Q.quat_rotate_inv(qw, bw - cb)
        h = m.bpair_half

        def sdist(t):
            qq = al + t[:, None] * (bl - al)
            dout = jnp.abs(qq) - h
            mx = jnp.max(dout, -1)                 # inside: -depth
            do = qq - jnp.clip(qq, -h, h)
            return jnp.where(mx > 0, jnp.sqrt(jnp.sum(do * do, -1)), mx)

        # signed point-box distance composed with an affine map is convex in
        # t: fixed-budget golden-section search (model.golden_min01, shared
        # with the resident kernel so both produce identical contacts)
        t = golden_min01(sdist, m.bpair_rseg.shape, m.bpair_rseg.dtype)
        qq = al + t[:, None] * (bl - al)
        dout = jnp.abs(qq) - h
        mx = jnp.max(dout, -1)
        outside = mx > 0
        cc = jnp.clip(qq, -h, h)
        do = qq - cc
        disto = jnp.sqrt(jnp.sum(do * do, -1))
        # inside: push out through the nearest face
        onehot = jax.nn.one_hot(jnp.argmax(dout, -1), 3, dtype=qq.dtype)
        n_in = jnp.where(qq >= 0, 1.0, -1.0) * onehot
        n_l = jnp.where(outside[:, None],
                        do / jnp.maximum(disto, 1e-9)[:, None], n_in)
        signed = jnp.where(outside, disto, mx)
        phi_b = m.bpair_rseg - signed
        n_b = Q.quat_rotate(qw, n_l)               # points box -> segment
        pw_t = aw + t[:, None] * (bw - aw)
        p_out = 0.5 * ((cb + Q.quat_rotate(qw, cc))
                       + (pw_t - m.bpair_rseg[:, None] * n_b))
        p_b = jnp.where(outside[:, None], p_out, pw_t)
        outs.append((phi_b, n_b, p_b))
    phi = jnp.concatenate([o[0] for o in outs])
    n = jnp.concatenate([o[1] for o in outs])
    p = jnp.concatenate([o[2] for o in outs])
    return phi, n, p


def _top_k_desc(x, k):
    """``jax.lax.top_k`` replacement for lane-sharded batched use.  XLA
    lowers top_k (a variadic sort) of a vmapped operand by ALL-GATHERING
    the batch axis across the device mesh (caught by the multichip
    collective audit, parallel/audit.py); this iterative max/suppress form
    is elementwise + reductions over the candidate axis only, so the lane
    sharding passes through untouched.  Ties resolve to the lowest index,
    exactly like lax.top_k; values descend.  k is static and small (4-16),
    so the unrolled loop is also faster than a full sort on TPU."""
    n = x.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        mx = jnp.max(cur, -1, keepdims=True)
        first = jnp.min(jnp.where(cur >= mx, iota, n), -1)
        vals.append(mx[..., 0])
        idxs.append(first)
        cur = jnp.where(iota == first[..., None], -jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def contact_blocks(m: PhysicsModel, kin: Kin,
                   params: ContactParams = DEFAULT_CONTACT):
    """Active-contact geometry in BLOCK row order for the contact solve:
    returns (jf (3K+KP, nd), target (3K+KP,), mu (K,)).

    Rows [0:3K] are the floor contacts ([all-x; all-y; all-z] tangent/normal
    blocks of the top-K deepest floor candidates, friction mu); rows
    [3K:3K+KP] are the top-KP deepest body-body pair candidates, one
    frictionless normal row each (the reference model's body geoms are
    condim=1, humanoid_1205_v1.xml:11)."""
    nd = m.ndof
    dt = m.timestep
    k = min(params.max_contacts, m.ncpoint)
    kp = min(params.max_pair_contacts, m.npair + m.nbpair)

    p_all = kin.xpos[m.cpoint_body] + Q.quat_rotate(kin.xquat[m.cpoint_body],
                                                    m.cpoint_local)
    phi_all = m.cpoint_radius - p_all[:, 2]
    phi, sel = _top_k_desc(phi_all, k)
    p = p_all[sel]
    mu = m.cpoint_mu[sel]
    dof_mask = m.point_dof_mask.T[sel]
    act = (phi > -params.margin).astype(p.dtype)

    s_ang, s_lin = kin.s[:, :3], kin.s[:, 3:]
    jp = s_lin[None] + jnp.cross(jnp.broadcast_to(s_ang[None], (k, nd, 3)),
                                 p[:, None, :])
    jp = jp * (act[:, None] * dof_mask)[:, :, None]
    jf = jp.transpose(2, 0, 1).reshape(3 * k, nd)   # block order
    vn_target = jnp.minimum(
        params.beta * jnp.maximum(phi - params.slop, 0.0) / dt, 1.0) * act
    target = jnp.concatenate([jnp.zeros(2 * k, p.dtype), vn_target])

    if kp:
        phi_p, n_p, p_p = pair_candidates(m, kin)
        smask_all = jnp.concatenate([m.pair_dof_mask, m.bpair_dof_mask], 1)
        php, selp = _top_k_desc(phi_p, kp)
        n_sel, p_sel = n_p[selp], p_p[selp]
        sm = smask_all.T[selp]                      # (kp, nd) signed
        actp = (php > -params.margin).astype(p.dtype)
        # relative-velocity Jacobian row along the normal:
        # row[d] = (s_lin_d . n + s_ang_d . (p x n)) * smask[d]
        # (for dofs ancestral to both bodies the point velocity is common
        # and cancels -- exactly the zero entries of the signed mask)
        pxn = jnp.cross(p_sel, n_sel)               # (kp,3)
        rows = jnp.einsum("di,ki->kd", s_lin, n_sel, precision=_HI) \
            + jnp.einsum("di,ki->kd", s_ang, pxn, precision=_HI)
        rows = rows * (actp[:, None] * sm)
        vn_p = jnp.minimum(
            params.beta * jnp.maximum(php - params.slop, 0.0) / dt,
            1.0) * actp
        jf = jnp.concatenate([jf, rows], 0)
        target = jnp.concatenate([target, vn_p])
    return jf, target, mu


def contact_sweep_blocks(jf, w, target, mu, v_pred, iters, relax):
    """Projected-Jacobi sweep on the contact QP in block row order, given the
    Delassus columns W = Minv J^T (nd, 3K+KP).  Friction box clamp on the
    first 3K rows (tangent-x/tangent-y/normal blocks), plain lambda >= 0 on
    the trailing KP frictionless pair rows."""
    k = mu.shape[0]
    c = jf.shape[0]
    a = _mm(jf, w)
    b = _mm(jf, v_pred)
    bhat = b - target
    # Gershgorin (mass-splitting) preconditioner: plain diagonal Jacobi can
    # diverge when many points couple through one body (e.g. 8 corners of a
    # foot box); dividing by the absolute row sum makes the sweep a
    # contraction for the SPD system
    diag = jnp.sum(jnp.abs(a), axis=-1) + 1.0e-9

    def sweep(lam, _):
        g = _mm(a, lam) + bhat
        lam = lam - relax * g / diag
        ln = jnp.maximum(lam[2 * k:3 * k], 0.0)
        lim = mu * ln
        lx = jnp.clip(lam[:k], -lim, lim)
        ly = jnp.clip(lam[k:2 * k], -lim, lim)
        parts = [lx, ly, ln]
        if c > 3 * k:
            parts.append(jnp.maximum(lam[3 * k:], 0.0))
        return jnp.concatenate(parts), None

    lam0 = jnp.zeros(c, v_pred.dtype)
    lam, _ = jax.lax.scan(sweep, lam0, None, length=iters)
    return v_pred + _mm(w, lam)


def limit_qfrc(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
               params: ContactParams = DEFAULT_CONTACT) -> jax.Array:
    """Soft joint-limit torques for limited hinge dofs."""
    q = qpos[7:]
    dq = qvel[6:]
    below = jnp.maximum(m.jnt_range[:, 0] - q, 0.0)
    above = jnp.maximum(q - m.jnt_range[:, 1], 0.0)
    viol = ((below > 0) | (above > 0)).astype(qpos.dtype)
    tau = (params.klim * (below - above) - viol * params.blim * dq) * m.jnt_limited_f
    return jnp.concatenate([jnp.zeros(6, qpos.dtype), tau])


# ---------------------------------------------------------------------------
# forward dynamics + integration
# ---------------------------------------------------------------------------

def smooth_dynamics(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                    tau: jax.Array, params: ContactParams = DEFAULT_CONTACT,
                    kin: Kin | None = None,
                    mm: jax.Array | None = None,
                    qfrc_bias: jax.Array | None = None):
    """Constraint-free qacc from applied generalized force tau (nd,), plus the
    Cholesky factor of the (implicitly damped) inertia used for the solve.
    Implicit joint damping follows MuJoCo's Euler integrator:
    (M + dt*diag(damping)) qacc = rhs."""
    if kin is None:
        kin = fk(m, qpos)
    if mm is None:
        mm = crba(m, kin)
    if qfrc_bias is None:
        qfrc_bias = bias_force(m, kin, qvel)
    qfrc = tau - qfrc_bias + limit_qfrc(m, qpos, qvel, params) \
        - m.dof_damping * qvel \
        - jnp.concatenate([jnp.zeros(6, qpos.dtype),
                           m.dof_stiffness[6:] * qpos[7:]])
    a = mm + m.timestep * jnp.diag(m.dof_damping)
    return qfrc, a, kin


def integrate(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """Semi-implicit position update (MuJoCo mj_integratePos semantics)."""
    pos = qpos[:3] + dt * qvel[:3]
    quat = Q.quat_integrate(qpos[3:7], qvel[3:6], dt)
    joints = qpos[7:] + dt * qvel[6:]
    return jnp.concatenate([pos, quat, joints])


def step_raw(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array, tau: jax.Array,
             params: ContactParams = DEFAULT_CONTACT):
    """One physics substep at m.timestep with generalized applied force tau:
    smooth dynamics -> predicted velocity -> contact projection -> integrate.
    The dynamics solve and the contact Delassus columns (W = Minv J^T) share
    one fused SPD solve (the Pallas lane-major kernel under vmap)."""
    qfrc, a, kin = smooth_dynamics(m, qpos, qvel, tau, params)
    jf, target, mu = contact_blocks(m, kin, params)
    if params.fused_solver:
        fused = _fused_solver(params.iters, params.relax)
        qvel = fused(a, qfrc, qvel, jf, target, mu, m.timestep)
    else:
        sol = spd_solve(a, jnp.concatenate([qfrc[:, None], jf.T], axis=1))
        qacc, w = sol[:, 0], sol[:, 1:]
        v_pred = qvel + m.timestep * qacc
        qvel = contact_sweep_blocks(jf, w, target, mu, v_pred,
                                    params.iters, params.relax)
    qpos = integrate(m, qpos, qvel, m.timestep)
    return qpos, qvel


# ---------------------------------------------------------------------------
# stable-PD control step (the reference's do_simulation contract)
# ---------------------------------------------------------------------------

def stable_pd_torque(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                     ctrl: jax.Array, jkp: jax.Array, jkd: jax.Array,
                     kin: Kin | None = None, mm: jax.Array | None = None,
                     qfrc_bias: jax.Array | None = None) -> jax.Array:
    """Stable-PD actuator torque (nu,).

    Mirrors compute_torque/compute_desired_accel
    (/root/reference/ego_pose/envs/humanoid_v1.py:130-156): solve
    (M + Kd*dt) qacc = -C - Kp*e - Kd*edot, then
    tau = -kp*e - kd*(edot + qacc*dt) on the actuated dofs.
    """
    if kin is None:
        kin = fk(m, qpos)
    if mm is None:
        mm = crba(m, kin)
    if qfrc_bias is None:
        qfrc_bias = bias_force(m, kin, qvel)
    dt = m.timestep
    k_p = jnp.concatenate([jnp.zeros(6, qpos.dtype), jkp])
    k_d = jnp.concatenate([jnp.zeros(6, qpos.dtype), jkd])
    qpos_err = jnp.concatenate([jnp.zeros(6, qpos.dtype), qpos[7:] - ctrl])
    qvel_err = qvel
    rhs = -qfrc_bias - k_p * qpos_err - k_d * qvel_err
    a = mm + dt * jnp.diag(k_d)
    qacc = spd_solve(a, rhs[:, None])[:, 0]
    qvel_err = qvel_err + qacc * dt
    return -jkp * qpos_err[6:] - jkd * qvel_err[6:]


def pd_control_step(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                    ctrl: jax.Array, jkp: jax.Array, jkd: jax.Array,
                    torque_lim: jax.Array, n_frames: int,
                    params: ContactParams = DEFAULT_CONTACT):
    """Reference do_simulation (humanoid_v1.py:158-174): n_frames substeps of
    stable-PD torque (recomputed each substep) + dynamics integration."""
    if params.substep_resident:
        from . import substep_pallas
        if substep_pallas.supports(m):
            step = substep_pallas.make_substep_step(m, n_frames, params)
            return step(qpos, qvel, ctrl, jkp, jkd, torque_lim)
    if params.pd_fused:
        return _pd_fused_control_step(m, qpos, qvel, ctrl, jkp, jkd,
                                      torque_lim, n_frames, params)

    def group(carry, _, nsub):
        """`nsub` substeps sharing one configuration-dependent prep: FK,
        mass matrix, bias force and contact geometry are computed from the
        state at group entry and reused (prep_refresh semantics); the PD
        error, joint limits, solves against the frozen systems, contact
        sweep and integration run on fresh q/v every substep."""
        qp, qv = carry
        kin = fk(m, qp)
        mm = crba(m, kin)
        qfrc_bias = bias_force(m, kin, qv)
        jf, target, mu = contact_blocks(m, kin, params)
        for _i in range(nsub):
            torque = stable_pd_torque(m, qp, qv, ctrl, jkp, jkd, kin, mm,
                                      qfrc_bias)
            torque = jnp.clip(torque, -torque_lim, torque_lim)
            tau = jnp.zeros(m.ndof, qp.dtype).at[
                jnp.asarray(m.actuator_dof)].add(torque * m.actuator_gear)
            qfrc, a, _ = smooth_dynamics(m, qp, qv, tau, params, kin, mm,
                                         qfrc_bias)
            if params.fused_solver:
                fused = _fused_solver(params.iters, params.relax)
                qv = fused(a, qfrc, qv, jf, target, mu, m.timestep)
            else:
                sol = spd_solve(a, jnp.concatenate([qfrc[:, None], jf.T],
                                                   axis=1))
                qacc, w = sol[:, 0], sol[:, 1:]
                v_pred = qv + m.timestep * qacc
                qv = contact_sweep_blocks(jf, w, target, mu, v_pred,
                                          params.iters, params.relax)
            qp = integrate(m, qp, qv, m.timestep)
        return (qp, qv), None

    r = max(1, int(params.prep_refresh)) if not params.fused_solver else 1
    # unroll=3: XLA fuses across substep boundaries (integrate -> next fk);
    # +10% on v5e at B=1024, unroll=5 measured no better
    (qpos, qvel), _ = jax.lax.scan(
        functools.partial(group, nsub=r), (qpos, qvel), None,
        length=n_frames // r,
        unroll=_SUBSTEP_UNROLL if r == 1 else 1)
    if n_frames % r:
        (qpos, qvel), _ = group((qpos, qvel), None, n_frames % r)
    return qpos, qvel


def _pd_fused_control_step(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                           ctrl: jax.Array, jkp: jax.Array, jkd: jax.Array,
                           torque_lim: jax.Array, n_frames: int,
                           params: ContactParams = DEFAULT_CONTACT):
    """pd_control_step with the whole substep solve chain (stable-PD accel
    solve -> torque -> dynamics + Delassus solve -> projected contact sweep)
    in one Pallas kernel per substep -- the mass matrix crosses HBM once.
    Identical math to the split path (see _pd_fused_single for the
    single-env reference composition)."""
    nd = m.ndof
    dtype = qpos.dtype
    zero6 = jnp.zeros(6, dtype)
    jkp_full = jnp.concatenate([zero6, jkp.astype(dtype)])
    jkd_full = jnp.concatenate([zero6, jkd.astype(dtype)])
    adof = jnp.asarray(m.actuator_dof)
    gear_full = jnp.zeros(nd, dtype).at[adof].add(
        m.actuator_gear.astype(dtype))
    tlim_full = jnp.zeros(nd, dtype).at[adof].add(torque_lim.astype(dtype))
    kdd = jnp.stack([jkd_full, m.dof_damping.astype(dtype)], axis=1)
    pdstep = _pd_fused(params.iters, params.relax)

    def substep(carry, _):
        qp, qv = carry
        kin = fk(m, qp)
        mm = crba(m, kin)
        qfrc_bias = bias_force(m, kin, qv)
        e = jnp.concatenate([zero6, qp[7:] - ctrl])
        rhspd = -qfrc_bias - jkp_full * e - jkd_full * qv
        qfb = -qfrc_bias + limit_qfrc(m, qp, qv, params) \
            - m.dof_damping * qv \
            - jnp.concatenate([zero6, m.dof_stiffness[6:] * qp[7:]])
        jf, target, mu = contact_blocks(m, kin, params)
        qv = pdstep(mm, kdd, rhspd, e, jkp_full, jkd_full, tlim_full,
                    gear_full, qfb, qv, jf, target, mu, m.timestep)
        qp = integrate(m, qp, qv, m.timestep)
        return (qp, qv), None

    (qpos, qvel), _ = jax.lax.scan(substep, (qpos, qvel), None,
                                   length=n_frames, unroll=_SUBSTEP_UNROLL)
    return qpos, qvel


def torque_control_step(m: PhysicsModel, qpos: jax.Array, qvel: jax.Array,
                        ctrl: jax.Array, torque_lim: jax.Array, n_frames: int,
                        params: ContactParams = DEFAULT_CONTACT):
    """do_simulation with action_type == 'torque' (humanoid_v1.py:170-171)."""
    torque = jnp.clip(ctrl, -torque_lim, torque_lim)
    tau = jnp.zeros(m.ndof, qpos.dtype).at[jnp.asarray(m.actuator_dof)].add(
        torque * m.actuator_gear)

    def substep(carry, _):
        qp, qv = carry
        qp, qv = step_raw(m, qp, qv, tau, params)
        return (qp, qv), None

    (qpos, qvel), _ = jax.lax.scan(substep, (qpos, qvel), None,
                                   length=n_frames, unroll=_SUBSTEP_UNROLL)
    return qpos, qvel
