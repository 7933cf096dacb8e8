"""Substep-resident stable-PD control step as ONE Pallas TPU kernel.

The round-2 profile (BASELINE.md) showed the physics control step is bound by
the fk+crba+bias dependency chain: ~15 of 25.7 ms at B=1024 spent in
sequences of tiny dependent ops running ~25x off the VPU roofline -- the
per-op dispatch/layout overhead of XLA fusions on (B, 58-ish) shapes, not
flops.  This kernel keeps the ENTIRE control step resident in VMEM with the
batch on the 128-wide vector lanes: per 128-lane block, a fori_loop runs all
``n_frames`` substeps of

  FK -> CRBA (mass matrix) -> RNEA bias -> joint limits -> stable-PD solve
  -> torque -> dynamics+Delassus solve -> projected contact sweep ->
  semi-implicit integration

with HBM traffic limited to qpos/qvel/ctrl in and qpos/qvel out, once per
control step (the split path crosses HBM at every op boundary of every
substep).  Static model topology/constants (masses, inertias, tree masks,
contact candidates) are baked into the kernel at trace time -- the engine
passes the model as a closure constant, so its leaves are concrete.

Building blocks reused verbatim: the lane-major FK composition
(fk_pallas._fk_compute, bit-exact vs engine.fk) and the blocked lane-major
Cholesky + contact sweep (linalg_pallas._factor_blocked/_subst_blocked/
_contact_sweep).  Math mirrors engine.pd_control_step's split path exactly
(same formulas, same masks); the only intended deviation is contact top-K
tie-breaking order, which the order-agnostic Jacobi sweep doesn't see.

Replaces the role of MuJoCo C in the reference's do_simulation
(/root/reference/ego_pose/envs/humanoid_v1.py:158-174).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fk_pallas import _build_topo, _fk_compute_lvl
from .model import golden_min01
from .ldl_pallas import (anc_segments, dof_anc_lists, ldl_factor, ldl_fsolve,
                         ldl_solve, ldl_tsolve)
from .linalg_pallas import (LANES, _contact_sweep, _delassus_sym,
                            _factor_multi, _subst_blocked, _subst_multi,
                            _sweep_lam_from)


# ---------------------------------------------------------------------------
# static model bundle (numpy/python only; baked into the kernel closure)
# ---------------------------------------------------------------------------

def supports(m) -> bool:
    """The kernel assumes one actuator per hinge dof in dof order (holds for
    every create_humanoid-generated model incl. the EgoPose humanoid) and at
    least one joint dof (the level-batched FK concatenates per-level joint
    rows, which is empty for a bare free body).  pd_control_step silently
    keeps the split path for anything else."""
    return m.ndof > 6 and \
        tuple(m.actuator_dof) == tuple(range(6, m.ndof))


def _build_static(m, params):
    """Everything the kernel needs that is constant per model."""
    nb, nd, nq = m.nbody, m.ndof, m.nq
    if not supports(m):
        raise NotImplementedError(
            "substep-resident kernel assumes one actuator per hinge dof "
            "in dof order (holds for the EgoPose humanoid)")
    children = [[] for _ in range(nb)]
    for b in range(1, nb):
        children[m.parent[b]].append(b)
    body_dofs = [[] for _ in range(nb)]
    for d in range(6, nd):
        body_dofs[m.dof_body[d]].append(d)
    anc = np.asarray(m.anc_mask, np.float32)          # (nd,nd)
    # self-collision pair tables (engine.pair_candidates' static half)
    npair, nbpair = int(m.npair), int(m.nbpair)
    kp = min(params.max_pair_contacts, npair + nbpair)
    pdm_pair = np.concatenate(
        [np.asarray(m.pair_dof_mask, np.float64),
         np.asarray(m.bpair_dof_mask, np.float64)], axis=1)  # (nd, PP)
    pdm_all = np.concatenate(
        [np.asarray(m.point_dof_mask, np.float64), np.abs(pdm_pair)], axis=1)
    return dict(
        nb=nb, nd=nd, nq=nq,
        topo=_build_topo(m),
        parent=tuple(m.parent),
        dof_body=tuple(m.dof_body),
        body_dofs=tuple(tuple(x) for x in body_dofs),
        mass=np.asarray(m.body_mass, np.float64),
        inertia=np.asarray(m.body_inertia, np.float64),
        cmass=np.asarray(m.body_desc_mask, np.float64) @
        np.asarray(m.body_mass, np.float64),
        anc=anc,
        armature=np.asarray(m.dof_armature, np.float64),
        damping=np.asarray(m.dof_damping, np.float64),
        stiffness=np.asarray(m.dof_stiffness, np.float64),
        gravity=np.asarray(m.gravity, np.float64),
        gear=np.asarray(m.actuator_gear, np.float64),
        jnt_lo=np.asarray(m.jnt_range, np.float64)[:, 0],
        jnt_hi=np.asarray(m.jnt_range, np.float64)[:, 1],
        jnt_limited=np.asarray(m.jnt_limited_f, np.float64),
        cp_body=tuple(int(x) for x in np.asarray(m.cpoint_body)),
        cp_local=np.asarray(m.cpoint_local, np.float64),
        cp_radius=np.asarray(m.cpoint_radius, np.float64),
        cp_mu=np.asarray(m.cpoint_mu, np.float64),
        pdm=np.asarray(m.point_dof_mask, np.float64),   # (nd, ncp)
        dt=float(np.asarray(m.timestep)),
        anc_dofs=(anc_dofs := dof_anc_lists(m.anc_mask)),
        anc_segs=anc_segments(anc_dofs),
        # dofs that any contact candidate (floor or pair) can load (static):
        # J columns are structurally zero outside -- the Delassus
        # accumulation skips them
        sup_segs=anc_segments(
            [tuple(np.where(pdm_all.sum(1) > 0)[0])]
        )[0],
        sparse_ldl=bool(params.sparse_ldl),
        k=min(params.max_contacts, m.ncpoint),
        kp=kp, npair=npair, nbpair=nbpair,
        pdm_pair=pdm_pair,
        pair_body1=tuple(int(x) for x in np.asarray(m.pair_body1)),
        pair_body2=tuple(int(x) for x in np.asarray(m.pair_body2)),
        pair_a1=np.asarray(m.pair_a1, np.float64),
        pair_b1=np.asarray(m.pair_b1, np.float64),
        pair_a2=np.asarray(m.pair_a2, np.float64),
        pair_b2=np.asarray(m.pair_b2, np.float64),
        pair_rsum=np.asarray(m.pair_rsum, np.float64),
        pair_rdiff=np.asarray(m.pair_rdiff, np.float64),
        bpair_body_seg=tuple(int(x) for x in np.asarray(m.bpair_body_seg)),
        bpair_body_box=tuple(int(x) for x in np.asarray(m.bpair_body_box)),
        bpair_a=np.asarray(m.bpair_a, np.float64),
        bpair_b=np.asarray(m.bpair_b, np.float64),
        bpair_rseg=np.asarray(m.bpair_rseg, np.float64),
        bpair_boxpos=np.asarray(m.bpair_boxpos, np.float64),
        bpair_boxquat=np.asarray(m.bpair_boxquat, np.float64),
        bpair_half=np.asarray(m.bpair_half, np.float64),
        margin=float(params.margin), beta=float(params.beta),
        slop=float(params.slop), klim=float(params.klim),
        blim=float(params.blim),
        prep_refresh=max(1, int(params.prep_refresh)),
    )


# ---------------------------------------------------------------------------
# lane-major helpers on (rows, comp, L) arrays
# ---------------------------------------------------------------------------

def _cross_n(a, b):
    """(..., 3, L) x (..., 3, L) along axis -2."""
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-2)


def _cross_motion_n(a, b):
    """Spatial motion cross product on (..., 6, L)."""
    wa, va = a[..., :3, :], a[..., 3:, :]
    wb, vb = b[..., :3, :], b[..., 3:, :]
    return jnp.concatenate(
        [_cross_n(wa, wb), _cross_n(wa, vb) + _cross_n(va, wb)], axis=-2)


def _cross_force_n(v, f):
    """Spatial force cross product v x* f on (..., 6, L)."""
    w, vl = v[..., :3, :], v[..., 3:, :]
    n, fl = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [_cross_n(w, n) + _cross_n(vl, fl), _cross_n(w, fl)], axis=-2)


_SYMIDX = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 1): 3, (1, 2): 4, (2, 2): 5}


def _rot_entries(xquat):
    """xquat (nb,4,L) -> 3x3 nested list of (nb,L) rotation-matrix entries
    (same formula as ops.quat.quat_to_mat)."""
    w = xquat[:, 0, :]
    x = xquat[:, 1, :]
    y = xquat[:, 2, :]
    z = xquat[:, 3, :]
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


def _sym(ent, i, j):
    """Access symmetric 3x3 entry store (dict keyed by sorted index pair)."""
    return ent[(i, j)] if (i, j) in ent else ent[(j, i)]


def _world_inertias(mass_col, icol, r, com):
    """Per-body world inertia about the com (ic) and about the world origin
    (io), as symmetric-entry dicts of (nb,L) arrays (engine
    spatial_inertia_world + crba's io).  ``mass_col`` (nb,1), ``icol(k,l)``
    returns the (nb,1) body-frame inertia entry, ``r`` the _rot_entries
    of xquat (shared with the contact-point transform)."""
    # B[k][j] = sum_l I[k,l] r[j][l]
    bmat = [[sum(icol(k, l) * r[j][l] for l in range(3)) for j in range(3)]
            for k in range(3)]
    ic = {}
    for i in range(3):
        for j in range(i, 3):
            ic[(i, j)] = sum(r[i][k] * bmat[k][j] for k in range(3))
    c = [com[:, i, :] for i in range(3)]
    c2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
    io = {}
    for i in range(3):
        for j in range(i, 3):
            io[(i, j)] = ic[(i, j)] + mass_col * (
                (c2 if i == j else 0.0) - c[i] * c[j])
    return ic, io


def _tree_masks(st):
    """Constant 0/1 masks that turn the kernel's serial tree recursions into
    MXU matmuls (numpy, built once per model).  Each mask is derived by
    simulating the corresponding accumulation loop on basis vectors, so the
    matmul computes exactly the same linear map:

      m_vf   (nd,nd): vf      = m_vf @ sq   (velocity seen by each dof's
                                             predecessor chain, RNEA pass 1)
      m_vb   (nb,nd): v_body  = m_vb @ sq   (inclusive body velocities)
      m_ab   (nb,nd): a_body  = a0 + m_ab @ cj  (body accelerations)
      m_gdds (nd,nb): ftot[d] = sum of rows over subtree(body(d)) -- the
                      backward subtree sum + per-dof gather in one map
                      (shared by the RNEA force pass and the CRBA
                      composite-momentum/inertia sums)
    """
    nb, nd = st["nb"], st["nd"]
    parent, body_dofs = st["parent"], st["body_dofs"]
    m_vf = np.zeros((nd, nd))
    m_vb = np.zeros((nb, nd))
    m_ab = np.zeros((nb, nd))
    m_vf[3:6, 0:6] = 1.0                     # free-joint rows see full root v
    m_vb[0, 0:6] = 1.0
    m_ab[0, 0:6] = 1.0
    for b in range(1, nb):
        acc = m_vb[parent[b]].copy()
        for d in body_dofs[b]:
            m_vf[d] = acc
            acc = acc + np.eye(nd)[d]
        m_vb[b] = acc
        m_ab[b] = m_ab[parent[b]]
        for d in body_dofs[b]:
            m_ab[b, d] += 1.0
    desc = np.eye(nb)
    for b in range(nb - 1, 0, -1):
        desc[parent[b]] += desc[b]
    m_gdds = desc[[st["dof_body"][d] for d in range(nd)]]
    return m_vf, m_vb, m_ab, m_gdds


def _apply_inertia_n(mass_col, com, ic, v):
    """I * v for spatial inertia about the world origin, (nb,6,L) -> (nb,6,L)
    (engine._apply_inertia in lane-major form).  ``ic`` is the symmetric
    entry dict of the com-frame world inertia, ``mass_col`` (nb,1)."""
    w, vo = v[:, :3, :], v[:, 3:, :]
    p = mass_col[..., None] * (vo + _cross_n(w, com))
    icw = jnp.stack([sum(_sym(ic, i, j) * w[:, j, :] for j in range(3))
                     for i in range(3)], axis=1)
    n = icw + _cross_n(com, p)
    return jnp.concatenate([n, p], axis=1)


# ---------------------------------------------------------------------------
# pure lane-major substep math (value-level; CPU-testable without pallas)
# ---------------------------------------------------------------------------

def _unpack_consts(st, ndc, masks, bodyc, pdm, cpc, treem, cppk,
                   prpk=None, pdmp=None, pairc=None):
    """Views into the packed per-model constant blocks (see _substep_tpu)."""
    nd, nb = st["nd"], st["nb"]
    ncp = st["cp_local"].shape[0]
    return dict(
        pick=cppk[0:ncp],
        pickl=[cppk[(j + 1) * ncp:(j + 2) * ncp] for j in range(3)],
        armature=ndc[:, 0:1], damping=ndc[:, 1:2], stiff_j=ndc[6:, 2:3],
        gear=ndc[6:, 3:4], lo=ndc[6:, 4:5], hi=ndc[6:, 5:6],
        limited=ndc[6:, 6:7], cmass_dof=ndc[:, 7:8],
        anc=masks[:, :nd][:, :, None],
        anc_t1=masks[:, nd:][:, :, None],            # anc.T * (1 - anc)
        mass_col=bodyc[:, 0:1],
        icol=lambda i, j: bodyc[:, 1 + _SYMIDX[(min(i, j), max(i, j))]:
                                2 + _SYMIDX[(min(i, j), max(i, j))]],
        m_vf=treem[0:nd, 0:nd], m_vb=treem[nd:nd + nb, 0:nd],
        m_ab=treem[nd + nb:nd + 2 * nb, 0:nd],
        m_gdds=treem[0:nd, nd:nd + nb],
        pdm=pdm, cp_radius=cpc[:, 0:1], cp_mu_col=cpc[:, 1:2],
        prpk=prpk, pdmp=pdmp,
        pr_rsum=None if pairc is None else pairc[:st["npair"], 0:1],
        pr_rdiff=None if pairc is None else pairc[:st["npair"], 1:2],
        bp_rseg=None if pairc is None else pairc[st["npair"]:, 0:1],
        bp_half=None if pairc is None else pairc[st["npair"]:, 1:4])


def _crba_fcrb(st, C, dot, s, s_ang, s_lin, com, io):
    """Composite force rows f_crb (nd,6,L) of engine.crba: dof-level
    composite momentum / inertia via the subtree-sum + per-dof gather mask
    m_gdds, then the spatial products."""
    mom = C["mass_col"][..., None] * com               # (nb,3,L)
    cm_d = C["cmass_dof"]                              # (nd,1) constant
    cmom_d = jnp.stack([dot(C["m_gdds"], mom[:, i, :])
                        for i in range(3)], axis=1)    # (nd,3,L)
    cio_d = {key: dot(C["m_gdds"], e_) for key, e_ in io.items()}
    p3 = cm_d[..., None] * s_lin + _cross_n(s_ang, cmom_d)
    cio_w = jnp.stack(
        [sum(_sym(cio_d, i, j) * s_ang[:, j, :]
             for j in range(3)) for i in range(3)], axis=1)
    n3 = cio_w + _cross_n(cmom_d, s_lin)
    return jnp.concatenate([n3, p3], axis=1)           # (nd,6,L)


def _crba_assemble(st, C, f_crb, s, compressed, dtype):
    """Mass matrix from f_crb: compressed ancestor-slot rows (sparse-LDL
    path) or the dense (nd,nd,L) matrix."""
    nd = st["nd"]
    L = s.shape[-1]
    if compressed:
        # compressed rows only: Mc[d, slot] = f_crb[d] . s[anc_slot(d)]
        # (same inner product and summation order as the dense u)
        mrows = []
        for d in range(nd):
            segs = st["anc_segs"][d]
            if not segs:
                mrows.append(None)
                continue
            s_cat = jnp.concatenate([s[a:b] for a, b in segs], axis=0)
            mrows.append(sum(f_crb[d, j, :] * s_cat[:, j, :]
                             for j in range(6)))       # (depth_d, L)
        diag_u = sum(f_crb[:, j, :] * s[:, j, :] for j in range(6))
        dvals = [diag_u[d:d + 1] + C["armature"][d:d + 1]
                 for d in range(nd)]
        return (mrows, dvals)
    # u[d1,d2] = f_crb[d1] . s[d2];  ut computed directly (no transpose)
    u = sum(f_crb[:, j, :][:, None, :] * s[:, j, :][None, :, :]
            for j in range(6))
    ut = sum(s[:, j, :][:, None, :] * f_crb[:, j, :][None, :, :]
             for j in range(6))
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 1)
    eq = r_iota == c_iota
    return C["anc"] * u + C["anc_t1"] * ut \
        + jnp.where(eq, C["armature"][..., None], 0.0)


def _floor_topk(st, C, dot, xpos, rot, s_ang, s_lin, dtype):
    """Floor-contact candidates, top-K deepest (engine.contact_blocks).

    World points p_i = xpos[b_i] + R(xquat[b_i]) loc_i as 12 tiny MXU
    matmuls with the constant body one-hot PICK (and loc-scaled PICKL_j)
    instead of an ncp-iteration quaternion-rotate loop of 1-sublane-row
    ops (rotation-matrix application == quat_rotate up to rounding)."""
    k = st["k"]
    dt = st["dt"]
    L = xpos.shape[-1]
    ncp = st["cp_local"].shape[0]
    p_all = jnp.stack(
        [dot(C["pick"], xpos[:, i, :])
         + sum(dot(C["pickl"][j], rot[i][j]) for j in range(3))
         for i in range(3)], axis=1)                   # (ncp,3,L)
    phi_all = C["cp_radius"] - p_all[:, 2, :]          # (ncp,L)

    cur = phi_all
    jf_rows_x, jf_rows_y, jf_rows_z = [], [], []
    vn_rows, mu_rows = [], []
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (ncp, L), 0)
    for _kk in range(k):
        mx = jnp.max(cur, axis=0, keepdims=True)       # (1,L)
        # first maximal index per lane (cumsum is unimplemented in Mosaic)
        cand = jnp.where(cur >= mx, rows_i, ncp)
        first = jnp.min(cand, axis=0, keepdims=True)
        onehot = (rows_i == first).astype(dtype)
        phi_k = mx
        p_k = [jnp.sum(onehot * p_all[:, i, :], axis=0, keepdims=True)
               for i in range(3)]
        mu_rows.append(jnp.sum(onehot * C["cp_mu_col"], axis=0,
                               keepdims=True))         # (1,L)
        dmask = jnp.dot(C["pdm"], onehot,
                        preferred_element_type=dtype)  # (nd,L)
        act = (phi_k > -st["margin"]).astype(dtype)
        msk = act * dmask
        crx = s_ang[:, 1, :] * p_k[2] - s_ang[:, 2, :] * p_k[1]
        cry = s_ang[:, 2, :] * p_k[0] - s_ang[:, 0, :] * p_k[2]
        crz = s_ang[:, 0, :] * p_k[1] - s_ang[:, 1, :] * p_k[0]
        jf_rows_x.append(((s_lin[:, 0, :] + crx) * msk)[None])
        jf_rows_y.append(((s_lin[:, 1, :] + cry) * msk)[None])
        jf_rows_z.append(((s_lin[:, 2, :] + crz) * msk)[None])
        vn_rows.append(jnp.minimum(
            st["beta"] * jnp.maximum(phi_k - st["slop"], 0.0) / dt,
            1.0) * act)
        cur = cur - onehot * jnp.asarray(1e9, dtype)

    jf = jnp.concatenate(jf_rows_x + jf_rows_y + jf_rows_z, axis=0)
    target = jnp.concatenate([jnp.zeros((2 * k, L), dtype)] + vn_rows,
                             axis=0)                   # (3k,L)
    mu = jnp.concatenate(mu_rows, axis=0)              # (k,L)
    return jf, target, mu


def _rnea_bias(st, C, dot, s, v, com, ic, dtype):
    """RNEA bias force (engine.bias_force): the three forward tree
    recursions (vf / v_body / a_body) and the backward force pass are
    linear maps over dof/body rows -- one mask matmul each (_tree_masks)."""
    L = v.shape[-1]
    sq = s * v[:, None, :]                             # (nd,6,L)
    vf = jnp.stack([dot(C["m_vf"], sq[:, j, :])
                    for j in range(6)], axis=1)        # (nd,6,L)
    cj = _cross_motion_n(vf, sq)                       # (nd,6,L)
    grav = st["gravity"]
    ones1 = jnp.ones((1, L), dtype)
    a0 = jnp.stack([ones1 * 0.0, ones1 * 0.0, ones1 * 0.0,
                    ones1 * float(-grav[0]), ones1 * float(-grav[1]),
                    ones1 * float(-grav[2])], axis=1)  # (1,6,L)
    v_stack = jnp.stack([dot(C["m_vb"], sq[:, j, :])
                         for j in range(6)], axis=1)   # (nb,6,L)
    a_stack = a0 + jnp.stack([dot(C["m_ab"], cj[:, j, :])
                              for j in range(6)], axis=1)
    iv = _apply_inertia_n(C["mass_col"], com, ic, v_stack)
    ia = _apply_inertia_n(C["mass_col"], com, ic, a_stack)
    f_b = ia + _cross_force_n(v_stack, iv)             # (nb,6,L)
    ftot = jnp.stack([dot(C["m_gdds"], f_b[:, j, :])
                      for j in range(6)], axis=1)      # (nd,6,L)
    return jnp.sum(s * ftot, axis=1)                   # (nd,L)


def _lane_prep_geom(st, C, q, v, dtype, compressed=False):
    """The configuration-dependent half of the substep prep: FK, CRBA mass
    matrix, RNEA bias and the contact candidates/Jacobian, as pure values on
    lane-major arrays.  Returns (mmat, bias, jf, target, mu).  Under a
    prep-refresh cadence (ContactParams.prep_refresh) this is the part
    computed once per refresh and frozen for the substeps in between.

    With ``compressed`` (the sparse-LDL path), ``mmat`` is
    ``(mrows, dvals)`` -- the mass matrix directly in ldl_pallas's
    compressed ancestor-slot form -- and the dense (nd,nd,L) matrix is
    never materialized: only the tree-coupled CRBA inner products are
    computed (the rest of the dense matrix is structurally zero and the
    u^T half is never needed, since compressed rows live strictly in the
    lower triangle where anc_mask selects u)."""
    dt = st["dt"]
    # 0/1-mask matmuls replace the serial tree recursions: each ride the MXU
    # as one (rows,cols)@(cols,L) contraction instead of ~nb dependent
    # 1-sublane-row VPU adds (HIGHEST keeps f32 operands exact to ~1 ulp)
    dot = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=dtype)

    # ---- FK (fk_pallas level-batched composition, bit-exact vs both
    # engine.fk and the sequential _fk_compute) -------------------------
    xpos, xquat, com, s = _fk_compute_lvl(q, st["topo"], dtype)
    s_ang, s_lin = s[:, :3, :], s[:, 3:, :]

    # ---- CRBA (engine.crba) ---------------------------------------------
    rot = _rot_entries(xquat)
    ic, io = _world_inertias(C["mass_col"], C["icol"], rot, com)
    f_crb = _crba_fcrb(st, C, dot, s, s_ang, s_lin, com, io)
    mmat = _crba_assemble(st, C, f_crb, s, compressed, dtype)

    # ---- RNEA bias (engine.bias_force) ----------------------------------
    bias = _rnea_bias(st, C, dot, s, v, com, ic, dtype)

    jf, target, mu = _floor_topk(st, C, dot, xpos, rot, s_ang, s_lin,
                                 dtype)

    # ---- self-collision pair candidates (engine.pair_candidates) --------
    # one frictionless normal row per selected pair (top-kp by depth)
    kp = st["kp"]
    if kp:
        phi_pair, n_pair, p_pair = _pair_narrowphase(st, C, xpos, rot,
                                                     dot, dtype)
        pair_rows, pair_vn = _pair_select(st, C, s_lin, s_ang, phi_pair,
                                          n_pair, p_pair, dt, dtype)
        jf = jnp.concatenate([jf] + pair_rows, axis=0)  # (3k+kp,nd,L)
        target = jnp.concatenate([target] + pair_vn, axis=0)
    return mmat, bias, jf, target, mu


def _lane_pd_rhs(st, C, q, v, ctrl, bias, jkp_full, jkd_full, dtype):
    """The per-substep (elementwise) half of the prep: joint limits +
    passive forces and the stable-PD error/rhs, from fresh q/v against a
    (possibly frozen) bias.  Returns (qfb, e, rhspd)."""
    L = q.shape[-1]
    qj = q[7:]                                         # (nu,L)
    dqj = v[6:]
    below = jnp.maximum(C["lo"] - qj, 0.0)
    above = jnp.maximum(qj - C["hi"], 0.0)
    viol = ((below > 0) | (above > 0)).astype(dtype)
    tau_lim = (st["klim"] * (below - above)
               - viol * st["blim"] * dqj) * C["limited"]
    qfb = -bias - C["damping"] * v
    # (.at[6:].add lowers to scatter-add, unimplemented in Mosaic)
    qfb = jnp.concatenate(
        [qfb[:6], qfb[6:] + tau_lim - C["stiff_j"] * qj], axis=0)

    e = jnp.concatenate([jnp.zeros((6, L), dtype), qj - ctrl], axis=0)
    rhspd = -bias - jkp_full * e - jkd_full * v
    return qfb, e, rhspd


def _lane_prep(st, C, q, v, ctrl, jkp_full, jkd_full, dtype,
               compressed=False):
    """Everything a substep needs BEFORE the SPD solves
    (_lane_prep_geom + _lane_pd_rhs at the same state):

      mmat (nd,nd,L), bias (nd,L), qfb (nd,L), e (nd,L), rhspd (nd,L),
      jf (3k,nd,L) block rows, target (3k,L), mu (k,L)

    Mirrors engine.{crba,bias_force,limit_qfrc,smooth_dynamics
    pre-solve,contact_blocks} exactly; the kernel and the CPU unit tests
    share this function."""
    mmat, bias, jf, target, mu = _lane_prep_geom(st, C, q, v, dtype,
                                                 compressed)
    qfb, e, rhspd = _lane_pd_rhs(st, C, q, v, ctrl, bias, jkp_full,
                                 jkd_full, dtype)
    return mmat, bias, qfb, e, rhspd, jf, target, mu


def _pair_narrowphase(st, C, xpos, rot, dot, dtype):
    """Depth/normal/contact-point of every static collision pair:
    phi (PP,L), n [3 x (PP,L)], p [3 x (PP,L)] (engine.pair_candidates'
    per-state half, lane-major)."""
    L = xpos.shape[-1]
    P, Pb = st["npair"], st["nbpair"]
    eps = 1e-12
    # world coordinates of all pair points: one (4P+6Pb, 4nb) matmul per
    # coordinate against the stacked [xpos_i; rot_i0; rot_i1; rot_i2]
    W = [dot(C["prpk"],
             jnp.concatenate([xpos[:, i, :]] + [rot[i][j]
                                                for j in range(3)],
                             axis=0)) for i in range(3)]  # 3 x (rows,L)
    phi_parts, n_parts, p_parts = [], [], []
    if P:
        a1 = [W[i][0:P] for i in range(3)]
        b1 = [W[i][P:2 * P] for i in range(3)]
        a2 = [W[i][2 * P:3 * P] for i in range(3)]
        b2 = [W[i][3 * P:4 * P] for i in range(3)]
        d1 = [b1[i] - a1[i] for i in range(3)]
        d2 = [b2[i] - a2[i] for i in range(3)]
        rr = [a1[i] - a2[i] for i in range(3)]
        A = sum(d1[i] * d1[i] for i in range(3))
        E = sum(d2[i] * d2[i] for i in range(3))
        B = sum(d1[i] * d2[i] for i in range(3))
        Cc = sum(d1[i] * rr[i] for i in range(3))
        F = sum(d2[i] * rr[i] for i in range(3))
        denom = A * E - B * B
        s = jnp.clip((B * F - Cc * E) / jnp.maximum(denom, eps), 0., 1.)
        t = jnp.clip((B * s + F) / jnp.maximum(E, eps), 0., 1.)
        s = jnp.clip((B * t - Cc) / jnp.maximum(A, eps), 0., 1.)
        c1 = [a1[i] + s * d1[i] for i in range(3)]
        c2 = [a2[i] + t * d2[i] for i in range(3)]
        df = [c1[i] - c2[i] for i in range(3)]
        dist = jnp.sqrt(sum(df[i] * df[i] for i in range(3)))
        inv = 1.0 / jnp.maximum(dist, 1e-9)
        n_ss = [df[i] * inv for i in range(3)]
        phi_parts.append(C["pr_rsum"] - dist)
        p_parts.append([0.5 * (c1[i] + c2[i])
                        - 0.5 * C["pr_rdiff"] * n_ss[i]
                        for i in range(3)])
        n_parts.append(n_ss)
    if Pb:
        o = 4 * P
        cbx = [W[i][o:o + Pb] for i in range(3)]
        ax = [[W[i][o + Pb * (1 + mm_):o + Pb * (2 + mm_)]
               for i in range(3)] for mm_ in range(3)]  # ax[m][i]
        aw = [W[i][o + 4 * Pb:o + 5 * Pb] for i in range(3)]
        bw = [W[i][o + 5 * Pb:o + 6 * Pb] for i in range(3)]
        h = [C["bp_half"][:, j:j + 1] for j in range(3)]
        al = [sum(ax[mm_][i] * (aw[i] - cbx[i]) for i in range(3))
              for mm_ in range(3)]
        bl = [sum(ax[mm_][i] * (bw[i] - cbx[i]) for i in range(3))
              for mm_ in range(3)]

        def sdist(t):
            qq = [al[mm_] + t * (bl[mm_] - al[mm_]) for mm_ in range(3)]
            dout = [jnp.abs(qq[mm_]) - h[mm_] for mm_ in range(3)]
            mx = jnp.maximum(jnp.maximum(dout[0], dout[1]), dout[2])
            do = [qq[mm_] - jnp.clip(qq[mm_], -h[mm_], h[mm_])
                  for mm_ in range(3)]
            disto = jnp.sqrt(sum(do[mm_] * do[mm_] for mm_ in range(3)))
            return jnp.where(mx > 0, disto, mx)

        t = golden_min01(sdist, (Pb, L), dtype)
        qq = [al[mm_] + t * (bl[mm_] - al[mm_]) for mm_ in range(3)]
        dout = [jnp.abs(qq[mm_]) - h[mm_] for mm_ in range(3)]
        mx = jnp.maximum(jnp.maximum(dout[0], dout[1]), dout[2])
        outside = mx > 0
        cc = [jnp.clip(qq[mm_], -h[mm_], h[mm_]) for mm_ in range(3)]
        do = [qq[mm_] - cc[mm_] for mm_ in range(3)]
        disto = jnp.sqrt(sum(do[mm_] * do[mm_] for mm_ in range(3)))
        invo = 1.0 / jnp.maximum(disto, 1e-9)
        # inside: nearest face (first max, matching jnp.argmax)
        is0 = (dout[0] >= dout[1]) & (dout[0] >= dout[2])
        is1 = (~is0) & (dout[1] >= dout[2])
        is2 = (~is0) & (~is1)
        sel = [is0, is1, is2]
        n_l = [jnp.where(outside, do[mm_] * invo,
                         jnp.where(qq[mm_] >= 0, 1.0, -1.0)
                         * sel[mm_].astype(dtype)) for mm_ in range(3)]
        signed = jnp.where(outside, disto, mx)
        n_bx = [sum(ax[mm_][i] * n_l[mm_] for mm_ in range(3))
                for i in range(3)]
        pw_t = [aw[i] + t * (bw[i] - aw[i]) for i in range(3)]
        cbw = [cbx[i] + sum(ax[mm_][i] * cc[mm_] for mm_ in range(3))
               for i in range(3)]
        p_bx = [jnp.where(outside,
                          0.5 * (cbw[i] + pw_t[i]
                                 - C["bp_rseg"] * n_bx[i]),
                          pw_t[i]) for i in range(3)]
        phi_parts.append(C["bp_rseg"] - signed)
        n_parts.append(n_bx)
        p_parts.append(p_bx)
    phi_pair = jnp.concatenate(phi_parts, axis=0)       # (PP,L)
    n_pair = [jnp.concatenate([blk[i] for blk in n_parts], axis=0)
              for i in range(3)]
    p_pair = [jnp.concatenate([blk[i] for blk in p_parts], axis=0)
              for i in range(3)]
    return phi_pair, n_pair, p_pair


def _pair_select(st, C, s_lin, s_ang, phi_pair, n_pair, p_pair, dt, dtype):
    """Top-kp-by-depth pair selection and Jacobian row construction:
    kp frictionless normal rows (1,nd,L) + velocity targets (1,L)."""
    kp = st["kp"]
    PP = st["npair"] + st["nbpair"]
    L = phi_pair.shape[-1]
    cur = phi_pair
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (PP, L), 0)
    pair_rows, pair_vn = [], []
    for _kk in range(kp):
        mx = jnp.max(cur, axis=0, keepdims=True)        # (1,L)
        cand = jnp.where(cur >= mx, rows_p, PP)
        first = jnp.min(cand, axis=0, keepdims=True)
        onehot = (rows_p == first).astype(dtype)
        phi_k = mx
        n_k = [jnp.sum(onehot * n_pair[i], axis=0, keepdims=True)
               for i in range(3)]
        p_k = [jnp.sum(onehot * p_pair[i], axis=0, keepdims=True)
               for i in range(3)]
        sm = jnp.dot(C["pdmp"], onehot,
                     preferred_element_type=dtype)      # (nd,L) signed
        act = (phi_k > -st["margin"]).astype(dtype)
        pxn = [p_k[1] * n_k[2] - p_k[2] * n_k[1],
               p_k[2] * n_k[0] - p_k[0] * n_k[2],
               p_k[0] * n_k[1] - p_k[1] * n_k[0]]
        row = sum(s_lin[:, i, :] * n_k[i] for i in range(3)) \
            + sum(s_ang[:, i, :] * pxn[i] for i in range(3))
        pair_rows.append((row * (act * sm))[None])
        pair_vn.append(jnp.minimum(
            st["beta"] * jnp.maximum(phi_k - st["slop"], 0.0) / dt,
            1.0) * act)
        cur = cur - onehot * jnp.asarray(1e9, dtype)
    return pair_rows, pair_vn


def _lane_integrate(st, q, v_new, dtype):
    """Semi-implicit integration, lane-major (engine.integrate +
    ops.quat.quat_integrate exactly)."""
    dt = st["dt"]
    pos = q[0:3] + dt * v_new[0:3]
    ew = v_new[3:6] * dt                               # (3,L)
    angle = jnp.sqrt(jnp.sum(ew * ew, axis=0, keepdims=True))
    safe = angle > 1e-12
    inv = 1.0 / jnp.maximum(angle, jnp.asarray(1e-12, dtype))
    ax = jnp.where(safe, ew[0:1] * inv, 1.0)
    ay = jnp.where(safe, ew[1:2] * inv, 0.0)
    az = jnp.where(safe, ew[2:3] * inv, 0.0)
    half = 0.5 * angle
    sh = jnp.sin(half)
    dq = jnp.concatenate([jnp.cos(half), ax * sh, ay * sh, az * sh], axis=0)
    qa = q[3:7]
    aw, axx, ayy, azz = qa[0:1], qa[1:2], qa[2:3], qa[3:4]
    bw, bx, by, bz = dq[0:1], dq[1:2], dq[2:3], dq[3:4]
    quat = jnp.concatenate([
        aw * bw - axx * bx - ayy * by - azz * bz,
        aw * bx + axx * bw + ayy * bz - azz * by,
        aw * by - axx * bz + ayy * bw + azz * bx,
        aw * bz + axx * by - ayy * bx + azz * bw], axis=0)
    qn = jnp.sqrt(jnp.sum(quat * quat, axis=0, keepdims=True))
    quat = quat / jnp.maximum(qn, jnp.asarray(1e-12, dtype))
    joints = q[7:] + dt * v_new[6:]
    return jnp.concatenate([pos, quat, joints], axis=0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _substep_kernel(*refs, st, n_frames, iters, relax, dtype):
    nd = st["nd"]
    k = st["k"]
    kp = st["kp"]
    c3 = 3 * k + kp
    dt = st["dt"]                                      # python float (static)

    (qpos_ref, qvel_ref, ctrl_ref, jkp_ref, jkd_ref, tlim_ref,
     ndc_ref, masks_ref, bodyc_ref, pdm_ref, cpc_ref,
     treem_ref, cppk_ref) = refs[:13]
    if kp:
        prpk_ref, pdmp_ref, pairc_ref = refs[13:16]
        rest = refs[16:]
    else:
        prpk_ref = pdmp_ref = pairc_ref = None
        rest = refs[13:]
    (oq_ref, ov_ref, a_s, a2_s, x_s, xpd_s, jf_s, tgt_s, mu_s) = rest

    L = refs[0].shape[-1]                              # lane-block width
    zeros6 = jnp.zeros((6, L), dtype)
    jkp_full = jnp.concatenate([zeros6, jkp_ref[...][:, 0, :]], axis=0)
    jkd_full = jnp.concatenate([zeros6, jkd_ref[...][:, 0, :]], axis=0)
    tlim = tlim_ref[...][:, 0, :]                      # (nu,L)
    ctrl = ctrl_ref[...]                               # (nu,L)
    # packed per-model constants (pallas kernels cannot capture array
    # constants -- everything arrives as a small 2D input block)
    C = _unpack_consts(st, ndc_ref[...], masks_ref[...], bodyc_ref[...],
                       pdm_ref[...], cpc_ref[...], treem_ref[...],
                       cppk_ref[...],
                       None if prpk_ref is None else prpk_ref[...],
                       None if pdmp_ref is None else pdmp_ref[...],
                       None if pairc_ref is None else pairc_ref[...])
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (nd, nd, L), 1)
    eq = r_iota == c_iota

    oq_ref[...] = qpos_ref[...]
    ov_ref[...] = qvel_ref[...]

    # prep-refresh cadence (ContactParams.prep_refresh): the group below
    # computes the configuration-dependent prep (FK/CRBA/RNEA/contact
    # geometry) and the factorizations/Delassus derived from it ONCE, then
    # runs `nsub` substeps against the frozen systems -- fresh PD error,
    # joint limits, solves, sweep and integration each substep.  Sparse-LDL
    # mode only (the dense branch keeps nsub == 1).
    rr = st["prep_refresh"] if st["sparse_ldl"] else 1

    def run_group(nsub):
        q0 = oq_ref[...]                               # (nq,L)
        v0 = ov_ref[...]                               # (nd,L)
        mmat, bias, jf, target, mu = _lane_prep_geom(
            st, C, q0, v0, dtype, compressed=st["sparse_ldl"])

        jf_s[...] = jf                                 # (3k,nd,L)
        tgt_s[...] = target[:, None, :]
        mu_s[...] = mu[:, None, :]
        jt = jnp.stack([jf[i] for i in range(c3)], axis=1)  # J^T (nd,c3,L)

        if st["sparse_ldl"]:
            # Sparse tree-structured LDL^T (ldl_pallas): the mass matrix has
            # kinematic-tree sparsity, so the leaves-first factorization has
            # zero fill-in -- ~10x fewer multiplies than the dense blocked
            # Cholesky.  Same systems, different (exact) algorithm.
            anc = st["anc_dofs"]
            mr, dv = mmat                              # compressed prep

            # ---- frozen factorizations (once per refresh) ----------------
            mr_pd = list(mr)                           # copy BEFORE the dyn
            d_pd = [dv[i] + dt * jkd_full[i:i + 1] for i in range(nd)]
            invd_pd = ldl_factor(mr_pd, d_pd, anc)     # factor mutates mr_pd
            d_dyn = [dv[i] + dt * C["damping"][i:i + 1] for i in range(nd)]
            invd_dyn = ldl_factor(mr, d_dyn, anc)      # ...and this one mr
            # forward-only contact columns: only the L^-T sweep runs on the
            # c3 J^T columns (Y = L^-T J^T); the Delassus G = Y^T D^-1 Y is
            # assembled once from its lower-triangular blocks and reused by
            # every sweep in the group; the D/L substitutions run on exactly
            # two single columns per substep (qacc and Y lam) instead of 1+c3
            yv = [jt[i] for i in range(nd)]            # (c3,L) per dof
            ldl_tsolve(mr, anc, yv)
            for i in range(nd):
                x_s[pl.ds(i, 1), :, :] = yv[i][None]   # Y rows
            acc = _delassus_sym(x_s, invd_dyn, nd, c3, k, dtype, L,
                                sup_segs=st["sup_segs"])

        for _i in range(nsub):
            q = oq_ref[...]                            # (nq,L)
            v = ov_ref[...]                            # (nd,L)
            qfb, e, rhspd = _lane_pd_rhs(st, C, q, v, ctrl, bias,
                                         jkp_full, jkd_full, dtype)

            if st["sparse_ldl"]:
                # ---- stable-PD solve (engine.stable_pd_torque) ----------
                xpd = [rhspd[i:i + 1] for i in range(nd)]
                ldl_solve(mr_pd, invd_pd, anc, xpd)
                qacc_pd = jnp.concatenate(xpd, axis=0)  # (nd,L)
            else:
                # Dense blocked Cholesky: the PD and dynamics factorizations
                # are independent (both derive from mmat); interleave them so
                # the second rides in the first one's latency shadow.
                a_s[...] = mmat + jnp.where(eq, dt * jkd_full[:, None, :],
                                            0.0)
                a2_s[...] = mmat + jnp.where(
                    eq, dt * C["damping"][..., None], 0.0)
                _factor_multi([a_s, a2_s], nd)
                xpd_s[...] = rhspd[:, None, :]
                x_s[...] = jt
                _subst_multi([(a_s, xpd_s), (a2_s, x_s)], nd)
                qacc_pd = xpd_s[...][:, 0, :]          # (nd,L)

            torque = -jkp_full[6:] * e[6:] \
                - jkd_full[6:] * (v[6:] + dt * qacc_pd[6:])
            torque = jnp.clip(torque, -tlim, tlim)
            qfrc = jnp.concatenate([qfb[:6], qfb[6:] + torque * C["gear"]],
                                   axis=0)

            # ---- dynamics solve: qacc column + frozen contact operator --
            if st["sparse_ldl"]:
                dq = qfrc * dt
                x0 = [dq[i:i + 1] for i in range(nd)]
                ldl_solve(mr, invd_dyn, anc, x0)
                qacc_col = jnp.concatenate(x0, axis=0)
                v_pred = (v + qacc_col)[:, None, :]

                lam = _sweep_lam_from(acc, jf_s, tgt_s, mu_s, v_pred,
                                      k, iters, relax)
                u = jnp.sum(x_s[...] * lam[:, 0, :][None], axis=1,
                            keepdims=True)             # Y lam (nd,1,L)
                uv = [u[i, :, :] for i in range(nd)]
                ldl_fsolve(mr, invd_dyn, anc, uv)
                v_new = v + qacc_col + jnp.concatenate(uv, axis=0)
            else:
                xpd_s[...] = (qfrc * dt)[:, None, :]   # reuse for qacc col
                _subst_blocked(a2_s, xpd_s, nd)
                v_pred = v[:, None, :] + xpd_s[...]

                v_new = _contact_sweep(jf_s, tgt_s, mu_s, x_s, v_pred,
                                       nd, c3, k, iters, relax, xcol0=0,
                                       sup_segs=st["sup_segs"])[:, 0, :]

            oq_ref[...] = _lane_integrate(st, q, v_new, dtype)
            ov_ref[...] = v_new

    n_groups, rem = divmod(n_frames, rr)

    def group_body(_, carry):
        run_group(rr)
        return carry

    jax.lax.fori_loop(0, n_groups, group_body, 0)
    if rem:
        run_group(rem)


# ---------------------------------------------------------------------------
# batched wrapper + custom_vmap entry
# ---------------------------------------------------------------------------

def _packed_consts(st):
    """Packed per-model constant blocks fed to the kernel (numpy)."""
    nd = st["nd"]
    nb = st["nb"]
    ndc = np.zeros((nd, 8))
    ndc[:, 0] = st["armature"]
    ndc[:, 1] = st["damping"]
    ndc[6:, 2] = st["stiffness"][6:]
    ndc[6:, 3] = st["gear"]
    ndc[6:, 4] = st["jnt_lo"]
    ndc[6:, 5] = st["jnt_hi"]
    ndc[6:, 6] = st["jnt_limited"]
    ndc[:, 7] = st["cmass"][[st["dof_body"][d] for d in range(nd)]]
    anc = st["anc"].astype(np.float64)
    masks = np.concatenate([anc, anc.T * (1.0 - anc)], axis=1)
    bodyc = np.zeros((nb, 7))
    bodyc[:, 0] = st["mass"]
    for (i, j), idx in _SYMIDX.items():
        bodyc[:, 1 + idx] = st["inertia"][:, i, j]
    cpc = np.stack([st["cp_radius"], st["cp_mu"]], axis=1)
    m_vf, m_vb, m_ab, m_gdds = _tree_masks(st)
    treem = np.zeros((nd + 2 * nb, nd + nb))
    treem[0:nd, 0:nd] = m_vf
    treem[nd:nd + nb, 0:nd] = m_vb
    treem[nd + nb:nd + 2 * nb, 0:nd] = m_ab
    treem[0:nd, nd:nd + nb] = m_gdds
    # contact-point body one-hot PICK (+ PICK pre-scaled by the local
    # offset components): world points become 12 tiny MXU matmuls
    ncp = st["cp_local"].shape[0]
    pick = np.zeros((ncp, nb))
    pick[np.arange(ncp), [int(b) for b in st["cp_body"]]] = 1.0
    cppk = np.concatenate(
        [pick] + [pick * np.asarray(st["cp_local"])[:, j:j + 1]
                  for j in range(3)], axis=0)            # (4*ncp, nb)
    return ndc, masks, bodyc, cpc, treem, cppk


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _packed_pair_consts(st):
    """Per-model constants for the self-collision pair candidates.

    ``prpk`` ((4P+6Pb), 4nb): each row, matmul'd against the stacked
    coordinate block X_i = [xpos_i; rot_i0; rot_i1; rot_i2] (4nb, L), yields
    one world coordinate -- a point row [onehot_b | loc*onehot_b] gives
    xpos[b]_i + (R_b loc)_i, a rotation-only row [0 | u*onehot_b] gives
    (R_b u)_i.  Row blocks: seg-seg endpoints a1/b1/a2/b2 (4 x P), then box
    center / box axes x3 / seg endpoints a/b (6 x Pb).

    ``pairc`` (PP, 4): seg rows [rsum, rdiff, 0, 0]; box rows
    [rseg, h0, h1, h2]."""
    nb = st["nb"]
    P, Pb = st["npair"], st["nbpair"]

    def point_rows(bodies, locs):
        n = len(bodies)
        oh = np.zeros((n, nb))
        oh[np.arange(n), list(bodies)] = 1.0
        return np.concatenate(
            [oh] + [oh * np.asarray(locs)[:, j:j + 1] for j in range(3)],
            axis=1)                                       # (n, 4nb)

    def rot_rows(bodies, vecs):
        n = len(bodies)
        oh = np.zeros((n, nb))
        oh[np.arange(n), list(bodies)] = 1.0
        return np.concatenate(
            [np.zeros((n, nb))] + [oh * np.asarray(vecs)[:, j:j + 1]
                                   for j in range(3)], axis=1)

    blocks = []
    if P:
        blocks += [point_rows(st["pair_body1"], st["pair_a1"]),
                   point_rows(st["pair_body1"], st["pair_b1"]),
                   point_rows(st["pair_body2"], st["pair_a2"]),
                   point_rows(st["pair_body2"], st["pair_b2"])]
    if Pb:
        blocks.append(point_rows(st["bpair_body_box"], st["bpair_boxpos"]))
        rl = np.stack([_quat_to_mat_np(q) for q in st["bpair_boxquat"]])
        for mcol in range(3):
            blocks.append(rot_rows(st["bpair_body_box"], rl[:, :, mcol]))
        blocks += [point_rows(st["bpair_body_seg"], st["bpair_a"]),
                   point_rows(st["bpair_body_seg"], st["bpair_b"])]
    prpk = np.concatenate(blocks, axis=0)                 # (4P+6Pb, 4nb)
    pairc = np.zeros((P + Pb, 4))
    if P:
        pairc[:P, 0] = st["pair_rsum"]
        pairc[:P, 1] = st["pair_rdiff"]
    if Pb:
        pairc[P:, 0] = st["bpair_rseg"]
        pairc[P:, 1:4] = st["bpair_half"]
    return prpk, pairc

def _substep_tpu(m, params, n_frames, qpos, qvel, ctrl, jkp, jkd, tlim,
                 interpret=False):
    """qpos (B,nq), qvel (B,nd), ctrl (B,nu), jkp/jkd/tlim (B,nu) ->
    (qpos', qvel') via the substep-resident kernel."""
    st = _build_static(m, params)
    nd, nq, k = st["nd"], st["nq"], st["k"]
    kp = st["kp"]
    nu = nd - 6
    c3 = 3 * k + kp
    bsz = qpos.shape[0]
    dtype = qpos.dtype
    # lane-block width: 128 = one vreg of lanes per op; wider blocks put
    # 2+ vregs behind every op in the kernel's long dependent chains,
    # amortizing op-issue latency over more lanes (fewer grid steps on the
    # single sequential TensorCore) at the cost of VMEM.
    W = int(os.environ.get("EGOPOSE_SUBSTEP_LANES", str(LANES)))
    assert W % LANES == 0, "lane-block width must be a multiple of 128"
    pad = (-bsz) % W
    if pad:
        fill_q = jnp.zeros((pad, nq), dtype).at[:, 3].set(1.0)
        qpos = jnp.concatenate([qpos, fill_q], 0)
        qvel = jnp.concatenate([qvel, jnp.zeros((pad, nd), dtype)], 0)
        ctrl = jnp.concatenate([ctrl, jnp.zeros((pad, nu), dtype)], 0)
        one = jnp.ones((pad, nu), dtype)
        jkp = jnp.concatenate([jkp, one], 0)
        jkd = jnp.concatenate([jkd, one], 0)
        tlim = jnp.concatenate([tlim, one], 0)
    bp = qpos.shape[0]
    ncp = st["cp_local"].shape[0]
    ndc, masks, bodyc, cpc, treem, cppk = _packed_consts(st)

    col3 = lambda x: x.T[:, None, :]                   # (B,n) -> (n,1,B)
    bs2 = lambda d0: pl.BlockSpec((d0, W), lambda i: (0, i))
    bs3 = lambda d0, d1: pl.BlockSpec((d0, d1, W), lambda i: (0, 0, i))
    bsc = lambda d0, d1: pl.BlockSpec((d0, d1), lambda i: (0, 0))

    in_specs = [bs2(nq), bs2(nd), bs2(nu), bs3(nu, 1), bs3(nu, 1),
                bs3(nu, 1), bsc(nd, 8), bsc(nd, 2 * nd), bsc(st["nb"], 7),
                bsc(nd, ncp), bsc(ncp, 2),
                bsc(nd + 2 * st["nb"], nd + st["nb"]),
                bsc(4 * ncp, st["nb"])]
    inputs = [qpos.T, qvel.T, ctrl.T, col3(jkp), col3(jkd), col3(tlim),
              jnp.asarray(ndc, dtype), jnp.asarray(masks, dtype),
              jnp.asarray(bodyc, dtype), jnp.asarray(st["pdm"], dtype),
              jnp.asarray(cpc, dtype), jnp.asarray(treem, dtype),
              jnp.asarray(cppk, dtype)]
    if kp:
        prpk, pairc = _packed_pair_consts(st)
        PP = st["npair"] + st["nbpair"]
        in_specs += [bsc(prpk.shape[0], 4 * st["nb"]), bsc(nd, PP),
                     bsc(PP, 4)]
        inputs += [jnp.asarray(prpk, dtype),
                   jnp.asarray(st["pdm_pair"], dtype),
                   jnp.asarray(pairc, dtype)]

    out = pl.pallas_call(
        functools.partial(_substep_kernel, st=st, n_frames=n_frames,
                          iters=params.iters, relax=params.relax,
                          dtype=dtype),
        grid=(bp // W,),
        in_specs=in_specs,
        out_specs=[bs2(nq), bs2(nd)],
        out_shape=[jax.ShapeDtypeStruct((nq, bp), dtype),
                   jax.ShapeDtypeStruct((nd, bp), dtype)],
        scratch_shapes=[
            # dense-branch factor/substitution scratches are untouched in
            # sparse mode -- shrink them to a token row to free ~5 MB VMEM
            pltpu.VMEM((1, 1, W) if st["sparse_ldl"]
                       else (nd, nd, W), dtype),
            pltpu.VMEM((1, 1, W) if st["sparse_ldl"]
                       else (nd, nd, W), dtype),
            pltpu.VMEM((nd, c3, W), dtype),
            pltpu.VMEM((1, 1, W) if st["sparse_ldl"]
                       else (nd, 1, W), dtype),
            pltpu.VMEM((c3, nd, W), dtype),
            pltpu.VMEM((c3, 1, W), dtype),
            pltpu.VMEM((k, 1, W), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
    return out[0].T[:bsz], out[1].T[:bsz]


def make_substep_step(m, n_frames: int, params):
    """Build a custom-vmapped control step: single-env calls fall back to the
    engine's split path; vmapped batches on TPU dispatch to the resident
    kernel."""
    from . import engine

    split_params = params._replace(substep_resident=False)

    @jax.custom_batching.custom_vmap
    def ctrl_step(qpos, qvel, ctrl, jkp, jkd, tlim):
        return engine.pd_control_step(m, qpos, qvel, ctrl, jkp, jkd, tlim,
                                      n_frames, split_params)

    @ctrl_step.def_vmap
    def _rule(axis_size, in_batched, qpos, qvel, ctrl, jkp, jkd, tlim):
        args = [qpos, qvel, ctrl, jkp, jkd, tlim]
        for i, (arg, b) in enumerate(zip(args, in_batched)):
            if not b:
                args[i] = jnp.broadcast_to(arg, (axis_size,) + arg.shape)
        on_tpu = any(d.platform == "tpu" for d in jax.devices()) or \
            jax.default_backend() in ("tpu", "axon")
        if on_tpu:
            out = _substep_tpu(m, params, n_frames, *args)
        else:
            out = jax.vmap(lambda qp, qv, c, p_, d_, t_:
                           engine.pd_control_step(m, qp, qv, c, p_, d_, t_,
                                                  n_frames, split_params))(
                *args)
        return out, (True, True)

    return ctrl_step
