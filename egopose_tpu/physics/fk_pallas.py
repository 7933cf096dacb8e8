"""Lane-major forward kinematics as a Pallas TPU kernel (experimental).

The traversal is statically unrolled from the model's hashable topology
(PhysicsModel meta fields) with batch lanes on the vector dimension; the only
HBM traffic is qpos in / (xpos, xquat, com, s) out.  Bit-exact vs engine.fk
(tests/test_fk_pallas.py) and 2.2x faster *standalone* on v5e at B=1024
(1.10 ms vs 2.41 ms).

NOT wired into the engine: inside the jitted substep XLA fuses engine.fk
with its consumers (effective cost ~0.55 ms there), so this kernel loses
in context -- the same finding as the pd_fused mega-kernel (engine.py).
Kept as the building block if a future full-substep-resident kernel
(fk+CRBA+RNEA+solve in one program, substep loop in VMEM) is attempted;
see the perf notes in BASELINE.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


# ---- quaternion helpers on (rows, L) arrays --------------------------------

def _qmul(a, b):
    """Hamilton product; a, b (4, L) -> (4, L)."""
    aw, ax, ay, az = a[0:1], a[1:2], a[2:3], a[3:4]
    bw, bx, by, bz = b[0:1], b[1:2], b[2:3], b[3:4]
    return jnp.concatenate([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=0)


def _cross(a, b):
    """a, b (3, L) -> (3, L)."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ], axis=0)


def _qrot(q, v):
    """Rotate v (3,L) by quaternion q (4,L) (matches ops.quat.quat_rotate)."""
    u = q[1:4]
    t = 2.0 * _cross(u, v)
    return v + q[0:1] * t + _cross(u, t)


def _axis_angle_quat(axis_const, angle):
    """axis (3,) static numpy unit vector, angle (1, L) -> (4, L)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.concatenate(
        [c, axis_const[0] * s, axis_const[1] * s, axis_const[2] * s], axis=0)


def _fk_kernel(qpos_ref, xpos_ref, xquat_ref, com_ref, s_ref,
               topo, dtype):
    """Kernel wrapper: reads qpos, delegates to the pure _fk_compute."""
    xpos, xquat, com, s = _fk_compute(qpos_ref[...][:, 0, :], topo, dtype)
    xpos_ref[...] = xpos
    xquat_ref[...] = xquat
    com_ref[...] = com
    s_ref[...] = s


def _fk_compute(q, topo, dtype):
    """Pure lane-major FK on a (nq, L) qpos array; returns lane-major
    (nb,3,L), (nb,4,L), (nb,3,L), (nd,6,L).  Shared by the Pallas kernel and
    the tests (which run it as plain jax ops -- no interpret overhead)."""
    (parent, body_pos, body_ipos, body_dofs, dof_axis, dof_anchor) = topo
    L = q.shape[-1]
    nb = len(parent)

    # root free joint
    rq_raw = q[3:7]
    norm = jnp.sqrt(jnp.sum(rq_raw * rq_raw, axis=0, keepdims=True))
    root_q = rq_raw / jnp.maximum(norm, 1e-12)
    root_t = q[0:3]

    zeros1 = jnp.zeros((1, L), dtype)
    ones1 = jnp.ones((1, L), dtype)

    wq = [None] * nb
    wt = [None] * nb
    wq[0] = root_q
    wt[0] = root_t
    s_rows = {}
    # translational dofs: S = [0; e_i]
    for i in range(3):
        e = [zeros1] * 3
        e[i] = ones1
        s_rows[i] = jnp.concatenate([zeros1, zeros1, zeros1] + e, axis=0)
    # rotational dofs: world axis = R(root_q) e_i ; lin = t x axis
    for i in range(3):
        e_np = np.zeros(3)
        e_np[i] = 1.0
        axis_w = _qrot(root_q, jnp.concatenate(
            [ones1 * e_np[0], ones1 * e_np[1], ones1 * e_np[2]], axis=0))
        s_rows[3 + i] = jnp.concatenate(
            [axis_w, _cross(root_t, axis_w)], axis=0)

    for b in range(1, nb):
        p = parent[b]
        bq = wq[p]
        bp = body_pos[b]
        bt = wt[p] + _qrot(bq, jnp.concatenate(
            [ones1 * bp[0], ones1 * bp[1], ones1 * bp[2]], axis=0))
        for d in body_dofs[b]:
            a_np = dof_axis[d]
            c_np = dof_anchor[d]
            c_vec = jnp.concatenate(
                [ones1 * c_np[0], ones1 * c_np[1], ones1 * c_np[2]], axis=0)
            angle = q[d + 1:d + 2]
            axis_w = _qrot(bq, jnp.concatenate(
                [ones1 * a_np[0], ones1 * a_np[1], ones1 * a_np[2]], axis=0))
            anchor_w = bt + _qrot(bq, c_vec)
            s_rows[d] = jnp.concatenate(
                [axis_w, _cross(anchor_w, axis_w)], axis=0)
            r = _axis_angle_quat(a_np, angle)
            bq = _qmul(bq, r)
            bt = anchor_w - _qrot(bq, c_vec)
        wq[b] = bq
        wt[b] = bt

    xpos = jnp.stack([wt[b] for b in range(nb)], axis=0)    # (nb,3,L)
    xquat = jnp.stack([wq[b] for b in range(nb)], axis=0)   # (nb,4,L)
    com_rows = []
    for b in range(nb):
        ipb = jnp.concatenate([ones1 * float(body_ipos[b, 0]),
                               ones1 * float(body_ipos[b, 1]),
                               ones1 * float(body_ipos[b, 2])], axis=0)
        com_rows.append(wt[b] + _qrot(wq[b], ipb))
    com = jnp.stack(com_rows, axis=0)
    s = jnp.stack([s_rows[d] for d in range(len(dof_axis))], axis=0)
    return xpos, xquat, com, s


def _levels(parent):
    """Static body groups by tree depth, each sorted by dof count descending
    (so every dof step within a level operates on a prefix slice)."""
    nb = len(parent)
    depth = [0] * nb
    for b in range(1, nb):
        depth[b] = depth[parent[b]] + 1
    groups = {}
    for b in range(1, nb):
        groups.setdefault(depth[b], []).append(b)
    return [groups[d] for d in sorted(groups)]


def _const_rows(vals, L, dtype):
    """(1, len(vals), L) from static python floats (splat + concat)."""
    return jnp.concatenate(
        [jnp.full((1, 1, L), float(v), dtype) for v in vals], axis=1)


def _fk_compute_lvl(q, topo, dtype):
    """Level-batched FK, bit-exact vs _fk_compute (same formulas on the
    same per-element operands, just stored in (rows, m, L) batches).

    _fk_compute walks bodies one at a time: every quaternion op touches
    1-4 sublane rows of an 8-row vreg, so the traversal pays for ~8x the
    rows it uses.  Here (a) bodies at the same tree depth advance together
    -- one (4,m,L) op per level instead of m (4,L) ops -- and (b) the
    screw-axis rows for ALL joint dofs are built in one (nd-6)-wide
    batch after the chain (the per-dof pre-rotation quats and world
    anchors are collected during the walk), which removes the ~52
    single-row qrot/cross chains that dominate the sequential version."""
    (parent, body_pos, body_ipos, body_dofs, dof_axis, dof_anchor) = topo
    L = q.shape[-1]
    nb = len(parent)
    nd = len(dof_axis)
    lv = _levels(parent)

    rq_raw = q[3:7]
    norm = jnp.sqrt(jnp.sum(rq_raw * rq_raw, axis=0, keepdims=True))
    root_q = rq_raw / jnp.maximum(norm, 1e-12)
    root_t = q[0:3]

    zeros1 = jnp.zeros((1, L), dtype)
    ones1 = jnp.ones((1, L), dtype)

    # root screw rows (identical to _fk_compute)
    s_rows = {}
    for i in range(3):
        e = [zeros1] * 3
        e[i] = ones1
        s_rows[i] = jnp.concatenate([zeros1, zeros1, zeros1] + e, axis=0)
    for i in range(3):
        e_np = np.zeros(3)
        e_np[i] = 1.0
        axis_w = _qrot(root_q, jnp.concatenate(
            [ones1 * e_np[0], ones1 * e_np[1], ones1 * e_np[2]], axis=0))
        s_rows[3 + i] = jnp.concatenate(
            [axis_w, _cross(root_t, axis_w)], axis=0)

    wq = [None] * nb                                    # (4,1,L) per body
    wt = [None] * nb                                    # (3,1,L) per body
    wq[0] = root_q[:, None, :]
    wt[0] = root_t[:, None, :]
    bq_pre = [None] * nd                                # quat before dof
    anch_w = [None] * nd                                # world anchor at dof

    for bs in lv:
        bs = sorted(bs, key=lambda b: -len(body_dofs[b]))
        m = len(bs)
        bq = jnp.concatenate([wq[parent[b]] for b in bs], axis=1)  # (4,m,L)
        pt = jnp.concatenate([wt[parent[b]] for b in bs], axis=1)  # (3,m,L)
        bp = jnp.concatenate([_const_rows([body_pos[b][i] for b in bs],
                                          L, dtype) for i in range(3)],
                             axis=0)                               # (3,m,L)
        bt = pt + _qrot(bq, bp)
        for s in range(max(len(body_dofs[b]) for b in bs)):
            sub = [b for b in bs if len(body_dofs[b]) > s]
            ms = len(sub)                               # prefix by sorting
            dofs = [body_dofs[b][s] for b in sub]
            bq_p, bt_p = bq[:, :ms, :], bt[:, :ms, :]
            c_vec = jnp.concatenate(
                [_const_rows([dof_anchor[d][i] for d in dofs], L, dtype)
                 for i in range(3)], axis=0)            # (3,ms,L)
            anchor_w = bt_p + _qrot(bq_p, c_vec)
            for i, d in enumerate(dofs):
                bq_pre[d] = bq_p[:, i:i + 1, :]
                anch_w[d] = anchor_w[:, i:i + 1, :]
            angle = jnp.stack([q[d + 1:d + 2] for d in dofs], axis=1)
            half = 0.5 * angle                          # (1,ms,L)
            sn = jnp.sin(half)
            r = jnp.concatenate(
                [jnp.cos(half)]
                + [_const_rows([dof_axis[d][i] for d in dofs], L, dtype)
                   * sn for i in range(3)], axis=0)     # (4,ms,L)
            bq_new = _qmul(bq_p, r)
            bt_new = anchor_w - _qrot(bq_new, c_vec)
            if ms == m:
                # Mosaic rejects the zero-size tail slice a concatenate
                # would produce when every body at this level advances
                bq, bt = bq_new, bt_new
            else:
                bq = jnp.concatenate([bq_new, bq[:, ms:, :]], axis=1)
                bt = jnp.concatenate([bt_new, bt[:, ms:, :]], axis=1)
        for i, b in enumerate(bs):
            wq[b] = bq[:, i:i + 1, :]
            wt[b] = bt[:, i:i + 1, :]

    xpos = jnp.stack([wt[b][:, 0, :] for b in range(nb)], axis=0)
    xquat = jnp.stack([wq[b][:, 0, :] for b in range(nb)], axis=0)

    # com for all bodies in one batched rotate
    wq_all = jnp.concatenate(wq, axis=1)                # (4,nb,L)
    wt_all = jnp.concatenate(wt, axis=1)                # (3,nb,L)
    ip = jnp.concatenate([_const_rows([body_ipos[b, i] for b in range(nb)],
                                      L, dtype) for i in range(3)], axis=0)
    com_b = wt_all + _qrot(wq_all, ip)                  # (3,nb,L)
    com = jnp.stack([com_b[:, b, :] for b in range(nb)], axis=0)

    # screw rows for all joint dofs in one batched rotate/cross
    jd = list(range(6, nd))
    bq_stack = jnp.concatenate([bq_pre[d] for d in jd], axis=1)
    an_stack = jnp.concatenate([anch_w[d] for d in jd], axis=1)
    ax = jnp.concatenate([_const_rows([dof_axis[d][i] for d in jd],
                                      L, dtype) for i in range(3)], axis=0)
    axis_w = _qrot(bq_stack, ax)                        # (3,nd-6,L)
    lin_w = _cross(an_stack, axis_w)
    for i, d in enumerate(jd):
        s_rows[d] = jnp.concatenate(
            [axis_w[:, i, :], lin_w[:, i, :]], axis=0)
    s = jnp.stack([s_rows[d] for d in range(nd)], axis=0)
    return xpos, xquat, com, s


def _build_topo(m):
    """Static topology tuple (numpy/python only, hashable by id)."""
    nb, nd = m.nbody, m.ndof
    body_dofs = [[] for _ in range(nb)]
    for d in range(6, nd):
        body_dofs[m.dof_body[d]].append(d)
    return (tuple(m.parent),
            np.asarray(m.body_pos),
            np.asarray(m.body_ipos),
            tuple(tuple(x) for x in body_dofs),
            np.asarray(m.dof_axis),
            np.asarray(m.dof_anchor))


def fk_batched_tpu(m, qpos, interpret=False):
    """qpos (B, nq) -> (xpos (B,nb,3), xquat (B,nb,4), com (B,nb,3),
    s (B,nd,6)) via the lane-major kernel."""
    nb, nd, nq = m.nbody, m.ndof, m.nq
    bsz = qpos.shape[0]
    dtype = qpos.dtype
    pad = (-bsz) % LANES
    if pad:
        fill = jnp.zeros((pad, nq), dtype).at[:, 3].set(1.0)
        qpos = jnp.concatenate([qpos, fill], 0)
    bp = qpos.shape[0]
    qt = qpos.T[:, None, :]                                  # (nq,1,B)

    topo = _build_topo(m)
    bs3 = lambda d0, d1: pl.BlockSpec((d0, d1, LANES), lambda i: (0, 0, i))
    outs = pl.pallas_call(
        functools.partial(_fk_kernel, topo=topo, dtype=dtype),
        grid=(bp // LANES,),
        in_specs=[bs3(nq, 1)],
        out_specs=[bs3(nb, 3), bs3(nb, 4), bs3(nb, 3), bs3(nd, 6)],
        out_shape=[jax.ShapeDtypeStruct((nb, 3, bp), dtype),
                   jax.ShapeDtypeStruct((nb, 4, bp), dtype),
                   jax.ShapeDtypeStruct((nb, 3, bp), dtype),
                   jax.ShapeDtypeStruct((nd, 6, bp), dtype)],
        interpret=interpret,
    )(qt)
    xpos, xquat, com, s = (o.transpose(2, 0, 1)[:bsz] for o in outs)
    return xpos, xquat, com, s
