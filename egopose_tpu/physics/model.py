"""PhysicsModel: the on-device, jit-static representation of a ModelSpec.

Tree topology (parents, dof->body map, ancestor masks) is kept as *static*
Python data so kinematic loops unroll at trace time; numeric parameters are
jnp arrays.  The model is registered as a pytree whose leaves are only the
numeric arrays, so a jitted function specializes on topology but not on
parameter values.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ModelSpec, parse_mjcf

# segment-box narrowphase: fixed 1-D minimization budget, shared by the
# split path (engine.pair_candidates) and the resident kernel
# (substep_pallas._pair_narrowphase) so both produce identical contacts.
# Golden-section needs ONE sdist eval per shrink after the first two
# (ternary needs two), so the same bracket accuracy costs half the evals:
# 10 evals shrink the bracket to phi^-(10-1) ~ 1.3% of the segment, at
# least as tight as the retired 10-iteration ternary ((2/3)^10 ~ 1.7%).
# Depth error is quadratic in the bracket (the minimized signed distance
# is locally convex in t); the crossed-thighs/arms-folded goldens track
# MuJoCo C identically for budgets in [10, 32].
GOLDEN_EVALS = 10
_GR = 0.6180339887498949  # 1/phi


def golden_min01(sdist, shape, dtype):
    """Branchless batched golden-section minimization of ``sdist`` over
    t in [0,1]: returns the best interior point.  Pure jax.numpy, so the
    same code traces identically in the split-path engine and inside the
    Pallas kernel."""
    a = jnp.zeros(shape, dtype)
    b = jnp.ones(shape, dtype)
    c = b - _GR * (b - a)
    d = a + _GR * (b - a)
    fc = sdist(c)
    fd = sdist(d)
    for _ in range(GOLDEN_EVALS - 2):
        take = fc < fd                       # minimum lies in [a, d]
        a = jnp.where(take, a, c)
        b = jnp.where(take, d, b)
        x_keep = jnp.where(take, c, d)       # surviving interior point
        f_keep = jnp.where(take, fc, fd)
        x_new = jnp.where(take, b - _GR * (b - a), a + _GR * (b - a))
        f_new = sdist(x_new)
        c = jnp.where(take, x_new, x_keep)
        d = jnp.where(take, x_keep, x_new)
        fc = jnp.where(take, f_new, f_keep)
        fd = jnp.where(take, f_keep, f_new)
    return jnp.where(fc < fd, c, d)


@partial(jax.tree_util.register_dataclass,
         data_fields=["body_pos", "body_mass", "body_ipos", "body_inertia",
                      "dof_axis", "dof_anchor", "dof_armature", "dof_damping",
                      "dof_stiffness", "jnt_range", "jnt_limited_f",
                      "geom_pos", "geom_quat",
                      "geom_size", "geom_friction", "gravity", "actuator_gear",
                      "timestep", "anc_mask", "body_dof_mask",
                      "body_desc_mask", "vp_mask",
                      "point_dof_mask", "cpoint_body", "cpoint_local",
                      "cpoint_radius", "cpoint_mu",
                      "pair_body1", "pair_body2", "pair_a1", "pair_b1",
                      "pair_a2", "pair_b2", "pair_rsum", "pair_rdiff",
                      "pair_dof_mask",
                      "bpair_body_seg", "bpair_body_box", "bpair_a",
                      "bpair_b", "bpair_rseg", "bpair_boxpos",
                      "bpair_boxquat", "bpair_half", "bpair_dof_mask",
                      "level_body", "level_parent", "level_bodypos",
                      "level_axis", "level_anchor", "level_qpos_idx",
                      "level_dof_idx"],
         meta_fields=["nbody", "ndof", "nq", "nu", "ngeom", "ncpoint",
                      "npair", "nbpair", "pair_blocks", "bpair_blocks",
                      "parent", "dof_body", "dof_jnt_index", "geom_body",
                      "geom_type", "actuator_dof", "jnt_limited"])
@dataclasses.dataclass(frozen=True)
class PhysicsModel:
    # --- static topology (hashable, specializes the trace) ---
    nbody: int
    ndof: int
    nq: int
    nu: int
    ngeom: int
    ncpoint: int
    npair: int               # sphere/capsule body-body collision pairs
    nbpair: int              # segment-box body-body collision pairs
    pair_blocks: tuple       # ((start,end),...) selection blocks over the
                             # class-sorted seg-seg pairs (_pair_blocks_np)
    bpair_blocks: tuple      # same over the seg-box pairs
    parent: tuple            # (nb,)
    dof_body: tuple          # (nd,)
    dof_jnt_index: tuple     # (nd,) index of hinge within its body (0..2), -1 for free dofs
    geom_body: tuple
    geom_type: tuple
    actuator_dof: tuple
    jnt_limited: tuple
    # --- numeric parameters (pytree leaves) ---
    body_pos: jax.Array
    body_mass: jax.Array
    body_ipos: jax.Array
    body_inertia: jax.Array
    dof_axis: jax.Array
    dof_anchor: jax.Array
    dof_armature: jax.Array
    dof_damping: jax.Array
    dof_stiffness: jax.Array
    jnt_range: jax.Array
    jnt_limited_f: jax.Array   # (nd-6,) 1.0 where limited
    geom_pos: jax.Array
    geom_quat: jax.Array
    geom_size: jax.Array
    geom_friction: jax.Array
    gravity: jax.Array
    actuator_gear: jax.Array
    timestep: jax.Array
    # --- precomputed topology masks (0/1 floats; drive masked matmuls so the
    #     tree algorithms compile to a handful of big fused ops instead of
    #     hundreds of unrolled scalar ops) ---
    anc_mask: jax.Array        # (nd,nd) anc[i,j]=1 iff body(j) anc-or-self of body(i)
    body_dof_mask: jax.Array   # (nb,nd) 1 iff dof d on the path root->body b
    body_desc_mask: jax.Array  # (nb,nb) desc[b,c]=1 iff c in subtree of b (incl.)
    vp_mask: jax.Array         # (nd,nd) velocity-product frame mask (see engine.bias_force)
    point_dof_mask: jax.Array  # (nd,K) 1 iff contact point k is in dof d's subtree
    # --- level-batched FK tables (L levels, Bmax bodies/level, 3 hinge slots;
    #     padded entries index the dummy tail row) ---
    level_body: jax.Array      # (L,Bmax) int body index, pad=nb
    level_parent: jax.Array    # (L,Bmax) int parent body index, pad=nb
    level_bodypos: jax.Array   # (L,Bmax,3)
    level_axis: jax.Array      # (L,Bmax,3,3) local hinge axes per slot (pad z)
    level_anchor: jax.Array    # (L,Bmax,3,3) local anchors per slot (pad 0)
    level_qpos_idx: jax.Array  # (L,Bmax,3) int qpos index per slot, pad=nq
    level_dof_idx: jax.Array   # (L,Bmax,3) int dof index per slot, pad=nd
    # --- contact candidate points (vs the floor plane) ---
    cpoint_body: jax.Array     # (K,) int body index
    cpoint_local: jax.Array    # (K,3) body-frame position
    cpoint_radius: jax.Array   # (K,)
    cpoint_mu: jax.Array       # (K,) sliding friction
    # --- body-body collision pairs (self-collision; the geom pairs MuJoCo's
    #     contype/conaffinity + parent-child filter enables on this model,
    #     see /root/reference/assets/mujoco_models/humanoid_1205_v1.xml:11
    #     and mujoco_env.py's MjSim stepping which resolves them) ---
    # sphere/capsule vs sphere/capsule: segment-segment distance.  Normal
    # points from body2 toward body1.
    pair_body1: jax.Array      # (P,) int
    pair_body2: jax.Array      # (P,) int
    pair_a1: jax.Array         # (P,3) segment endpoints, body1 frame
    pair_b1: jax.Array         # (P,3)
    pair_a2: jax.Array         # (P,3) body2 frame
    pair_b2: jax.Array         # (P,3)
    pair_rsum: jax.Array       # (P,) r1 + r2
    pair_rdiff: jax.Array      # (P,) r1 - r2 (surface-midpoint contact pos)
    pair_dof_mask: jax.Array   # (nd,P) signed: +1 path->body1 only, -1 body2
    # sphere/capsule vs box: segment-box distance.  Normal box -> segment.
    bpair_body_seg: jax.Array  # (Pb,) int (plays body1)
    bpair_body_box: jax.Array  # (Pb,) int (plays body2)
    bpair_a: jax.Array         # (Pb,3) segment endpoints, seg-body frame
    bpair_b: jax.Array         # (Pb,3)
    bpair_rseg: jax.Array      # (Pb,)
    bpair_boxpos: jax.Array    # (Pb,3) box center, box-body frame
    bpair_boxquat: jax.Array   # (Pb,4) box orientation, box-body frame
    bpair_half: jax.Array      # (Pb,3) box half-sizes
    bpair_dof_mask: jax.Array  # (nd,Pb) signed: +1 seg body, -1 box body

    @property
    def nv(self) -> int:
        return self.ndof


def _candidate_points_np(spec: ModelSpec):
    """Contact candidates vs the floor plane: sphere centers, capsule
    endpoints, box corners -- (body, local pos, radius, mu) per point."""
    from .spec import GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX
    pts = []
    for g in range(spec.ngeom):
        b = int(spec.geom_body[g])
        t = int(spec.geom_type[g])
        gs = spec.geom_size[g]
        if t == GEOM_SPHERE:
            offs = [np.zeros(3)]
            rad = gs[0]
        elif t == GEOM_CAPSULE:
            offs = [np.array([0.0, 0.0, s * gs[1]]) for s in (-1.0, 1.0)]
            rad = gs[0]
        elif t == GEOM_BOX:
            offs = [np.array([sx * gs[0], sy * gs[1], sz * gs[2]])
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
            rad = 0.0
        else:
            continue
        from .spec import _quat_to_mat_np
        rm = _quat_to_mat_np(spec.geom_quat[g])
        # friction combination: MuJoCo takes the max of the two geoms'
        # sliding friction; the floor has friction 1.0 in the EgoPose model
        mu = max(float(spec.geom_friction[g][0]), float(spec.floor_friction[0]))
        for o in offs:
            pts.append((b, spec.geom_pos[g] + rm @ o, rad, mu))
    body = np.array([p[0] for p in pts], dtype=np.int32)
    local = np.stack([p[1] for p in pts])
    radius = np.array([p[2] for p in pts])
    mu = np.array([p[3] for p in pts])
    return body, local, radius, mu


def _geom_segment_np(spec: ModelSpec, g: int):
    """Body-frame segment representation of a sphere/capsule geom:
    (endpoint_a (3,), endpoint_b (3,), radius).  None for other types."""
    from .spec import GEOM_SPHERE, GEOM_CAPSULE
    from .spec import _quat_to_mat_np
    t = int(spec.geom_type[g])
    if t == GEOM_SPHERE:
        return spec.geom_pos[g].copy(), spec.geom_pos[g].copy(), \
            float(spec.geom_size[g][0])
    if t == GEOM_CAPSULE:
        rm = _quat_to_mat_np(spec.geom_quat[g])
        off = rm @ np.array([0.0, 0.0, float(spec.geom_size[g][1])])
        return spec.geom_pos[g] - off, spec.geom_pos[g] + off, \
            float(spec.geom_size[g][0])
    return None


def _limb_regions(spec: ModelSpec) -> np.ndarray:
    """Anatomical region label per body, from topology alone: a body's
    region root is its highest ancestor whose parent is the root or a
    branching body (>=2 children).  On the EgoPose humanoid this yields
    {Hips}, {Spine..Spine3}, {Neck,Head}, the two arm chains and the two
    leg chains -- the natural co-activation groups for contact-pair
    selection (two simultaneous self-contacts almost always involve
    different region pairs)."""
    nb = spec.nbody
    nchild = np.zeros(nb, dtype=int)
    for b in range(1, nb):
        nchild[spec.parent[b]] += 1
    region = np.zeros(nb, dtype=np.int64)
    for b in range(1, nb):
        a = b
        while spec.parent[a] != 0 and nchild[spec.parent[a]] < 2:
            a = spec.parent[a]
        region[b] = a
    # relabel to dense 0..R-1 (root keeps its own region)
    uniq = {r: i for i, r in enumerate(sorted(set(region.tolist())))}
    return np.array([uniq[r] for r in region.tolist()])


PAIR_BLOCK_MAX = 16  # max pairs per selection block (runs longer than this
                     # split; keeps per-block reductions 1-2 sublane tiles)


def _pair_blocks_np(classes) -> tuple:
    """Contiguous (start, end) selection blocks over a CLASS-SORTED pair
    list: one block per run of equal class ids, long runs split at
    PAIR_BLOCK_MAX.  Used by the two-stage (block argmax -> top-KP over
    block winners) contact-pair selection in engine.contact_blocks and the
    resident kernel."""
    blocks = []
    i, n = 0, len(classes)
    while i < n:
        j = i
        while j < n and classes[j] == classes[i]:
            j += 1
        for a in range(i, j, PAIR_BLOCK_MAX):
            blocks.append((a, min(a + PAIR_BLOCK_MAX, j)))
        i = j
    # merge small adjacent blocks (class-sorted order keeps merged classes
    # anatomically similar); bounds block count without losing granularity
    # on the big classes
    merged = []
    for a, b in blocks:
        if merged and (b - merged[-1][0]) <= PAIR_BLOCK_MAX // 2:
            merged[-1] = (merged[-1][0], b)
        else:
            merged.append((a, b))
    return tuple(merged)


def _collision_pairs_np(spec: ModelSpec):
    """Enumerate body-body geom pairs using MuJoCo's collision filter
    (mj_collision semantics): different bodies, bodies not parent-child,
    (contype1 & conaffinity2) | (contype2 & conaffinity1) nonzero.  On the
    EgoPose humanoid this enables everything except leg-vs-leg (legs/feet
    carry contype/conaffinity 1 and 2, humanoid_1205_v1.xml:112-130) and
    adjacent links.

    Splits into two shape classes: segment-segment (sphere/capsule pairs)
    and segment-box (the feet boxes vs upper-body geoms).  Box-box pairs do
    not occur in the model family (the two feet are in disjoint contact
    groups) and are skipped.  All body-body pairs in the reference model are
    condim=1 (frictionless, humanoid_1205_v1.xml:11), so pair contacts are
    resolved normal-only; a condim>=3 body-body pair would also be resolved
    frictionless (documented deviation)."""
    from .spec import GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX
    segseg = []
    segbox = []
    segtypes = (GEOM_SPHERE, GEOM_CAPSULE)
    region = _limb_regions(spec)
    for g1 in range(spec.ngeom):
        for g2 in range(g1 + 1, spec.ngeom):
            b1, b2 = int(spec.geom_body[g1]), int(spec.geom_body[g2])
            if b1 == b2:
                continue
            if spec.parent[b1] == b2 or spec.parent[b2] == b1:
                continue
            ct1, ca1 = int(spec.geom_contype[g1]), int(spec.geom_conaffinity[g1])
            ct2, ca2 = int(spec.geom_contype[g2]), int(spec.geom_conaffinity[g2])
            if not ((ct1 & ca2) or (ct2 & ca1)):
                continue
            t1, t2 = int(spec.geom_type[g1]), int(spec.geom_type[g2])
            if t1 in segtypes and t2 in segtypes:
                a1, e1, r1 = _geom_segment_np(spec, g1)
                a2, e2, r2 = _geom_segment_np(spec, g2)
                segseg.append((b1, b2, a1, e1, a2, e2, r1, r2))
            elif GEOM_BOX in (t1, t2) and (t1 in segtypes or t2 in segtypes):
                gs, gb = (g1, g2) if t2 == GEOM_BOX else (g2, g1)
                bs, bb = int(spec.geom_body[gs]), int(spec.geom_body[gb])
                a, e, r = _geom_segment_np(spec, gs)
                segbox.append((bs, bb, a, e, r, spec.geom_pos[gb],
                               spec.geom_quat[gb], spec.geom_size[gb]))
            # box-box / plane pairs: none in the model family, skipped
    # sort by anatomical region-pair class so selection blocks are
    # contiguous runs (_pair_blocks_np); stable within a class
    klass = lambda p: (min(region[p[0]], region[p[1]]),
                       max(region[p[0]], region[p[1]]))
    segseg.sort(key=klass)
    segbox.sort(key=klass)
    return (segseg, segbox,
            _pair_blocks_np([klass(p) for p in segseg]),
            _pair_blocks_np([klass(p) for p in segbox]))


def build_model(spec: ModelSpec, dtype=jnp.float32) -> PhysicsModel:
    """Compile a host ModelSpec into an on-device PhysicsModel."""
    # per-body hinge ordering (needed to compose multi-hinge bodies in order)
    dof_jnt_index = np.full(spec.ndof, -1, dtype=np.int64)
    count: dict = {}
    for d in range(6, spec.ndof):
        b = int(spec.dof_body[d])
        dof_jnt_index[d] = count.get(b, 0)
        count[b] = dof_jnt_index[d] + 1

    nd = spec.ndof
    anc = spec.dof_ancestor_mask()                      # (nd,nd) bool
    body_anc = spec.ancestors_inclusive()               # (nb,nb) bool
    body_dof = body_anc[:, spec.dof_body]               # (nb,nd)

    # velocity-product frame mask (which dofs' velocities move dof d's axis):
    #  - free translational dofs (0..2): world-fixed axes -> no contribution
    #  - free rotational dofs (3..5): fixed in the child body -> all 6 root dofs
    #  - hinge dofs: parent path + earlier dofs of the same body
    vp = anc.copy()
    dof_body = spec.dof_body
    for d in range(nd):
        if d < 3:
            vp[d, :] = False
        elif d < 6:
            vp[d, :] = False
            vp[d, 0:6] = True
        else:
            for e in range(6, nd):
                if dof_body[e] == dof_body[d] and e > d:
                    vp[d, e] = False

    cp_body, cp_local, cp_radius, cp_mu = _candidate_points_np(spec)
    point_dof = body_anc[cp_body][:, spec.dof_body].T   # (nd,K)

    # ---- body-body collision pairs ---------------------------------------
    segseg, segbox, pair_blocks, bpair_blocks = _collision_pairs_np(spec)
    body_dof_f = body_anc[:, spec.dof_body].astype(np.float64)  # (nb,nd)
    npair, nbpair = len(segseg), len(segbox)
    p_b1 = np.array([p[0] for p in segseg], dtype=np.int32)
    p_b2 = np.array([p[1] for p in segseg], dtype=np.int32)
    p_a1 = np.stack([p[2] for p in segseg]) if npair else np.zeros((0, 3))
    p_e1 = np.stack([p[3] for p in segseg]) if npair else np.zeros((0, 3))
    p_a2 = np.stack([p[4] for p in segseg]) if npair else np.zeros((0, 3))
    p_e2 = np.stack([p[5] for p in segseg]) if npair else np.zeros((0, 3))
    p_rs = np.array([p[6] + p[7] for p in segseg])
    p_rd = np.array([p[6] - p[7] for p in segseg])
    p_dm = (body_dof_f[p_b1] - body_dof_f[p_b2]).T if npair \
        else np.zeros((nd, 0))
    bp_bs = np.array([p[0] for p in segbox], dtype=np.int32)
    bp_bb = np.array([p[1] for p in segbox], dtype=np.int32)
    bp_a = np.stack([p[2] for p in segbox]) if nbpair else np.zeros((0, 3))
    bp_e = np.stack([p[3] for p in segbox]) if nbpair else np.zeros((0, 3))
    bp_r = np.array([p[4] for p in segbox])
    bp_pos = np.stack([p[5] for p in segbox]) if nbpair else np.zeros((0, 3))
    bp_quat = np.stack([p[6] for p in segbox]) if nbpair \
        else np.zeros((0, 4))
    bp_half = np.stack([p[7] for p in segbox]) if nbpair else np.zeros((0, 3))
    bp_dm = (body_dof_f[bp_bs] - body_dof_f[bp_bb]).T if nbpair \
        else np.zeros((nd, 0))

    # ---- level-batched FK tables -----------------------------------------
    nb = spec.nbody
    depth = np.zeros(nb, dtype=int)
    for b in range(1, nb):
        depth[b] = depth[spec.parent[b]] + 1
    nlevel = int(depth.max())
    levels = [[b for b in range(1, nb) if depth[b] == k + 1] for k in range(nlevel)]
    bmax = max(len(lv) for lv in levels)
    l_body = np.full((nlevel, bmax), nb, dtype=np.int32)
    l_parent = np.full((nlevel, bmax), nb, dtype=np.int32)
    l_bodypos = np.zeros((nlevel, bmax, 3))
    l_axis = np.zeros((nlevel, bmax, 3, 3))
    l_axis[..., 2] = 1.0  # pad axis = z (angle 0 -> identity)
    l_anchor = np.zeros((nlevel, bmax, 3, 3))
    l_qpos = np.full((nlevel, bmax, 3), spec.nq, dtype=np.int32)
    l_dof = np.full((nlevel, bmax, 3), spec.ndof, dtype=np.int32)
    body_hinges = [[d for d in range(6, nd) if spec.dof_body[d] == b]
                   for b in range(nb)]
    for k, lv in enumerate(levels):
        for i, b in enumerate(lv):
            l_body[k, i] = b
            l_parent[k, i] = spec.parent[b]
            l_bodypos[k, i] = spec.body_pos[b]
            for s, d in enumerate(body_hinges[b]):
                assert s < 3, "more than 3 hinges per body unsupported"
                l_axis[k, i, s] = spec.dof_axis[d]
                l_anchor[k, i, s] = spec.dof_anchor[d]
                l_qpos[k, i, s] = d + 1
                l_dof[k, i, s] = d

    arr = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
    return PhysicsModel(
        nbody=spec.nbody, ndof=spec.ndof, nq=spec.nq, nu=spec.nu,
        ngeom=spec.ngeom, ncpoint=len(cp_body),
        npair=npair, nbpair=nbpair,
        pair_blocks=pair_blocks, bpair_blocks=bpair_blocks,
        parent=tuple(int(x) for x in spec.parent),
        dof_body=tuple(int(x) for x in spec.dof_body),
        dof_jnt_index=tuple(int(x) for x in dof_jnt_index),
        geom_body=tuple(int(x) for x in spec.geom_body),
        geom_type=tuple(int(x) for x in spec.geom_type),
        actuator_dof=tuple(int(x) for x in spec.actuator_dof),
        jnt_limited=tuple(bool(x) for x in spec.jnt_limited),
        anc_mask=arr(anc),
        body_dof_mask=arr(body_dof),
        body_desc_mask=arr(body_anc.T),
        vp_mask=arr(vp),
        point_dof_mask=arr(point_dof),
        level_body=jnp.asarray(l_body),
        level_parent=jnp.asarray(l_parent),
        level_bodypos=arr(l_bodypos),
        level_axis=arr(l_axis),
        level_anchor=arr(l_anchor),
        level_qpos_idx=jnp.asarray(l_qpos),
        level_dof_idx=jnp.asarray(l_dof),
        cpoint_body=jnp.asarray(cp_body),
        cpoint_local=arr(cp_local),
        cpoint_radius=arr(cp_radius),
        cpoint_mu=arr(cp_mu),
        pair_body1=jnp.asarray(p_b1),
        pair_body2=jnp.asarray(p_b2),
        pair_a1=arr(p_a1), pair_b1=arr(p_e1),
        pair_a2=arr(p_a2), pair_b2=arr(p_e2),
        pair_rsum=arr(p_rs), pair_rdiff=arr(p_rd),
        pair_dof_mask=arr(p_dm),
        bpair_body_seg=jnp.asarray(bp_bs),
        bpair_body_box=jnp.asarray(bp_bb),
        bpair_a=arr(bp_a), bpair_b=arr(bp_e),
        bpair_rseg=arr(bp_r),
        bpair_boxpos=arr(bp_pos), bpair_boxquat=arr(bp_quat),
        bpair_half=arr(bp_half),
        bpair_dof_mask=arr(bp_dm),
        jnt_limited_f=arr(spec.jnt_limited.astype(np.float64)),
        body_pos=arr(spec.body_pos),
        body_mass=arr(spec.body_mass),
        body_ipos=arr(spec.body_ipos),
        body_inertia=arr(spec.body_inertia),
        dof_axis=arr(spec.dof_axis),
        dof_anchor=arr(spec.dof_anchor),
        dof_armature=arr(spec.dof_armature),
        dof_damping=arr(spec.dof_damping),
        dof_stiffness=arr(spec.dof_stiffness),
        jnt_range=arr(np.where(np.isfinite(spec.jnt_range), spec.jnt_range, 0.0))
        if spec.jnt_range.size else arr(np.zeros((0, 2))),
        geom_pos=arr(spec.geom_pos),
        geom_quat=arr(spec.geom_quat),
        geom_size=arr(spec.geom_size),
        geom_friction=arr(spec.geom_friction),
        gravity=arr(spec.gravity),
        actuator_gear=arr(spec.actuator_gear),
        timestep=arr(spec.timestep),
    )


def load_model(path: str, dtype=jnp.float32) -> tuple[PhysicsModel, ModelSpec]:
    """Parse an MJCF file and build the device model."""
    spec = parse_mjcf(path)
    return build_model(spec, dtype=dtype), spec
