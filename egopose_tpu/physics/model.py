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
                      "level_body", "level_parent", "level_bodypos",
                      "level_axis", "level_anchor", "level_qpos_idx",
                      "level_dof_idx"],
         meta_fields=["nbody", "ndof", "nq", "nu", "ngeom", "ncpoint",
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
    # --- contact candidate points ---
    cpoint_body: jax.Array     # (K,) int body index
    cpoint_local: jax.Array    # (K,3) body-frame position
    cpoint_radius: jax.Array   # (K,)
    cpoint_mu: jax.Array       # (K,) sliding friction

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
