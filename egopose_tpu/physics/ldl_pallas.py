"""Sparse tree-structured LDL^T solve in a compressed ancestor-slot layout.

The humanoid mass matrix has kinematic-tree sparsity: M[i,j] != 0 only when
dof j's body is dof i's body or an ancestor (engine Model.anc_mask).  A
leaves-first LDL^T factorization (the role of mj_factorM in MuJoCo C,
/root/reference/ego_pose/envs/humanoid_v1.py:130-144 solves against it) has
ZERO fill-in under that ordering, so factor+solve cost drops from O(n^3/3)
dense to sum(depth_d^2) -- for the EgoPose humanoid roughly 10x fewer
multiplies, and ~9x fewer vector-register passes than the blocked dense
Cholesky in linalg_pallas (the substep kernel is VPU-throughput-bound, so
register passes are the currency).

Compressed layout.  Row d stores only its ancestor entries:

    mrows[d][s] = A[d, anc[d][s]],  s = 0..depth_d-1   (a (depth_d, L) value)
    dvals[d]    = A[d, d]                              (a (1, L) value)

with anc[d] the ascending list of dofs coupled to d below the diagonal.
Ancestor lists NEST along chains: for j = anc[d][s], anc[j] == anc[d][:s].
That alignment makes the factorization update a plain prefix operation --
no gather/scatter, no index arithmetic at run time:

    eliminating dof k with L[k,j] = A[k,j]/D[k] updates, for each slot s
    (j = anc[k][s]):   D[j]        -= L[k,j] * A[k, j]
                       mrows[j][:] -= L[k,j] * mrows[k][:s]   (aligned!)

Everything is pure value-level jnp on lane-major (rows, L) arrays, so the
same functions run inside the Pallas substep kernel and under plain jit/CPU
for tests.  L (the lane count) is arbitrary.
"""
from __future__ import annotations

import jax.numpy as jnp

_DFLOOR = 1e-12  # same pivot floor as linalg_pallas._factor_multi


def dof_anc_lists(anc_mask) -> tuple:
    """Static per-dof ancestor lists from the model's (nd,nd) dof ancestor
    mask (anc_mask[i,j] true iff body(j) is body(i) or an ancestor).
    anc[d] = ascending dofs j < d with M[d,j] structurally nonzero."""
    import numpy as np
    m = np.asarray(anc_mask)
    n = m.shape[0]
    return tuple(tuple(int(j) for j in range(d) if m[d, j] or m[j, d])
                 for d in range(n))


def anc_segments(anc: tuple) -> tuple:
    """Each ancestor list as maximal contiguous (start, end) ranges -- for
    slicing compressed rows out of a dense lane-major matrix row."""
    segs = []
    for lst in anc:
        runs = []
        for j in lst:
            if runs and runs[-1][1] == j:
                runs[-1][1] = j + 1
            else:
                runs.append([j, j + 1])
        segs.append(tuple((a, b) for a, b in runs))
    return tuple(segs)


def rows_from_dense(mmat, anc_segs, n: int):
    """Compressed off-diagonal rows + diagonal from a dense (n, n, L)
    lane-major value (slices only -- the dropped entries are structural
    zeros)."""
    mrows, dvals = [], []
    for d in range(n):
        row = mmat[d]                                   # (n, L)
        segs = anc_segs[d]
        mrows.append(jnp.concatenate([row[a:b] for a, b in segs], axis=0)
                     if segs else None)
        dvals.append(row[d:d + 1])                      # (1, L)
    return mrows, dvals


def ldl_factor(mrows: list, dvals: list, anc: tuple):
    """In-place (python lists of values) leaves-first LDL^T factorization.
    On return mrows[d] holds L's row d (unit diagonal implied), dvals[d]
    holds D[d]; also returns invd (1/D) reused by solves.  Same update
    order as mj_factorM (dofs descending, slots descending)."""
    n = len(anc)
    invd = [None] * n
    for k in range(n - 1, -1, -1):
        invd[k] = 1.0 / jnp.maximum(dvals[k], _DFLOOR)
        dk = len(anc[k])
        if dk == 0:
            continue
        row_k = mrows[k]                                # (dk, L) pre-scale
        tmp = row_k * invd[k]                           # L[k, :] row
        for s in range(dk - 1, -1, -1):
            j = anc[k][s]
            tmp_s = tmp[s:s + 1]                        # (1, L)
            dvals[j] = dvals[j] - tmp_s * row_k[s:s + 1]
            if s > 0:
                mrows[j] = mrows[j] - tmp_s * row_k[:s]
        mrows[k] = tmp
    return invd


def ldl_tsolve(mrows: list, anc: tuple, xv: list):
    """First sweep only: y = L^-T b in place in ``xv``.  Leaving the solve
    here lets the contact path build the Delassus as Y^T D^-1 Y with
    Y = L^-T J^T -- no D/L substitution on the contact columns at all
    (the remaining two sweeps run on a single column via ldl_fsolve)."""
    n = len(anc)
    for k in range(n - 1, -1, -1):                      # x = L^-T b
        row_k = mrows[k]
        for s in range(len(anc[k])):
            j = anc[k][s]
            xv[j] = xv[j] - row_k[s:s + 1] * xv[k]


def ldl_fsolve(mrows: list, invd: list, anc: tuple, xv: list):
    """Remaining sweeps: x = L^-1 D^-1 y in place in ``xv``."""
    n = len(anc)
    for k in range(n):                                  # x = D^-1 x
        xv[k] = xv[k] * invd[k]
    for k in range(n):                                  # x = L^-1 x
        row_k = mrows[k]
        acc = xv[k]
        for s in range(len(anc[k])):
            acc = acc - row_k[s:s + 1] * xv[anc[k][s]]
        xv[k] = acc


def ldl_solve(mrows: list, invd: list, anc: tuple, xv: list):
    """Solve (L^T D L) x = b in place in ``xv`` (python list of (r, L)
    values, b in / x out).  Three sparse sweeps: back-propagate descendants
    into ancestors (L^T), diagonal scale, then ancestor substitution (L)."""
    ldl_tsolve(mrows, anc, xv)
    ldl_fsolve(mrows, invd, anc, xv)
