"""Batched small-SPD Cholesky solve as a Pallas TPU kernel.

XLA's batched cholesky/triangular_solve for (B, 58, 58) lanes is the dominant
cost of the physics substep (~8 ms per call at B=1024 on v5e -- the matrices
are far below MXU tile size, so the stock kernels run essentially serial).
The kernels use the structure-of-arrays trick: the BATCH dimension sits on
the 128-wide vector lanes, making every factorization step a dense VPU op
over a panel of columns (see _factor_blocked: rank-1 updates restricted to
static suffix blocks, ~2.5-3x fewer flops than full-matrix updates, ~100x
faster than the stock XLA path).

``spd_solve`` is the public entry: a single-environment (n,n)/(n,r) solve
with a ``custom_vmap`` rule that dispatches the whole batch to the kernel, so
engine code written per-env and vmapped gets the fast path automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


PANEL = 8  # sublane tile: one panel of columns per factorization block


def _factor_multi(mats, n: int):
    """Blocked right-looking lane-major Cholesky of SEVERAL independent
    matrices, interleaved, in place in each ref of ``mats``.

    Per panel of PANEL columns: factor the columns against the static suffix
    block [j0:, j0:PANEL] (~2.5-3x fewer VPU flops than full-matrix rank-1
    updates), then one rank-w trailing update accumulated on values.  The
    factorization is a sequential dependency chain running far below the VPU
    roofline; emitting the same op for each independent matrix back-to-back
    lets the VLIW scheduler fill one chain's latency with the other's work.
    On exit the lower triangle of each ref holds L (junk above the diagonal;
    substitutions mask it)."""
    nb = (n + PANEL - 1) // PANEL
    ns = len(mats)
    Lw = mats[0].shape[-1]

    for jb in range(nb):
        j0 = jb * PANEL
        w = min(PANEL, n - j0)
        m = n - j0
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (m, Lw), 0)
        cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, w, Lw), 1)

        lcols = [[] for _ in range(ns)]
        for jj in range(w):
            lcol_s = []
            for s, a_s in enumerate(mats):
                piv = a_s[pl.ds(j0 + jj, 1), pl.ds(j0 + jj, 1), :][0]
                inv_d = jax.lax.rsqrt(jnp.maximum(piv, 1e-12))
                col = a_s[pl.ds(j0, m), pl.ds(j0 + jj, 1), :][:, 0, :]
                lcol = jnp.where(rows_m >= jj, col * inv_d, 0.0)    # (m,L)
                lcol_s.append(lcol)
                lcols[s].append(lcol)
            for s, a_s in enumerate(mats):
                lcol = lcol_s[s]
                a_s[pl.ds(j0, m), pl.ds(j0 + jj, 1), :] = lcol[:, None, :]
                # rank-1 update restricted to the remaining panel columns
                lrow = jnp.where(cols_w > jj, lcol[:w][None], 0.0)  # (1,w,L)
                blk = a_s[pl.ds(j0, m), pl.ds(j0, w), :]
                a_s[pl.ds(j0, m), pl.ds(j0, w), :] = \
                    blk - lcol[:, None, :] * lrow

        m2 = n - j0 - w
        if m2 > 0:
            trs = [a_s[pl.ds(j0 + w, m2), pl.ds(j0 + w, m2), :]
                   for a_s in mats]
            for cc in range(w):
                for s in range(ns):
                    pc = lcols[s][cc][w:]                   # (m2,L)
                    trs[s] = trs[s] - pc[:, None, :] * pc[None]
            for s, a_s in enumerate(mats):
                a_s[pl.ds(j0 + w, m2), pl.ds(j0 + w, m2), :] = trs[s]


def _factor_blocked(a_s, n: int):
    """Blocked lane-major Cholesky of one matrix (see _factor_multi)."""
    _factor_multi([a_s], n)


def _subst_fwd_multi(pairs, n: int):
    """Forward substitution L y = b for several independent (factor ref,
    rhs ref-or-view) pairs, interleaved (see _factor_multi for why).  Each
    ``x_ref`` may be a ref or a sliceable ref view with shape (n, r_s, L);
    column updates are restricted to the static suffix block."""
    nb = (n + PANEL - 1) // PANEL
    Lw = pairs[0][0].shape[-1]

    for jb in range(nb):
        j0 = jb * PANEL
        w = min(PANEL, n - j0)
        m = n - j0
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (m, Lw), 0)

        for jj in range(w):
            j0jj = j0 + jj
            yjs = []
            for a_s, x_ref in pairs:
                lj = a_s[pl.ds(j0jj, 1), pl.ds(j0jj, 1), :]         # (1,1,L)
                yjs.append(x_ref[pl.ds(j0jj, 1), :, :] / lj)        # (1,r,L)
            for s, (a_s, x_ref) in enumerate(pairs):
                col = a_s[pl.ds(j0, m), pl.ds(j0jj, 1), :][:, 0, :]  # (m,L)
                colm = jnp.where(rows_m > jj, col, 0.0)
                xs = x_ref[pl.ds(j0, m), :, :]
                x_ref[pl.ds(j0, m), :, :] = xs - colm[:, None, :] * yjs[s]
                x_ref[pl.ds(j0jj, 1), :, :] = yjs[s]


def _subst_bwd_multi(pairs, n: int):
    """Backward substitution L^T x = y for several independent pairs,
    interleaved.  Row updates are restricted to the static prefix block."""
    nb = (n + PANEL - 1) // PANEL
    Lw = pairs[0][0].shape[-1]

    for jb in range(nb - 1, -1, -1):
        j0 = jb * PANEL
        w = min(PANEL, n - j0)
        mt = j0 + w
        cols_mt = jax.lax.broadcasted_iota(jnp.int32, (mt, Lw), 0)

        for jj in range(w - 1, -1, -1):
            j = j0 + jj
            xjs = []
            for a_s, x_ref in pairs:
                lj = a_s[pl.ds(j, 1), pl.ds(j, 1), :]
                xjs.append(x_ref[pl.ds(j, 1), :, :] / lj)           # (1,r,L)
            for s, (a_s, x_ref) in enumerate(pairs):
                row = a_s[pl.ds(j, 1), pl.ds(0, mt), :][0]          # (mt,L)
                rowm = jnp.where(cols_mt < j, row, 0.0)
                xp = x_ref[pl.ds(0, mt), :, :]
                x_ref[pl.ds(0, mt), :, :] = xp - rowm[:, None, :] * xjs[s]
                x_ref[pl.ds(j, 1), :, :] = xjs[s]


def _subst_fwd(a_s, x_ref, n: int):
    _subst_fwd_multi([(a_s, x_ref)], n)


def _subst_bwd(a_s, x_ref, n: int):
    _subst_bwd_multi([(a_s, x_ref)], n)


def _subst_blocked(a_s, x_ref, n: int):
    """Solve L L^T x = b in place in ``x_ref`` given L factored in ``a_s``."""
    _subst_fwd(a_s, x_ref, n)
    _subst_bwd(a_s, x_ref, n)


def _subst_multi(pairs, n: int):
    """Solve L L^T x = b for several independent pairs, interleaved."""
    _subst_fwd_multi(pairs, n)
    _subst_bwd_multi(pairs, n)


def _cho_solve_kernel_blocked(a_ref, b_ref, x_ref, a_s, n: int, r: int):
    """Blocked lane-major Cholesky solve: factor A (n,n,L) = L L^T in
    scratch, solve for rhs (n,r,L) in place in ``x_ref``."""
    a_s[...] = a_ref[...]
    x_ref[...] = b_ref[...]
    _factor_blocked(a_s, n)
    _subst_blocked(a_s, x_ref, n)


def _batched_spd_solve_tpu(a, rhs, interpret=False):
    """a (B,n,n), rhs (B,n,r) -> (B,n,r) via the lane-major kernel."""
    bsz, n, _ = a.shape
    r = rhs.shape[-1]
    pad = (-bsz) % LANES
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
        a = jnp.concatenate([a, eye], 0)
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, n, r), rhs.dtype)], 0)
    bp = a.shape[0]
    at = a.transpose(1, 2, 0)        # (n,n,B) lane-major
    bt = rhs.transpose(1, 2, 0)      # (n,r,B)

    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        functools.partial(_cho_solve_kernel_blocked, n=n, r=r),
        grid=(bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((n, r, LANES), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((n, r, LANES), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, r, bp), a.dtype),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((n, n, LANES), a.dtype)],
    )(at, bt)
    x = out.transpose(2, 0, 1)
    return x[:bsz]


def _spd_solve_single(a, rhs):
    l = jnp.linalg.cholesky(a)
    return jax.scipy.linalg.cho_solve((l, True), rhs)


@jax.custom_batching.custom_vmap
def spd_solve(a: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve A x = rhs for SPD A (n,n), rhs (n,r).

    Under vmap on TPU, the whole batch dispatches to the Pallas lane-major
    kernel; unbatched (or on CPU) it falls back to stock cholesky."""
    return _spd_solve_single(a, rhs)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, a, rhs):
    a_b, r_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not r_b:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    on_tpu = any(d.platform == "tpu" for d in jax.devices()) or \
        jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        out = _batched_spd_solve_tpu(a, rhs)
    else:
        out = jax.vmap(_spd_solve_single)(a, rhs)
    return out, True


# ---------------------------------------------------------------------------
# fused dynamics + contact solve
# ---------------------------------------------------------------------------

def _contact_sweep(jf_ref, target_ref, mu_ref, x_s, v_pred,
                   n: int, c: int, k: int, iters: int, relax: float,
                   xcol0: int = 1, sup_segs=None):
    """Delassus accumulation + projected contact sweep, shared by the fused
    kernels.  ``x_s[:, xcol0:, :]`` holds the Delassus columns W = Minv J^T;
    contact rows are in block order [x-rows (k); y-rows; z-rows].  Returns
    the post-contact velocity (n, 1, L).  ``sup_segs``: optional static
    contiguous dof ranges outside which J columns are structurally zero
    (contact-candidate ancestor dofs) -- the accumulation skips the rest,
    which contributes exactly nothing."""
    vp_row = v_pred[:, 0, :][None]                        # (1,n,L)
    b = jnp.sum(jf_ref[...] * vp_row, axis=1, keepdims=True)
    bhat = b - target_ref[...]

    # Delassus operator A_c = J W: rank-1 accumulation over dofs on VALUES,
    # panel-chunked reads, one scratch write (the per-dof ref RMW loop cost
    # 2 full (c,c,L) VMEM passes per dof)
    acc = jnp.zeros((c, c, v_pred.shape[-1]), v_pred.dtype)
    for a, b_ in (sup_segs if sup_segs is not None else ((0, n),)):
        for d0 in range(a, b_, PANEL):
            dw = min(PANEL, b_ - d0)
            jblk = jf_ref[:, pl.ds(d0, dw), :]            # (c,dw,L)
            wblk = x_s[pl.ds(d0, dw), xcol0:, :]          # (dw,c,L)
            for d in range(dw):
                acc = acc + jblk[:, d:d + 1, :] * wblk[d][None]
    lam = _sweep_lam(acc, bhat, mu_ref[...], k, iters, relax)
    lam_row = lam[:, 0, :][None]                          # (1,c,L)
    return v_pred + jnp.sum(x_s[:, xcol0:, :] * lam_row, axis=1,
                            keepdims=True)


def _sweep_lam(acc, bhat, mu, k, iters, relax):
    """Projected-Jacobi friction sweep on an assembled Delassus ``acc``
    (c,c,L): returns the converged impulse lam (c,1,L).  Row layout: k
    tangent-x, k tangent-y, k normal (friction box clamp), then any trailing
    c-3k frictionless rows (self-collision pair contacts, lambda >= 0 only).

    python-unrolled: the sweep is a sequential chain of tiny matvecs that
    runs ~16x off its flop time under fori_loop -- unrolling (iters is
    static and small) removes per-trip loop machinery and lets Mosaic
    schedule across iterations."""
    c = bhat.shape[0]
    diag = jnp.sum(jnp.abs(acc), axis=1, keepdims=True) + 1e-9
    inv_diag = relax / diag
    lam = jnp.zeros(bhat.shape, bhat.dtype)               # (c,1,L)
    for _ in range(iters):
        lam_row = lam[:, 0, :][None]                      # (1,c,L)
        g = jnp.sum(acc * lam_row, axis=1, keepdims=True) + bhat
        lam = lam - g * inv_diag
        ln = jnp.maximum(lam[2 * k:3 * k], 0.0)
        lim = mu * ln
        lx = jnp.clip(lam[:k], -lim, lim)
        ly = jnp.clip(lam[k:2 * k], -lim, lim)
        parts = [lx, ly, ln]
        if c > 3 * k:
            parts.append(jnp.maximum(lam[3 * k:], 0.0))
        lam = jnp.concatenate(parts, axis=0)
    return lam


def _delassus_sym(x_s, invd, n: int, c: int, k: int, dtype, lanes: int,
                  sup_segs=None):
    """Symmetric Delassus assembly for the forward-only LDL contact path:
    A_c = J Minv J^T = Y^T D^-1 Y from ``x_s`` holding Y = L^-T J^T
    (ldl_tsolve output) and ``invd`` the factorization's per-dof 1/D rows.
    Each per-dof term (invd_d * y_d) (x) y_d is symmetric in exact
    arithmetic, so only the 6 lower-triangular (k,k) direction blocks are
    accumulated -- 2/3 of the rank-1 FMA/broadcast passes of the general
    J.W form -- and the upper blocks are mirrored with three tiny sublane
    transposes.  Returns the assembled (c,c,L) operator; depends only on
    the factorization and contact geometry, so under a prep-refresh cadence
    it is computed once per refresh and reused by every sweep in the
    group."""
    # row groups: 3 friction blocks of k rows + optionally c-3k frictionless
    # pair rows as a 4th group
    groups = [(0, k), (k, k), (2 * k, k)]
    if c > 3 * k:
        groups.append((3 * k, c - 3 * k))
    ng = len(groups)
    blocks = [[jnp.zeros((groups[a][1], groups[bb][1], lanes), dtype)
               for bb in range(a + 1)] for a in range(ng)]
    for a0, b0 in (sup_segs if sup_segs is not None else ((0, n),)):
        for d0 in range(a0, b0, PANEL):
            dw = min(PANEL, b0 - d0)
            yblk = x_s[d0:d0 + dw, :, :]                  # (dw,c,L)
            for d in range(dw):
                y = yblk[d]                               # (c,L)
                iy = invd[d0 + d] * y                     # (c,L)
                for a in range(ng):
                    o_a, s_a = groups[a]
                    ya = iy[o_a:o_a + s_a][:, None, :]          # (sa,1,L)
                    for bb in range(a + 1):
                        o_b, s_b = groups[bb]
                        yb = y[o_b:o_b + s_b][None]              # (1,sb,L)
                        blocks[a][bb] = blocks[a][bb] + ya * yb
    rows = [jnp.concatenate(
        [blocks[a][bb] if bb <= a else jnp.swapaxes(blocks[bb][a], 0, 1)
         for bb in range(ng)], axis=1) for a in range(ng)]
    return jnp.concatenate(rows, axis=0)                  # (c,c,L)


def _sweep_lam_from(acc, jf_ref, target_ref, mu_ref, v_pred,
                    k: int, iters: int, relax: float):
    """Projected sweep against a pre-assembled Delassus ``acc``: fresh
    velocity residual bhat = J v_pred - target, then _sweep_lam."""
    vp_row = v_pred[:, 0, :][None]                        # (1,n,L)
    b = jnp.sum(jf_ref[...] * vp_row, axis=1, keepdims=True)
    bhat = b - target_ref[...]
    return _sweep_lam(acc, bhat, mu_ref[...], k, iters, relax)


def _contact_sweep_sym(jf_ref, target_ref, mu_ref, x_s, v_pred, invd,
                       n: int, c: int, k: int, iters: int, relax: float,
                       sup_segs=None):
    """Symmetric Delassus accumulation + projected sweep (the one-shot
    composition of _delassus_sym + _sweep_lam_from).  Returns lam; the
    caller finishes v_new = v_pred + L^-1 D^-1 (Y lam) with one
    single-column ldl_fsolve (the c substitution columns are never run).
    All indexing is static, so it runs on refs in the kernel and on plain
    values in tests."""
    acc = _delassus_sym(x_s, invd, n, c, k, v_pred.dtype,
                        v_pred.shape[-1], sup_segs)
    return _sweep_lam_from(acc, jf_ref, target_ref, mu_ref, v_pred,
                           k, iters, relax)


def _fused_contact_kernel(a_ref, rhs_ref, jf_ref, target_ref, mu_ref,
                          qvel_ref, out_ref, a_s, x_s,
                          n: int, c: int, k: int, iters: int, relax: float):
    """Factor A (blocked), solve [dt*qfrc | J^T], then the shared contact
    sweep -- all in VMEM.  Shapes (lane-major, L=LANES): a (n,n,L),
    rhs (n,1+c,L), jf (c,n,L), target (c,1,L), mu (k,1,L), qvel (n,1,L),
    out (n,1,L).  rhs column 0 is premultiplied by dt outside."""
    a_s[...] = a_ref[...]
    _factor_blocked(a_s, n)
    x_s[...] = rhs_ref[...]
    _subst_blocked(a_s, x_s, n)
    v_pred = qvel_ref[...] + x_s[:, 0:1, :]               # (n,1,L)
    out_ref[...] = _contact_sweep(jf_ref, target_ref, mu_ref, x_s,
                                  v_pred, n, c, k, iters, relax)


def _fused_contact_tpu(a, qfrc, qvel, jf, target, mu, dt, iters, relax,
                       interpret=False):
    """Batched fused solve.  a (B,n,n), qfrc/qvel (B,n), jf (B,c,n) in block
    row order, target (B,c), mu (B,k), dt scalar -> v_new (B,n)."""
    from jax.experimental.pallas import tpu as pltpu
    bsz, n, _ = a.shape
    c = jf.shape[1]
    k = mu.shape[1]          # c = 3k friction rows + (c-3k) pair rows
    pad = (-bsz) % LANES
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))], 0)
        qfrc = jnp.concatenate([qfrc, jnp.zeros((pad, n), qfrc.dtype)], 0)
        qvel = jnp.concatenate([qvel, jnp.zeros((pad, n), qvel.dtype)], 0)
        jf = jnp.concatenate([jf, jnp.zeros((pad, c, n), jf.dtype)], 0)
        target = jnp.concatenate([target, jnp.zeros((pad, c), target.dtype)], 0)
        mu = jnp.concatenate([mu, jnp.zeros((pad, k), mu.dtype)], 0)
    bp = a.shape[0]
    rhs = jnp.concatenate([(qfrc * jnp.asarray(dt, a.dtype))[:, :, None],
                           jf.transpose(0, 2, 1)], axis=2)  # (B,n,1+c)
    at = a.transpose(1, 2, 0)
    rt = rhs.transpose(1, 2, 0)
    jt = jf.transpose(1, 2, 0)
    tt = target[:, :, None].transpose(1, 2, 0)
    mt = mu[:, :, None].transpose(1, 2, 0)
    vt = qvel[:, :, None].transpose(1, 2, 0)

    import functools as ft
    out = pl.pallas_call(
        ft.partial(_fused_contact_kernel, n=n, c=c, k=k, iters=iters,
                   relax=relax),
        grid=(bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((n, 1 + c, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((c, n, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((c, 1, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((k, 1, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, 1, bp), a.dtype),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((n, n, LANES), a.dtype),
                        pltpu.VMEM((n, 1 + c, LANES), a.dtype)],
    )(at, rt, jt, tt, mt, vt)
    return out.transpose(2, 0, 1)[:bsz, :, 0]


def _fused_contact_single(a, qfrc, qvel, jf, target, mu, dt, iters, relax):
    """Stock-ops fallback with identical math (block row order; trailing
    c-3k rows are frictionless pair contacts, lambda >= 0 only)."""
    c = jf.shape[0]
    k = mu.shape[0]
    sol = _spd_solve_single(a, jnp.concatenate([qfrc[:, None], jf.T], 1))
    qacc, w = sol[:, 0], sol[:, 1:]
    v_pred = qvel + dt * qacc
    ac = jf @ w
    b = jf @ v_pred
    bhat = b - target
    diag = jnp.sum(jnp.abs(ac), axis=-1) + 1e-9

    def sweep(lam, _):
        g = ac @ lam + bhat
        lam = lam - relax * g / diag
        ln = jnp.maximum(lam[2 * k:3 * k], 0.0)
        lim = mu * ln
        lx = jnp.clip(lam[:k], -lim, lim)
        ly = jnp.clip(lam[k:2 * k], -lim, lim)
        parts = [lx, ly, ln]
        if c > 3 * k:
            parts.append(jnp.maximum(lam[3 * k:], 0.0))
        return jnp.concatenate(parts), None

    lam, _ = jax.lax.scan(sweep, jnp.zeros(c, a.dtype), None, length=iters)
    return v_pred + w @ lam


def make_fused_contact_solve(iters: int, relax: float):
    """Build a custom-vmapped fused dynamics+contact solve for fixed solver
    hyperparameters (static for the kernel)."""

    @jax.custom_batching.custom_vmap
    def fused(a, qfrc, qvel, jf, target, mu, dt):
        return _fused_contact_single(a, qfrc, qvel, jf, target, mu, dt,
                                     iters, relax)

    @fused.def_vmap
    def _rule(axis_size, in_batched, a, qfrc, qvel, jf, target, mu, dt):
        args = [a, qfrc, qvel, jf, target, mu]
        for i, (arg, b) in enumerate(zip(args, in_batched[:6])):
            if not b:
                args[i] = jnp.broadcast_to(arg, (axis_size,) + arg.shape)
        dt_v = dt if not in_batched[6] else dt[0]
        on_tpu = any(d.platform == "tpu" for d in jax.devices()) or \
            jax.default_backend() in ("tpu", "axon")
        if on_tpu:
            out = _fused_contact_tpu(*args, dt_v, iters, relax)
        else:
            out = jax.vmap(lambda a_, q_, v_, j_, t_, m_:
                           _fused_contact_single(a_, q_, v_, j_, t_, m_,
                                                 dt_v, iters, relax))(*args)
        return out, True

    return fused


# ---------------------------------------------------------------------------
# fully fused stable-PD control substep
# ---------------------------------------------------------------------------
#
# The PD control substep needs two SPD solves against (M + dt*diag(.)): the
# stable-PD desired-acceleration solve and the dynamics+Delassus solve
# (engine.pd_control_step).  Done as separate ops, M round-trips HBM ~6x per
# substep (materialize M, materialize each A, lane-major transpose copies,
# kernel reads) -- and the engine is HBM-bound, not flop-bound.  This kernel
# takes M once and performs in VMEM: PD factor+solve -> torque -> qfrc ->
# dynamics factor+solve (qacc and Delassus columns share the substitution) ->
# projected contact sweep -> post-contact velocity.


def _pd_fused_kernel(m_ref, kdd_ref, rhspd_ref, e_ref, jkp_ref, jkd_ref,
                     tlim_ref, gear_ref, qfb_ref, qvel_ref, jf_ref, jft_ref,
                     target_ref, mu_ref, dt_ref, out_ref,
                     a_s, xpd_s, x_s,
                     n: int, c: int, k: int, iters: int, relax: float):
    """Shapes (lane-major, L=LANES): m (n,n,L); kdd (n,2,L) = [jkd_full,
    dof_damping] diag additions; rhspd/e/jkp/jkd/tlim/gear/qfb/qvel (n,1,L);
    jf (c,n,L) block row order; jft (n,c,L); target (c,1,L); mu (k,1,L);
    dt (1,1,L); out (n,1,L)."""
    dt = dt_ref[0, 0, :]                                     # (L,)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n, LANES), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n, LANES), 1)
    eq = r_iota == c_iota

    # ---- stable-PD solve: (M + dt*diag(jkd)) qacc = rhspd ----
    a_s[...] = m_ref[...] + jnp.where(eq, dt * kdd_ref[:, 0:1, :], 0.0)
    _factor_blocked(a_s, n)
    xpd_s[...] = rhspd_ref[...]
    _subst_blocked(a_s, xpd_s, n)

    # ---- torque -> generalized applied force ----
    torque = -jkp_ref[...] * e_ref[...] \
        - jkd_ref[...] * (qvel_ref[...] + dt * xpd_s[...])
    torque = jnp.clip(torque, -tlim_ref[...], tlim_ref[...])
    qfrc = qfb_ref[...] + torque * gear_ref[...]             # (n,1,L)

    # ---- dynamics solve: qacc and Delassus columns in one substitution ----
    a_s[...] = m_ref[...] + jnp.where(eq, dt * kdd_ref[:, 1:2, :], 0.0)
    _factor_blocked(a_s, n)
    x_s[:, 0:1, :] = qfrc * dt
    x_s[:, 1:, :] = jft_ref[...]
    _subst_blocked(a_s, x_s, n)

    # ---- shared projected contact sweep ----
    v_pred = qvel_ref[...] + x_s[:, 0:1, :]                  # (n,1,L)
    out_ref[...] = _contact_sweep(jf_ref, target_ref, mu_ref, x_s,
                                  v_pred, n, c, k, iters, relax)


def _pd_fused_tpu(mmat, kdd, rhspd, e, jkp, jkd, tlim, gear, qfb, qvel,
                  jf, target, mu, dt, iters, relax, interpret=False):
    """Batched fused PD substep.  mmat (B,n,n); kdd (B,n,2); rhspd/e/jkp/jkd/
    tlim/gear/qfb/qvel (B,n); jf (B,c,n) block rows; target (B,c); mu (B,k);
    dt scalar -> v_new (B,n)."""
    from jax.experimental.pallas import tpu as pltpu
    bsz, n, _ = mmat.shape
    c = jf.shape[1]
    k = mu.shape[1]          # c = 3k friction rows + (c-3k) pair rows
    pad = (-bsz) % LANES
    if pad:
        def padlast(x, fill=0.0):
            shp = (pad,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shp, fill, x.dtype)], 0)
        mmat = jnp.concatenate(
            [mmat, jnp.broadcast_to(jnp.eye(n, dtype=mmat.dtype),
                                    (pad, n, n))], 0)
        kdd, rhspd, e, jkp, jkd, tlim, gear, qfb, qvel, jf, target, mu = (
            padlast(x) for x in
            (kdd, rhspd, e, jkp, jkd, tlim, gear, qfb, qvel, jf, target, mu))
    bp = mmat.shape[0]

    def lm(x):                      # (B, ...) -> lane-major (..., B)
        return jnp.moveaxis(x, 0, -1)

    def col(x):                     # (B,n) -> (n,1,B)
        return x.T[:, None, :]

    dt_arr = jnp.broadcast_to(jnp.asarray(dt, mmat.dtype), (1, 1, bp))
    args = (lm(mmat), lm(kdd), col(rhspd), col(e), col(jkp), col(jkd),
            col(tlim), col(gear), col(qfb), col(qvel), lm(jf),
            lm(jf.transpose(0, 2, 1)), col(target), col(mu), dt_arr)

    import functools as ft
    bs3 = lambda d0, d1: pl.BlockSpec((d0, d1, LANES), lambda i: (0, 0, i))
    out = pl.pallas_call(
        ft.partial(_pd_fused_kernel, n=n, c=c, k=k, iters=iters, relax=relax),
        grid=(bp // LANES,),
        in_specs=[bs3(n, n), bs3(n, 2), bs3(n, 1), bs3(n, 1), bs3(n, 1),
                  bs3(n, 1), bs3(n, 1), bs3(n, 1), bs3(n, 1), bs3(n, 1),
                  bs3(c, n), bs3(n, c), bs3(c, 1), bs3(k, 1), bs3(1, 1)],
        out_specs=bs3(n, 1),
        out_shape=jax.ShapeDtypeStruct((n, 1, bp), mmat.dtype),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((n, n, LANES), mmat.dtype),
                        pltpu.VMEM((n, 1, LANES), mmat.dtype),
                        pltpu.VMEM((n, 1 + c, LANES), mmat.dtype)],
    )(*args)
    return out.transpose(2, 0, 1)[:bsz, :, 0]


def _pd_fused_single(mmat, kdd, rhspd, e, jkp, jkd, tlim, gear, qfb, qvel,
                     jf, target, mu, dt, iters, relax):
    """Stock-ops single-env fallback with identical math."""
    n = mmat.shape[0]
    a_pd = mmat + dt * jnp.diag(kdd[:, 0])
    qacc = _spd_solve_single(a_pd, rhspd[:, None])[:, 0]
    torque = -jkp * e - jkd * (qvel + dt * qacc)
    torque = jnp.clip(torque, -tlim, tlim)
    qfrc = qfb + torque * gear
    a_dyn = mmat + dt * jnp.diag(kdd[:, 1])
    return _fused_contact_single(a_dyn, qfrc, qvel, jf, target, mu, dt,
                                 iters, relax)


def make_pd_fused_step(iters: int, relax: float):
    """Build a custom-vmapped fused stable-PD substep (solver hyperparameters
    static for the kernel).  See _pd_fused_tpu for the argument contract."""

    @jax.custom_batching.custom_vmap
    def pdstep(mmat, kdd, rhspd, e, jkp, jkd, tlim, gear, qfb, qvel,
               jf, target, mu, dt):
        return _pd_fused_single(mmat, kdd, rhspd, e, jkp, jkd, tlim, gear,
                                qfb, qvel, jf, target, mu, dt, iters, relax)

    @pdstep.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = list(args)
        dt = args.pop()
        for i, (arg, b) in enumerate(zip(args, in_batched[:13])):
            if not b:
                args[i] = jnp.broadcast_to(arg, (axis_size,) + arg.shape)
        dt_v = dt if not in_batched[13] else dt[0]
        on_tpu = any(d.platform == "tpu" for d in jax.devices()) or \
            jax.default_backend() in ("tpu", "axon")
        if on_tpu:
            out = _pd_fused_tpu(*args, dt_v, iters, relax)
        else:
            out = jax.vmap(lambda *a: _pd_fused_single(*a, dt_v, iters,
                                                       relax))(*args)
        return out, True

    return pdstep
