"""Batched small-SPD Cholesky solve as a Pallas TPU kernel.

XLA's batched cholesky/triangular_solve for (B, 58, 58) lanes is the dominant
cost of the physics substep (~8 ms per call at B=1024 on v5e -- the matrices
are far below MXU tile size, so the stock kernels run essentially serial).
This kernel uses the structure-of-arrays trick: the BATCH dimension sits on
the 128-wide vector lanes, making every factorization step a dense (n, n,
128) VPU op.  One program factors 128 lanes; a fori_loop walks the n columns
with masked rank-1 updates (n^3 masked work instead of n^3/3 -- still ~100x
faster than the stock path).

``spd_solve`` is the public entry: a single-environment (n,n)/(n,r) solve
with a ``custom_vmap`` rule that dispatches the whole batch to the kernel, so
engine code written per-env and vmapped gets the fast path automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def _cho_solve_kernel(a_ref, b_ref, x_ref, a_s, l_s, n: int, r: int):
    """Factor A (n,n,L) = L L^T and solve for rhs (n,r,L), lane-major.

    Mutates scratch refs inside fori_loops (Mosaic supports ref-based dynamic
    slicing only); the rank-1 update runs as a full masked (n,n,LANES) VPU op
    per column."""
    a_s[...] = a_ref[...]
    x_ref[...] = b_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)

    def fact_step(j, _):
        piv = a_s[pl.ds(j, 1), pl.ds(j, 1), :][0]          # (1, L)
        inv_d = jax.lax.rsqrt(jnp.maximum(piv, 1e-12))
        col = a_s[:, pl.ds(j, 1), :][:, 0, :]              # (n, L)
        lcol = jnp.where(rows >= j, col * inv_d, 0.0)
        l_s[:, pl.ds(j, 1), :] = lcol[:, None, :]
        a_s[...] = a_s[...] - lcol[:, None, :] * lcol[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, fact_step, 0)

    # forward substitution: L y = b (y lives in x_ref)
    def fwd_step(j, _):
        lj = l_s[pl.ds(j, 1), pl.ds(j, 1), :]              # (1,1,L)
        yj = x_ref[pl.ds(j, 1), :, :] / lj                 # (1,r,L)
        col = l_s[:, pl.ds(j, 1), :][:, 0, :]              # (n,L)
        col = jnp.where(rows > j, col, 0.0)
        x_ref[...] = x_ref[...] - col[:, None, :] * yj
        x_ref[pl.ds(j, 1), :, :] = yj
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    # back substitution: L^T x = y
    def bwd_step(i, _):
        j = n - 1 - i
        lj = l_s[pl.ds(j, 1), pl.ds(j, 1), :]
        xj = x_ref[pl.ds(j, 1), :, :] / lj
        row = l_s[pl.ds(j, 1), :, :][0]                    # (n,L): L^T col j
        row = jnp.where(rows < j, row, 0.0)
        x_ref[...] = x_ref[...] - row[:, None, :] * xj
        x_ref[pl.ds(j, 1), :, :] = xj
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)


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
        functools.partial(_cho_solve_kernel, n=n, r=r),
        grid=(bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i)),
                  pl.BlockSpec((n, r, LANES), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((n, r, LANES), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, r, bp), a.dtype),
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((n, n, LANES), a.dtype),
                        pltpu.VMEM((n, n, LANES), a.dtype)],
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
