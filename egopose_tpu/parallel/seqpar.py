"""Sequence-parallel (time-sharded) context encoding over the device mesh.

The reference handles long video context structurally (margins + chunked
iteration, SURVEY §5.7); its context nets always run on one device.  On a
TPU mesh the convolutional context pass (TemporalConvNet inside
VideoStateNet / VideoRegNet) can instead be sharded along TIME: each device
encodes a contiguous chunk of frames after a halo exchange of the net's
receptive field with its mesh neighbours (one `ppermute` each way over ICI).
Because a dilated conv stack is position-local — output t depends only on
inputs within the receptive field — the sharded pass is numerically
identical to the unsharded one (the zero halos that edge devices receive
from `ppermute` coincide with the convolutions' own zero padding).

This is an optimization beyond reference parity, for long takes (wild eval
runs minutes of 30 Hz video through the context net at once): encode time
drops ~linearly with mesh size while DP lanes stay free for rollout.
Recurrent context nets (LSTM) are sequential in time and are rejected.

No reference counterpart (the closest is the margin/packing design at
/root/reference/models/video_state_net.py:40-59, which this composes with).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def tcn_halo(num_channels, kernel_size: int, causal: bool) -> tuple[int, int]:
    """Per-side receptive field of a TemporalConvNet (models/tcn.py): block i
    runs two kernel-``k`` convs at dilation 2**i, each reaching (k-1)*d/2 per
    side (non-causal) or (k-1)*d into the past (causal)."""
    left = right = 0
    for i in range(len(num_channels)):
        d = 2 ** i
        if causal:
            left += 2 * (kernel_size - 1) * d
        else:
            left += (kernel_size - 1) * d
            right += (kernel_size - 1) * d
    return left, right


def encode_time_sharded(mesh: Mesh, apply_fn, x, halo_left: int,
                        halo_right: int, axis: str = "data",
                        time_axis: int = 1, batch_axes: dict | None = None):
    """Run a position-local sequence net time-sharded across ``mesh``.

    ``apply_fn(w, t_mask)`` maps an array with time on ``time_axis`` to an
    output with the SAME time length (conv nets with symmetric/causal "same"
    padding); ``halo_left``/``halo_right`` bound its receptive field per
    side.  ``t_mask`` (length = w's time extent, or None on the 1-device
    fast path) flags positions inside the true sequence: the net must keep
    activations at masked-out positions ZERO after every neighbourhood op
    (TemporalConvNet's ``t_mask``), because for a multi-layer net the fake
    edge frames a shard carries (zero halos at the global edges, the
    divisibility tail) would otherwise accumulate nonzero activations where
    the unsharded pass reads per-layer padding zeros.  Returns the
    full-length output, numerically equal to ``apply_fn(x, None)``.

    ``batch_axes`` optionally maps additional array dims to mesh axes (e.g.
    ``{0: "data"}`` for lanes already sharded data-parallel), composing SP
    with DP on a 2-D mesh: the halo ppermute rides the ``axis`` submesh
    only, independently per data-parallel slice.
    """
    n = int(mesh.shape[axis])
    if n == 1:
        return apply_fn(x, None)
    t_len = x.shape[time_axis]
    pad = (-t_len) % n
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[time_axis] = (0, pad)
        x = jnp.pad(x, widths)
    chunk = x.shape[time_axis] // n
    if chunk < max(halo_left, halo_right):
        raise ValueError(
            f"time chunk {chunk} < halo ({halo_left},{halo_right}): the "
            f"halo exchange only reaches mesh neighbours; use fewer devices "
            f"or longer sequences")

    def tslice(a, start, size):
        return jax.lax.slice_in_dim(a, start, start + size, axis=time_axis)

    def local(xl):
        parts = []
        if halo_left:
            tail = tslice(xl, chunk - halo_left, halo_left)
            parts.append(jax.lax.ppermute(
                tail, axis, [(j, j + 1) for j in range(n - 1)]))
        parts.append(xl)
        if halo_right:
            head = tslice(xl, 0, halo_right)
            parts.append(jax.lax.ppermute(
                head, axis, [(j + 1, j) for j in range(n - 1)]))
        xh = jnp.concatenate(parts, axis=time_axis)
        g0 = jax.lax.axis_index(axis) * chunk - halo_left
        gidx = g0 + jnp.arange(xh.shape[time_axis])
        t_mask = ((gidx >= 0) & (gidx < t_len)).astype(x.dtype)
        out = apply_fn(xh, t_mask)
        return tslice(out, halo_left, chunk)

    spec = [None] * x.ndim
    spec[time_axis] = axis
    for d, ax in (batch_axes or {}).items():
        spec[d] = ax
    pspec = P(*spec)
    out = shard_map(local, mesh=mesh, in_specs=pspec, out_specs=pspec)(x)
    if pad:
        out = tslice(out, 0, t_len)
    return out


def vsnet_encode_sp(mesh: Mesh, vs_net, params, windows, axis: str = "data",
                    batch_axis: str | None = None):
    """VideoStateNet context pass, time-sharded: (N, W, feat) windows ->
    (N, W - 2*v_margin, v_hdim), equal to ``vs_net.apply(params, windows)``.
    Only TCN context nets are position-local; LSTM is rejected.
    ``batch_axis`` additionally shards the lane dim N (DP x SP on a 2-D
    mesh)."""
    if vs_net.v_net_type != "tcn":
        raise ValueError(
            "sequence-parallel context encoding requires a TCN context net "
            f"(got {vs_net.v_net_type!r}: recurrent nets are sequential in "
            "time)")
    param = vs_net.v_net_param or {}
    halo_l, halo_r = tcn_halo(param.get("size", [64, vs_net.v_hdim]),
                              param.get("kernel_size", 3), vs_net.causal)

    def raw(w, t_mask):
        # the inner conv stack only -- margin trimming happens after the
        # exchange (trimming per-shard would drop interior frames)
        return vs_net.apply(params, w,
                            method=lambda m, ww: m.v_net(ww, True, t_mask))

    out = encode_time_sharded(
        mesh, raw, windows, halo_l, halo_r, axis=axis,
        batch_axes={0: batch_axis} if batch_axis else None)
    return out[:, vs_net.v_margin:-vs_net.v_margin]


def vregnet_apply_sp(mesh: Mesh, reg_net, params, x, train: bool = False,
                     axis: str = "data"):
    """VideoRegNet forward, time-sharded: (T, B, ...) frames/features ->
    (T, B, out_dim), equal to ``reg_net.apply(params, x, train)``.  The CNN,
    MLP, and output head are per-frame (receptive field 0); only the TCN
    temporal net needs the halo, so the whole model is position-local."""
    if train:
        raise ValueError(
            "sequence-parallel statereg forward is inference-only: "
            "train=True would need per-shard dropout RNGs plumbed through "
            "shard_map, and independent per-shard masks could not equal the "
            "unsharded reg_net.apply(params, x, True) this function "
            "promises -- run training forwards unsharded")
    if reg_net.v_net_type != "tcn":
        raise ValueError(
            "sequence-parallel statereg forward requires a TCN temporal net "
            f"(got {reg_net.v_net_type!r}: recurrent nets are sequential in "
            "time)")
    param = reg_net.v_net_param or {}
    halo_l, halo_r = tcn_halo(param.get("size", [64, reg_net.v_hdim]),
                              param.get("kernel_size", 3), reg_net.causal)

    def raw(w, t_mask):
        return reg_net.apply(params, w, train, t_mask)

    return encode_time_sharded(mesh, raw, x, halo_l, halo_r, axis=axis,
                               time_axis=0)
