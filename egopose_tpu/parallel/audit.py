"""Mechanical communication audit of compiled multi-device programs.

Parses the compiled HLO of a jitted, mesh-sharded function and inventories
every cross-device collective: op kind, result shape, bytes, and an
ICI-traffic estimate (ring algorithms: all-reduce moves 2(n-1)/n of the
buffer per device, all-gather/reduce-scatter (n-1)/n, collective-permute
exactly its buffer).  Used by the driver dry run (__graft_entry__.py) to
assert the sharded training step's communication pattern stays the intended
one -- replicated-parameter data parallelism must move GRADIENTS (psum /
all-reduce), never gather the lane-sharded batch (SURVEY 2.3/5.8: the mesh
runtime is the distributed backend; the reference's analogue is its NCCL
gradient all-reduce).
"""
from __future__ import annotations

import re
from typing import NamedTuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


class Collective(NamedTuple):
    kind: str
    dtype: str
    shape: tuple
    bytes: int          # result buffer size
    ici_bytes: float    # estimated per-device ICI traffic (ring)


def _shapes_of(result: str):
    """All '(dtype, dims)' buffers in an HLO result type (handles tuples)."""
    out = []
    for m in re.finditer(r"([a-z]+\d*)\[([\d,]*)\]", result):
        dt = m.group(1)
        if dt not in _DTYPE_BYTES:
            continue
        dims = tuple(int(x) for x in m.group(2).split(",") if x)
        out.append((dt, dims))
    return out


def collectives_of(compiled_text: str, n_devices: int):
    """Inventory the collectives in `compiled.as_text()` HLO."""
    found = []
    for line in compiled_text.splitlines():
        line = line.strip()
        # result-producing ops look like:  %name = TYPE op-name(...)
        m = re.match(r"%?[\w.\-]+\s*=\s*(\(?[a-z]+\d*\[.*?\]\)?[^=]*?)\s+"
                     r"([a-z\-]+)\(", line)
        if not m:
            continue
        op = m.group(2)
        if op.endswith("-done"):
            continue  # counted at -start (same buffer)
        # Async collectives lower to '-start'/'-done' pairs on TPU; strip the
        # suffix EXPLICITLY (rstrip takes a character set, not a suffix, and
        # would eat trailing letters of 'all-gather'/'reduce-scatter').
        kind = op[:-len("-start")] if op.endswith("-start") else op
        if kind not in _COLLECTIVES:
            continue
        shapes = _shapes_of(m.group(1))
        if op.endswith("-start") and len(shapes) > 1:
            # '-start' result tuples alias the operand buffers; only the last
            # entry is the collective's result -- avoid double counting.
            shapes = shapes[-1:]
        for dt, dims in shapes:
            nbytes = _DTYPE_BYTES[dt]
            for d in dims:
                nbytes *= d
            if kind == "all-reduce":
                ici = 2.0 * (n_devices - 1) / n_devices * nbytes
            elif kind in ("all-gather", "reduce-scatter", "all-to-all"):
                ici = (n_devices - 1) / n_devices * nbytes
            else:  # collective-permute
                ici = float(nbytes)
            found.append(Collective(kind, dt, dims, nbytes, ici))
    return found


def summarize(found, label=""):
    """Human-readable one-block summary; returns total ICI bytes."""
    by_kind = {}
    for c in found:
        by_kind.setdefault(c.kind, []).append(c)
    total = sum(c.ici_bytes for c in found)
    lines = [f"collective audit{' [' + label + ']' if label else ''}: "
             f"{len(found)} ops, ~{total / 1024:.1f} KiB ICI per step"]
    for kind in sorted(by_kind):
        cs = by_kind[kind]
        b = sum(c.bytes for c in cs)
        big = max(cs, key=lambda c: c.bytes)
        lines.append(f"  {kind:20s} x{len(cs):<4d} {b / 1024:9.1f} KiB "
                     f"(largest {big.dtype}{list(big.shape)})")
    return "\n".join(lines), total


def assert_dp_pattern(found, batch_bytes_per_device: int, label=""):
    """Assert the data-parallel contract: gradients ride all-reduce; the
    lane-sharded batch is never gathered.  ``batch_bytes_per_device`` is the
    size of one device's shard of the largest lane-sharded array; any
    all-gather or all-to-all moving at least that much is a sharding leak
    (XLA resharding the batch instead of the parameters)."""
    leaks = [c for c in found
             if c.kind in ("all-gather", "all-to-all")
             and c.bytes >= batch_bytes_per_device]
    if leaks:
        desc = ", ".join(f"{c.kind} {c.dtype}{list(c.shape)}" for c in leaks)
        raise AssertionError(
            f"batch-sized gather collectives in {label or 'program'}: "
            f"{desc} -- a lane-sharded array is being re-gathered; check "
            f"the shardings (parallel/mesh.py)")
