"""ctypes bindings for the native packed-flow loader (fastload.c).

Builds the shared library on first use with the system compiler (pybind11 is
not available in this environment; ctypes keeps the binding dependency-free).
Falls back to numpy memmap reads if compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastload.c")
_SO = os.path.join(_HERE, "_fastload.so")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.check_call(
        ["cc", "-O2", "-shared", "-fPIC", "-pthread", "-o", _SO, _SRC])


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.fl_open.restype = ctypes.c_int
            lib.fl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64]
            lib.fl_read_batch.restype = ctypes.c_int
            lib.fl_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.c_int]
            lib.fl_close_all.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _npy_header_len(path):
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic[:6] == b"\x93NUMPY"
        major = magic[6]
        if major == 1:
            hlen = int.from_bytes(f.read(2), "little")
            return 10 + hlen
        hlen = int.from_bytes(f.read(4), "little")
        return 12 + hlen


class PackedFlowReader:
    """Parallel chunk reader over packed per-take .npy files.

    reader = PackedFlowReader({take: path})
    arrs = reader.read_batch([(take, start, count), ...])  # float32 arrays
    """

    def __init__(self, paths: dict, n_threads: int = 8):
        self.n_threads = n_threads
        self.meta = {}
        self.native = {}
        self.lib = get_lib()
        for take, path in paths.items():
            arr = np.load(path, mmap_mode="r")
            assert arr.dtype == np.float32, "packed flow must be float32"
            self.meta[take] = (path, arr.shape, arr)
            if self.lib is not None:
                header = _npy_header_len(path)
                frame_bytes = int(np.prod(arr.shape[1:])) * 4
                idx = self.lib.fl_open(path.encode(), header, frame_bytes,
                                       arr.shape[0])
                if idx >= 0:
                    self.native[take] = idx

    def read_batch(self, requests):
        """requests: list of (take, start, count) -> list of (count, ...)
        float32 arrays, read in parallel by the native thread pool."""
        outs = []
        if self.lib is not None and all(t in self.native
                                        for t, _, _ in requests):
            n = len(requests)
            fidx = (ctypes.c_int32 * n)()
            starts = (ctypes.c_int64 * n)()
            counts = (ctypes.c_int64 * n)()
            bufs = (ctypes.c_char_p * n)()
            keep = []
            for i, (take, s, c) in enumerate(requests):
                _, shape, _ = self.meta[take]
                out = np.empty((c,) + shape[1:], np.float32)
                keep.append(out)
                fidx[i] = self.native[take]
                starts[i] = s
                counts[i] = c
                bufs[i] = ctypes.cast(out.ctypes.data,
                                      ctypes.c_char_p)
            rc = self.lib.fl_read_batch(fidx, starts, counts, bufs, n,
                                        self.n_threads)
            if rc == 0:
                return keep
        # fallback: memmap reads
        for take, s, c in requests:
            _, _, mm = self.meta[take]
            outs.append(np.asarray(mm[s:s + c], np.float32))
        return outs
