"""Persistent-compilation-cache setup shared by the CLI entry points.

Enabled only for accelerator backends: TPU compiles are the minutes-long ones
worth caching, while re-loading cached *CPU* executables segfaults
deterministically in jax 0.8.x (compilation_cache.get_executable_and_time)
once a process mixes freshly-written and re-read entries -- the CPU test
suite hit this through the CLI mains.  CPU runs simply recompile.
"""
from __future__ import annotations

import os


def setup_compilation_cache() -> None:
    import jax
    if jax.default_backend() == "cpu":
        return
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("EGOPOSE_JAX_CACHE", "/root/.jax_cache"))
