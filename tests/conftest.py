"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on virtual CPU devices (the driver
dry-runs the real multi-chip path separately); physics golden tests compare
against the MuJoCo C engine on host.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# substep unroll buys nothing on CPU and multiplies LLVM compile time
os.environ.setdefault("EGOPOSE_SUBSTEP_UNROLL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# belt and braces: some plugin may import jax before this conftest, in which
# case the env var above is read too late -- the config route always works
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: deliberately NO persistent compilation cache here.  With a cache
# enabled (including the TPU-shared /root/.jax_cache the CLI mains used to
# set unconditionally -- now gated to non-CPU backends in
# utils/jax_cache.py), the suite segfaulted in
# compilation_cache.get_executable_and_time deserializing CPU executables.


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The suite jits hundreds of distinct x64 CPU programs; with everything
    accumulated in one process the XLA CPU backend eventually segfaulted
    *during a fresh compile* in the last module (reproduced at
    tests/test_wild_eval.py via ego_forecast_eval_wild).  Modules share
    almost no jit cache entries, so clearing between modules costs little
    and keeps the compiler state bounded.
    """
    yield
    jax.clear_caches()
    gc.collect()
