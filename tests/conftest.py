"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on virtual CPU devices (the driver
dry-runs the real multi-chip path separately); physics golden tests compare
against the MuJoCo C engine on host.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# belt and braces: some plugin may import jax before this conftest, in which
# case the env var above is read too late -- the config route always works
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
