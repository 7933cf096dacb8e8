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

jax.config.update("jax_enable_x64", True)
