"""Device-mesh runtime: the framework's distributed backend.

The reference's only parallelism is a fork-based CPU worker pool
(/root/reference/agents/agent.py:93-105).  Here rollout lanes and update
batches are data-parallel across a ``jax.sharding.Mesh``: lane-batched arrays
are sharded on the batch axis, parameters are replicated, and XLA inserts the
ICI collectives (psum for loss/stat reductions) under jit.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """Build an n-device 1-D mesh.  Raises if the host has fewer devices than
    requested: silently truncating would let "multi-chip ok" claims pass on a
    1-device mesh having verified nothing."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devs)} device(s) visible "
                f"({[d.platform for d in devs]}); for a virtual CPU mesh set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                'jax.config.update("jax_platforms", "cpu") before first jax use')
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(dp: int, sp: int, axes: tuple = ("data", "time")) -> Mesh:
    """Build a (dp x sp) 2-D mesh: rollout lanes / update batches shard over
    ``axes[0]``, the sequence-parallel context encode over ``axes[1]``
    (parallel/seqpar.py).  Same hard device-count guard as make_mesh."""
    devs = jax.devices()
    need = dp * sp
    if len(devs) < need:
        raise RuntimeError(
            f"make_mesh_2d({dp},{sp}): only {len(devs)} device(s) visible "
            f"({[d.platform for d in devs]}); need {need}")
    return Mesh(np.array(devs[:need]).reshape(dp, sp), axes)


def shard_batch(mesh: Mesh, tree, axis_index: int = 0, axis: str = "data"):
    """Shard every leaf of a lane-batched pytree along its batch axis."""
    def put(x):
        spec = [None] * x.ndim
        spec[axis_index] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def lane_sharding(mesh: Mesh, ndim: int, axis_index: int = 0,
                  axis: str = "data") -> NamedSharding:
    spec = [None] * ndim
    spec[axis_index] = axis
    return NamedSharding(mesh, P(*spec))
