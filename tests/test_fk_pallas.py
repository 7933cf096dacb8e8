"""Lane-major FK kernel math (physics/fk_pallas.py) vs engine.fk.

Runs the pure _fk_compute (the kernel body) as plain jax ops -- interpret
mode on the 1-core CPU would take minutes for the ~4k-op unrolled kernel.
"""
import numpy as np
import jax
import jax.numpy as jnp

from egopose_tpu.physics import parse_mjcf, build_model
from egopose_tpu.physics import engine as E
from egopose_tpu.physics.fk_pallas import (_build_topo, _fk_compute,
                                           _fk_compute_lvl)


def test_fk_compute_matches_engine_fk():
    spec = parse_mjcf("assets/mujoco_models/humanoid_1205_v1.xml")
    m = build_model(spec, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    B = 4
    qpos = np.tile(np.concatenate([[0.1, -0.2, 0.91, 1, 0, 0, 0],
                                   np.zeros(52)]), (B, 1))
    qpos[:, 3:7] = rng.randn(B, 4)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos[:, 7:] = 0.3 * rng.randn(B, 52)
    qpos = jnp.asarray(qpos)

    want = jax.vmap(lambda q: E.fk(m, q))(qpos)
    topo = _build_topo(m)
    xpos, xquat, com, s = _fk_compute(qpos.T, topo, qpos.dtype)
    # lane-major (rows, comp, B) -> (B, rows, comp)
    for got, ref in ((xpos, want.xpos), (xquat, want.xquat),
                     (com, want.com), (s, want.s)):
        np.testing.assert_allclose(np.asarray(got.transpose(2, 0, 1)),
                                   np.asarray(ref), atol=1e-12)

    # the level-batched traversal (the substep kernel's FK) is BITWISE the
    # sequential one: same formulas on the same per-element operands
    lvl = _fk_compute_lvl(qpos.T, topo, qpos.dtype)
    for got, ref in zip(lvl, (xpos, xquat, com, s)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
