"""Pallas batched SPD solver: correctness vs stock cholesky (interpret mode
on CPU; the TPU path is exercised by bench/training runs)."""
import numpy as np
import jax
import jax.numpy as jnp

from egopose_tpu.physics.linalg_pallas import _batched_spd_solve_tpu


def test_pallas_spd_solve_matches_stock():
    rng = np.random.RandomState(0)
    b, n, r = 20, 58, 7   # deliberately not a multiple of 128 (pads)
    x = rng.randn(b, n, n)
    a = jnp.asarray(np.einsum("bij,bkj->bik", x, x) + 10 * np.eye(n),
                    jnp.float32)
    rhs = jnp.asarray(rng.randn(b, n, r), jnp.float32)
    got = _batched_spd_solve_tpu(a, rhs, interpret=True)
    want = jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(a), True), rhs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)
