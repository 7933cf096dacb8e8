"""Fused dynamics+contact Pallas kernel vs the stock-ops fallback
(interpret mode), and the engine's fused_solver option end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp

from egopose_tpu.physics.linalg_pallas import (_fused_contact_tpu,
                                               _fused_contact_single)


def test_fused_contact_matches_fallback():
    rng = np.random.RandomState(0)
    b, n, c = 6, 58, 48
    k = c // 3
    x = rng.randn(b, n, n)
    a = jnp.asarray(np.einsum("bij,bkj->bik", x, x) + 10 * np.eye(n),
                    jnp.float32)
    qfrc = jnp.asarray(rng.randn(b, n), jnp.float32)
    qvel = jnp.asarray(rng.randn(b, n), jnp.float32)
    jf = jnp.asarray(rng.randn(b, c, n) * 0.3, jnp.float32)
    target = jnp.asarray(np.abs(rng.randn(b, c)) * 0.1, jnp.float32)
    mu = jnp.asarray(np.ones((b, k)), jnp.float32)
    got = _fused_contact_tpu(a, qfrc, qvel, jf, target, mu, 0.00222, 25, 1.0,
                             interpret=True)
    want = jax.vmap(lambda *args: _fused_contact_single(
        *args, 0.00222, 25, 1.0))(a, qfrc, qvel, jf, target, mu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_engine_fused_option_matches_split_path():
    """With identical contact parameters, the fused and split engine paths
    must produce (nearly) the same substep."""
    import dataclasses
    from egopose_tpu.physics import parse_mjcf, build_model, engine

    spec = parse_mjcf("/root/reference/assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    qpos = jnp.zeros(spec.nq, jnp.float64).at[2].set(0.86).at[3].set(1.0)
    qvel = jnp.zeros(spec.ndof, jnp.float64).at[2].set(-0.5)
    tau = jnp.zeros(spec.ndof, jnp.float64)
    split = engine.ContactParams(fused_solver=False)
    fused = engine.ContactParams(fused_solver=True)
    q1, v1 = engine.step_raw(model, qpos, qvel, tau, split)
    q2, v2 = engine.step_raw(model, qpos, qvel, tau, fused)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-10)
