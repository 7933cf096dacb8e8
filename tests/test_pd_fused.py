"""Fused stable-PD substep kernel (physics/linalg_pallas.py):

- the custom_vmap CPU fallback must reproduce the split pd_control_step path
  exactly (same math, different fusion);
- the Pallas kernel (interpret mode) must match the single-env fallback.
"""
import numpy as np
import jax
import jax.numpy as jnp
import yaml

from egopose_tpu.physics import parse_mjcf, build_model
from egopose_tpu.physics import engine as E
from egopose_tpu.physics import linalg_pallas as LP

XML = "assets/mujoco_models/humanoid_1205_v1.xml"


def _gains():
    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])
    tl = jnp.array(np.array(jp[5], dtype=float))
    return jkp, jkd, tl


def test_pd_fused_fallback_matches_split_path():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    jkp, jkd, tl = _gains()
    rng = np.random.RandomState(0)
    B = 3
    qpos = jnp.asarray(np.tile(np.concatenate(
        [[0, 0, 0.85, 1, 0, 0, 0], 0.05 * rng.randn(52)]), (B, 1)))
    qpos = qpos + 0.01 * jnp.asarray(rng.randn(B, 59))
    qvel = 0.1 * jnp.asarray(rng.randn(B, 58))
    ctrl = 0.1 * jnp.asarray(rng.randn(B, 52))

    # pd_fused is a kept-but-rejected option that always recomputes prep
    # every substep (engine.ContactParams.prep_refresh is documented as
    # ignored by it), so compare both paths at R=1.
    split = E.DEFAULT_CONTACT._replace(pd_fused=False, prep_refresh=1)
    fused = E.DEFAULT_CONTACT._replace(pd_fused=True, prep_refresh=1)
    qs, vs = jax.jit(jax.vmap(lambda a, b, c: E.pd_control_step(
        model, a, b, c, jkp, jkd, tl, 15, split)))(qpos, qvel, ctrl)
    qf, vf = jax.jit(jax.vmap(lambda a, b, c: E.pd_control_step(
        model, a, b, c, jkp, jkd, tl, 15, fused)))(qpos, qvel, ctrl)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qf),
                               atol=1e-10, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vf),
                               atol=1e-9, rtol=1e-9)


def test_pd_fused_kernel_matches_single_fallback():
    rng = np.random.RandomState(1)
    B, n, c, k = 5, 58, 24, 8
    x = rng.randn(B, n, n)
    mm = jnp.asarray(np.einsum("bij,bkj->bik", x, x) + 50 * np.eye(n),
                     jnp.float32)
    kdd = jnp.asarray(np.abs(rng.randn(B, n, 2)), jnp.float32)
    rhspd, e, jkpf, jkdf, qfb, qvl = (
        jnp.asarray(rng.randn(B, n), jnp.float32) for _ in range(6))
    tlimf = jnp.asarray(np.abs(rng.randn(B, n)), jnp.float32)
    gearf = jnp.asarray(np.abs(rng.randn(B, n)), jnp.float32)
    jf = jnp.asarray(rng.randn(B, c, n), jnp.float32)
    target = jnp.asarray(rng.randn(B, c), jnp.float32)
    mu = jnp.asarray(np.abs(rng.randn(B, k)), jnp.float32)
    dt = 1.0 / 450
    got = LP._pd_fused_tpu(mm, kdd, rhspd, e, jkpf, jkdf, tlimf, gearf,
                           qfb, qvl, jf, target, mu, dt, 25, 1.0,
                           interpret=True)
    want = jax.vmap(lambda *a: LP._pd_fused_single(*a, dt, 25, 1.0))(
        mm, kdd, rhspd, e, jkpf, jkdf, tlimf, gearf, qfb, qvl, jf, target, mu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)
