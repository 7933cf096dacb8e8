"""Substep-resident control-step kernel (physics/substep_pallas.py).

The kernel's NEW math -- lane-major CRBA, RNEA bias, limits, stable-PD rhs,
contact top-K/Jacobian build, integration -- lives in pure value-level
functions (_lane_prep/_lane_integrate) shared by the kernel and these tests,
so it is validated against the engine's split path directly on CPU.  (The
solve/sweep pieces the kernel wires between them are the already-tested
_factor_blocked/_subst_blocked/_contact_sweep from linalg_pallas; the full
compiled kernel is validated against the split path on the real TPU by
tools/bench_substep.py -- interpret mode is unusable on this 1-core host,
the XLA:CPU compile of the full kernel graph takes >20 min.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import yaml

from egopose_tpu.physics import build_model, parse_mjcf
from egopose_tpu.physics import engine as E
from egopose_tpu.physics import substep_pallas as SP

XML = "assets/mujoco_models/humanoid_1205_v1.xml"


def _gains():
    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])
    tl = jnp.array(np.array(jp[5], dtype=float))
    return jkp, jkd, tl


def _world():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    rng = np.random.RandomState(3)
    B = 4
    qpos = np.tile(np.concatenate(
        [[0, 0, 0.85, 1, 0, 0, 0], 0.05 * rng.randn(52)]), (B, 1))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos = jnp.asarray(qpos + 0.01 * rng.randn(B, 59))
    qvel = 0.1 * jnp.asarray(rng.randn(B, 58))
    ctrl = 0.1 * jnp.asarray(rng.randn(B, 52))
    return model, qpos, qvel, ctrl, B


def test_lane_prep_matches_engine():
    """_lane_prep's M, bias, qfb, rhspd, contact J/target/mu == the engine's
    crba/bias_force/smooth_dynamics/contact_blocks, f64 bitwise-tight."""
    model, qpos, qvel, ctrl, B = _world()
    jkp, jkd, _tl = _gains()
    st = SP._build_static(model, E.DEFAULT_CONTACT)
    ndc, masks, bodyc, cpc, treem, cppk = SP._packed_consts(st)
    prpk, pairc = SP._packed_pair_consts(st)
    C = SP._unpack_consts(st, jnp.asarray(ndc), jnp.asarray(masks),
                          jnp.asarray(bodyc),
                          jnp.asarray(st["pdm"]), jnp.asarray(cpc),
                          jnp.asarray(treem), jnp.asarray(cppk),
                          jnp.asarray(prpk), jnp.asarray(st["pdm_pair"]),
                          jnp.asarray(pairc))
    zeros6 = jnp.zeros(6)
    jkp_full = jnp.concatenate([zeros6, jkp])[:, None]
    jkd_full = jnp.concatenate([zeros6, jkd])[:, None]

    mmat, bias, qfb, e, rhspd, jf, target, mu = SP._lane_prep(
        st, C, qpos.T, qvel.T, ctrl.T,
        jnp.broadcast_to(jkp_full, (58, B)),
        jnp.broadcast_to(jkd_full, (58, B)), jnp.float64)

    def engine_ref(qp, qv, c):
        kin = E.fk(model, qp)
        mm = E.crba(model, kin)
        bf = E.bias_force(model, kin, qv)
        qfrc, _a, _ = E.smooth_dynamics(model, qp, qv, jnp.zeros(58), kin=kin,
                                        mm=mm, qfrc_bias=bf)
        jfr, tgt, mur = E.contact_blocks(model, kin)
        ef = jnp.concatenate([jnp.zeros(6), qp[7:] - c])
        rh = -bf - jnp.concatenate([zeros6, jkp]) * ef \
            - jnp.concatenate([zeros6, jkd]) * qv
        return mm, bf, qfrc, ef, rh, jfr, tgt, mur

    wm, wb, wq, we, wr, wj, wt, wmu = jax.vmap(engine_ref)(qpos, qvel, ctrl)
    np.testing.assert_allclose(np.moveaxis(np.asarray(mmat), -1, 0),
                               np.asarray(wm), atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(bias).T, np.asarray(wb),
                               atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(qfb).T, np.asarray(wq),
                               atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(e).T, np.asarray(we), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rhspd).T, np.asarray(wr),
                               atol=1e-8, rtol=1e-9)
    # contacts: same K points; iterative-max selection vs lax.top_k may
    # permute equal-depth points, so compare as row sets via sorted rows
    np.testing.assert_allclose(np.sort(np.moveaxis(np.asarray(jf), -1, 0),
                                       axis=1),
                               np.sort(np.asarray(wj), axis=1),
                               atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(np.sort(np.asarray(target).T, axis=1),
                               np.sort(np.asarray(wt), axis=1), atol=1e-9)
    np.testing.assert_allclose(np.sort(np.asarray(mu).T, axis=1),
                               np.sort(np.asarray(wmu), axis=1), atol=1e-12)


def test_lane_integrate_matches_engine():
    model, qpos, qvel, _ctrl, B = _world()
    got = SP._lane_integrate(
        SP._build_static(model, E.DEFAULT_CONTACT),
        qpos.T, qvel.T, jnp.float64).T
    want = jax.vmap(lambda q, v: E.integrate(model, q, v, model.timestep))(
        qpos, qvel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_substep_resident_flag_falls_back_off_tpu():
    """With substep_resident=True on the CPU host, the custom_vmap rule must
    route to the split path and produce identical results."""
    model, qpos, qvel, ctrl, B = _world()
    jkp, jkd, tl = _gains()
    split = E.DEFAULT_CONTACT._replace(substep_resident=False)
    resident = E.DEFAULT_CONTACT._replace(substep_resident=True)
    qs, vs = jax.jit(jax.vmap(lambda a, b, c: E.pd_control_step(
        model, a, b, c, jkp, jkd, tl, 3, split)))(qpos, qvel, ctrl)
    qr, vr = jax.jit(jax.vmap(lambda a, b, c: E.pd_control_step(
        model, a, b, c, jkp, jkd, tl, 3, resident)))(qpos, qvel, ctrl)
    np.testing.assert_allclose(np.asarray(qr), np.asarray(qs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vs), atol=1e-12)
