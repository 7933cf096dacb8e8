"""Prep-refresh cadence (ContactParams.prep_refresh) correctness.

The cadence freezes the configuration-dependent prep (FK, CRBA mass matrix,
RNEA bias, contact candidates/Jacobian and the factorizations derived from
them) for R consecutive substeps, while the PD error, joint limits, solves,
contact sweep and integration always see fresh q/v (engine.pd_control_step:
677-718).  MuJoCo C recomputes everything every substep
(/root/reference/ego_pose/envs/humanoid_v1.py:158-174), so R=1 is reference
behavior and R>1 is a numerical approximation whose error these tests bound.

Three locks:
  * the cadence SEMANTICS: pd_control_step at R equals a hand-written
    frozen-prep composition built from the engine's public primitives
    (including the 15 % R remainder group);
  * the cadence DRIFT: R in {2,3} vs R=1 over multiple control steps from a
    dynamic state stays inside bounds calibrated by the full golden sweep
    (tools/sweep_prep_refresh.py, results in BASELINE.md);
  * the resident kernel's cadence path is exercised on the real TPU by
    tools/bench_prep_refresh.py (kernel-at-R vs split-at-R; the kernel cannot
    compile on this CPU host -- see tests/test_substep_pallas.py docstring).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from egopose_tpu.physics import parse_mjcf, build_model, engine

XML = "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml"


@pytest.fixture(scope="module")
def world():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])
    tl = jnp.array(np.array(jp[5], dtype=float))
    return spec, model, jkp, jkd, tl


def _dynamic_state(spec):
    """Standing start shoved forward with a yaw spin: large velocities make
    the frozen bias and contact geometry maximally stale between refreshes
    (the sweep's `pushed` scenario)."""
    qpos = np.zeros(spec.nq)
    qpos[2] = 0.91
    qpos[3] = 1.0
    qvel = np.zeros(spec.ndof)
    qvel[0] = 1.5
    qvel[5] = 2.0
    return jnp.array(qpos), jnp.array(qvel)


def _manual_group(model, qp, qv, ctrl, jkp, jkd, tlim, nsub, params):
    """The documented cadence contract, composed from engine primitives:
    FK/CRBA/bias/contact geometry frozen at group entry; PD error, joint
    limits (inside smooth_dynamics), solves, sweep and integration on fresh
    q/v every substep."""
    kin = engine.fk(model, qp)
    mm = engine.crba(model, kin)
    bias = engine.bias_force(model, kin, qv)
    jf, target, mu = engine.contact_blocks(model, kin, params)
    for _ in range(nsub):
        tq = engine.stable_pd_torque(model, qp, qv, ctrl, jkp, jkd,
                                     kin, mm, bias)
        tq = jnp.clip(tq, -tlim, tlim)
        tau = jnp.zeros(model.ndof, qp.dtype).at[
            jnp.asarray(model.actuator_dof)].add(tq * model.actuator_gear)
        qfrc, a, _ = engine.smooth_dynamics(model, qp, qv, tau, params,
                                            kin, mm, bias)
        from egopose_tpu.physics.linalg_pallas import spd_solve
        sol = spd_solve(a, jnp.concatenate([qfrc[:, None], jf.T], axis=1))
        qacc, w = sol[:, 0], sol[:, 1:]
        v_pred = qv + model.timestep * qacc
        qv = engine.contact_sweep_blocks(jf, w, target, mu, v_pred,
                                         params.iters, params.relax)
        qp = engine.integrate(model, qp, qv, model.timestep)
    return qp, qv


def test_cadence_matches_manual_composition(world):
    """pd_control_step(n_frames=6, R=3) == two hand-composed frozen-prep
    groups of 3, bitwise-tight in f64."""
    spec, model, jkp, jkd, tl = world
    qp, qv = _dynamic_state(spec)
    ctrl = jnp.zeros(spec.nu)
    params = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                             prep_refresh=3)
    got_q, got_v = engine.pd_control_step(model, qp, qv, ctrl, jkp, jkd,
                                          tl, 6, params)
    mq, mv = qp, qv
    for _ in range(2):
        mq, mv = _manual_group(model, mq, mv, ctrl, jkp, jkd, tl, 3, params)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(mq), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(mv), atol=1e-12)


def test_cadence_remainder_group(world):
    """n_frames=5 at R=3 -> one group of 3 + a remainder group of 2
    (engine.pd_control_step:716-717)."""
    spec, model, jkp, jkd, tl = world
    qp, qv = _dynamic_state(spec)
    ctrl = jnp.zeros(spec.nu)
    params = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                             prep_refresh=3)
    got_q, got_v = engine.pd_control_step(model, qp, qv, ctrl, jkp, jkd,
                                          tl, 5, params)
    mq, mv = _manual_group(model, qp, qv, ctrl, jkp, jkd, tl, 3, params)
    mq, mv = _manual_group(model, mq, mv, ctrl, jkp, jkd, tl, 2, params)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(mq), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(mv), atol=1e-12)


@pytest.mark.slow
def test_cadence_drift_bounded(world):
    """R in {2,3} vs R=1 over 15 control steps (225 substeps, 0.5 s) from the
    dynamic pushed state: qpos drift stays well under the engine-vs-MuJoCo
    golden scale (the full 6-scenario sweep lives in
    tools/sweep_prep_refresh.py; its results are recorded in BASELINE.md)."""
    spec, model, jkp, jkd, tl = world
    qp0, qv0 = _dynamic_state(spec)
    ctrl = jnp.zeros(spec.nu)

    finals = {}
    for r in (1, 2, 3):
        params = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                                 prep_refresh=r)
        step = jax.jit(lambda a, b, p=params: engine.pd_control_step(
            model, a, b, ctrl, jkp, jkd, tl, 15, p))
        qp, qv = qp0, qv0
        for _ in range(15):
            qp, qv = step(qp, qv)
        finals[r] = np.asarray(qp)
        assert np.isfinite(finals[r]).all()

    rms2 = float(np.sqrt(((finals[2] - finals[1]) ** 2).mean()))
    rms3 = float(np.sqrt(((finals[3] - finals[1]) ** 2).mean()))
    # engine-vs-MuJoCo golden RMS on this scenario class is ~0.01-0.1
    # (test_physics_golden.py); the cadence must not add error of the same
    # order.  Calibrated against the sweep's measured vs_r1 values.
    assert rms2 < 0.05, rms2
    assert rms3 < 0.05, rms3
