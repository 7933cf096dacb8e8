"""Golden tests: JAX physics engine vs the MuJoCo C engine (host oracle).

The reference's physics is MuJoCo via mujoco_py
(/root/reference/envs/common/mujoco_env.py).  Here we validate the from-
scratch JAX engine against the installed MuJoCo 3 C library on the exact
EgoPose humanoid (converted to local coordinates by our spec exporter):

- forward kinematics (xpos/xquat) to machine precision
- mass matrix (mj_fullM equivalent) to machine precision
- bias force (qfrc_bias) to machine precision
- free-flight (contact-free) trajectory over many substeps
- stable-PD torque computation vs a numpy transcription of the reference
"""
import numpy as np
import jax
import jax.numpy as jnp
import mujoco
import pytest

from egopose_tpu.physics import parse_mjcf, export_mjcf, build_model, engine

XML = "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml"


@pytest.fixture(scope="module")
def setup():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    mj = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    return spec, model, mj


def rand_state(spec, rng, airborne=False):
    qpos = np.zeros(spec.nq)
    qpos[:3] = rng.uniform(-0.5, 0.5, 3)
    qpos[2] += 3.0 if airborne else 1.0
    q = rng.randn(4)
    qpos[3:7] = q / np.linalg.norm(q)
    lo = np.clip(spec.jnt_range[:, 0], -1.2, 0)
    hi = np.clip(spec.jnt_range[:, 1], 0, 1.2)
    qpos[7:] = rng.uniform(lo, hi)
    qvel = rng.randn(spec.ndof) * 0.5
    return qpos, qvel


def test_fk_matches_mujoco(setup):
    spec, model, mj = setup
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(1)
    for _ in range(5):
        qpos, _ = rand_state(spec, rng)
        d.qpos[:] = qpos
        mujoco.mj_forward(mj, d)
        kin = engine.fk(model, jnp.array(qpos))
        np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos[1:], atol=1e-12)
        got_q = np.asarray(kin.xquat)
        want_q = d.xquat[1:]
        flip = np.sign(np.sum(got_q * want_q, axis=-1, keepdims=True))
        np.testing.assert_allclose(got_q * flip, want_q, atol=1e-9)
        # coms and subtree com
        np.testing.assert_allclose(np.asarray(kin.com), d.xipos[1:], atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(engine.subtree_com(model, kin)), d.subtree_com[0], atol=1e-9)


def test_mass_matrix_matches_mujoco(setup):
    spec, model, mj = setup
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(2)
    for _ in range(3):
        qpos, qvel = rand_state(spec, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        mfull = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, mfull)
        kin = engine.fk(model, jnp.array(qpos))
        mm = np.asarray(engine.crba(model, kin))
        np.testing.assert_allclose(mm, mfull, atol=1e-9)


def test_bias_force_matches_mujoco(setup):
    spec, model, mj = setup
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(3)
    for _ in range(3):
        qpos, qvel = rand_state(spec, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        kin = engine.fk(model, jnp.array(qpos))
        c = np.asarray(engine.bias_force(model, kin, jnp.array(qvel)))
        np.testing.assert_allclose(c, d.qfrc_bias, atol=1e-8)


def test_free_flight_trajectory_matches_mujoco(setup):
    """Contact-free ballistic motion with zero torque: the full step path
    (dynamics + semi-implicit Euler) must track MuJoCo closely."""
    spec, model, mj = setup
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(4)
    qpos, qvel = rand_state(spec, rng, airborne=True)
    qvel[:3] = rng.randn(3) * 0.2
    d.qpos[:] = qpos
    d.qvel[:] = qvel

    jq, jv = jnp.array(qpos), jnp.array(qvel)
    tau = jnp.zeros(spec.ndof)
    step = jax.jit(lambda a, b: engine.step_raw(model, a, b, tau))
    for t in range(45):  # 0.1 s of flight
        mujoco.mj_step(mj, d)
        jq, jv = step(jq, jv)
    assert d.ncon == 0, "test invalid: mujoco found contacts"
    np.testing.assert_allclose(np.asarray(jq[:3]), d.qpos[:3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(jq[7:]), d.qpos[7:], atol=1e-5)
    qw = np.asarray(jq[3:7])
    flip = np.sign(np.sum(qw * d.qpos[3:7]))
    np.testing.assert_allclose(qw * flip, d.qpos[3:7], atol=1e-6)
    np.testing.assert_allclose(np.asarray(jv), d.qvel, atol=1e-4)


def test_stable_pd_torque_matches_reference_formula(setup):
    """The stable-PD path vs an independent numpy transcription of
    humanoid_v1.py:130-156 using MuJoCo's M and qfrc_bias."""
    spec, model, mj = setup
    from scipy.linalg import cho_factor, cho_solve
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(5)
    qpos, qvel = rand_state(spec, rng)
    ctrl = rng.uniform(-0.3, 0.3, spec.nu)
    jkp = rng.uniform(100, 500, spec.nu)
    jkd = jkp * 0.1

    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(mj, d)
    mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, mfull)
    dt = mj.opt.timestep
    k_p = np.zeros(mj.nv)
    k_d = np.zeros(mj.nv)
    k_p[6:] = jkp
    k_d[6:] = jkd
    qpos_err = np.concatenate([np.zeros(6), qpos[7:] - ctrl])
    qvel_err = qvel.copy()
    qacc = cho_solve(cho_factor(mfull + np.diag(k_d) * dt),
                     -d.qfrc_bias - k_p * qpos_err - k_d * qvel_err)
    want = -jkp * qpos_err[6:] - jkd * (qvel_err + qacc * dt)[6:]

    got = np.asarray(engine.stable_pd_torque(
        model, jnp.array(qpos), jnp.array(qvel), jnp.array(ctrl),
        jnp.array(jkp), jnp.array(jkd)))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_contact_dynamics_track_mujoco(setup):
    """Contact-rich PD-held dynamics: drop from 4 cm, land, stand ~1.5 s.

    The impulse-based contact solver must track the MuJoCo C engine (which
    runs the same stable-PD torques) closely through landing and standing --
    RMS qpos difference stays small and root heights agree."""
    spec, model, mj = setup
    import yaml
    from scipy.linalg import cho_factor, cho_solve
    cfg = yaml.safe_load(open("/root/reference/config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
    jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
    tl = np.array(jp[5], dtype=float)

    d = mujoco.MjData(mj)
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    d.qpos[:] = qpos0
    ctrl = np.zeros(spec.nu)

    def mj_pd_step():
        for _ in range(15):
            mujoco.mj_forward(mj, d)
            mfull = np.zeros((mj.nv, mj.nv))
            mujoco.mj_fullM(mj, d, mfull)
            kp = np.zeros(mj.nv)
            kd = np.zeros(mj.nv)
            kp[6:] = jkp
            kd[6:] = jkd
            e = np.concatenate([np.zeros(6), d.qpos[7:] - ctrl])
            ed = d.qvel.copy()
            qacc = cho_solve(cho_factor(mfull + np.diag(kd) * mj.opt.timestep),
                             -d.qfrc_bias - kp * e - kd * ed)
            tq = -jkp * e[6:] - jkd * (ed + qacc * mj.opt.timestep)[6:]
            d.ctrl[:] = np.clip(tq, -tl, tl)
            mujoco.mj_step(mj, d)

    step = jax.jit(lambda a, b: engine.pd_control_step(
        model, a, b, jnp.array(ctrl), jnp.array(jkp), jnp.array(jkd),
        jnp.array(tl), 15))
    jq, jv = jnp.array(qpos0), jnp.zeros(spec.ndof)
    for t in range(45):  # 1.5 s at 30 Hz
        mj_pd_step()
        jq, jv = step(jq, jv)
    assert np.isfinite(np.asarray(jq)).all()
    rms = np.sqrt(np.mean((np.asarray(jq) - d.qpos) ** 2))
    assert rms < 0.05, f"diverged from mujoco: rms={rms}"
    assert abs(float(jq[2]) - d.qpos[2]) < 0.05
    # standing (not fallen, not bounced) while mujoco stands
    assert 0.7 < float(jq[2]) < 1.0


def test_prone_many_contact_truncation_bounded(setup):
    """ADVICE r2: bound the top-K=8 contact truncation when far more than 8
    candidate points touch (fall to prone -- trunk, arms, and legs all in
    ground contact).  The humanoid starts pitched 90 deg just above the
    floor with zero-target PD and collapses flat.  Checks: (a) the K=8
    solver stays finite and settles prone like MuJoCo C (root height and
    no-explosion bounds), (b) K=8 tracks a K=16 run of our own solver
    closely -- the truncation error proper -- and (c) both runs end at
    MuJoCo's resting height."""
    spec, model, mj = setup
    import yaml
    from scipy.linalg import cho_factor, cho_solve
    cfg = yaml.safe_load(open("/root/reference/config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
    jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
    tl = np.array(jp[5], dtype=float)

    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.35                       # just above the floor
    qpos0[3] = np.cos(np.pi / 4)          # pitched 90 deg about y: prone
    qpos0[5] = np.sin(np.pi / 4)
    ctrl = np.zeros(spec.nu)

    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0

    def mj_pd_step():
        for _ in range(15):
            mujoco.mj_forward(mj, d)
            mfull = np.zeros((mj.nv, mj.nv))
            mujoco.mj_fullM(mj, d, mfull)
            kp = np.zeros(mj.nv)
            kd = np.zeros(mj.nv)
            kp[6:] = jkp
            kd[6:] = jkd
            e = np.concatenate([np.zeros(6), d.qpos[7:] - ctrl])
            ed = d.qvel.copy()
            qacc = cho_solve(cho_factor(mfull + np.diag(kd) * mj.opt.timestep),
                             -d.qfrc_bias - kp * e - kd * ed)
            tq = -jkp * e[6:] - jkd * (ed + qacc * mj.opt.timestep)[6:]
            d.ctrl[:] = np.clip(tq, -tl, tl)
            mujoco.mj_step(mj, d)

    def run(k):
        params = engine.DEFAULT_CONTACT._replace(max_contacts=k,
                                                 substep_resident=False)
        step = jax.jit(lambda a, b: engine.pd_control_step(
            model, a, b, jnp.array(ctrl), jnp.array(jkp), jnp.array(jkd),
            jnp.array(tl), 15, params))
        q, v = jnp.array(qpos0), jnp.zeros(spec.ndof)
        for _ in range(90):               # 3.0 s at 30 Hz: the collapse is
            q, v = step(q, v)             # still in motion at 1.5 s in both
        return np.asarray(q), np.asarray(v)   # engines (|v_root|~1.4)

    for _ in range(90):
        mj_pd_step()
    q8, v8 = run(8)
    q16, v16 = run(16)

    assert np.isfinite(q8).all() and np.isfinite(v8).all()
    # (b) truncation error proper: K=8 vs K=16 of the same solver
    rms_trunc = np.sqrt(np.mean((q8 - q16) ** 2))
    assert rms_trunc < 0.05, f"top-8 truncation diverges from top-16: {rms_trunc}"
    # (a)+(c) both solvers and MuJoCo settle prone at comparable height,
    # nothing bounced or tunneled
    assert 0.0 < q8[2] < 0.45 and 0.0 < q16[2] < 0.45
    assert abs(q8[2] - d.qpos[2]) < 0.15, (q8[2], d.qpos[2])
    # settled: residual root speed is small in both engines
    assert np.linalg.norm(v8[:3]) < 0.5 and np.linalg.norm(d.qvel[:3]) < 0.5
