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


def _pd_gains():
    import yaml
    cfg = yaml.safe_load(open("/root/reference/config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
    jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
    tl = np.array(jp[5], dtype=float)
    return jkp, jkd, tl


def _mj_pd_rollout(spec, mj, qpos0, ctrl, jkp, jkd, tl, n_steps):
    """MuJoCo C driven by the same stable-PD controller (the reference's
    do_simulation, humanoid_v1.py:130-174) -- the golden oracle, with MuJoCo
    resolving ALL contacts incl. body-body self-collision."""
    from scipy.linalg import cho_factor, cho_solve
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos0
    for _ in range(n_steps):
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
            qacc = cho_solve(
                cho_factor(mfull + np.diag(kd) * mj.opt.timestep),
                -d.qfrc_bias - kp * e - kd * ed)
            tq = -jkp * e[6:] - jkd * (ed + qacc * mj.opt.timestep)[6:]
            d.ctrl[:] = np.clip(tq, -tl, tl)
            mujoco.mj_step(mj, d)
    return d


def _our_pd_rollout(model, qpos0, ctrl, jkp, jkd, tl, n_steps, max_pairs):
    params = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                             max_pair_contacts=max_pairs)
    step = jax.jit(lambda a, b: engine.pd_control_step(
        model, a, b, jnp.array(ctrl), jnp.array(jkp), jnp.array(jkd),
        jnp.array(tl), 15, params))
    q, v = jnp.array(qpos0), jnp.zeros(model.ndof)
    for _ in range(n_steps):
        q, v = step(q, v)
    return np.asarray(q), np.asarray(v)


def _pair_index(spec, model, names):
    bn = spec.body_names
    b1 = np.asarray(model.pair_body1)
    b2 = np.asarray(model.pair_body2)
    return [i for i in range(model.npair)
            if {bn[int(b1[i])], bn[int(b2[i])]} == set(names)]


def test_self_collision_arms_folded_tracks_mujoco(setup):
    """VERDICT r3 item 1: body-body self-collision.  Arms folded across the
    chest press each hand capsule against its upper-arm capsule (sustained
    contact in MuJoCo for ~70% of substeps).  With pair contacts enabled the
    engine must (a) track MuJoCo C closely and (b) keep the hand out of the
    arm; with pair contacts off the hand sinks ~5 mm in and tracking is
    measurably worse."""
    spec, model, mj = setup
    jkp, jkd, tl = _pd_gains()
    jn = {n: i for i, n in enumerate(spec.jnt_names)}
    ctrl = np.zeros(spec.nu)
    for k, v in {"RightArm_z": -1.05, "LeftArm_z": 1.05,
                 "RightForeArm_z": 2.9, "LeftForeArm_z": -2.9}.items():
        ctrl[jn[k]] = v
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0

    d = _mj_pd_rollout(spec, mj, qpos0, ctrl, jkp, jkd, tl, 45)
    q_on, _ = _our_pd_rollout(model, qpos0, ctrl, jkp, jkd, tl, 45, 4)
    q_off, _ = _our_pd_rollout(model, qpos0, ctrl, jkp, jkd, tl, 45, 0)

    rms_on = np.sqrt(np.mean((q_on - d.qpos) ** 2))
    rms_off = np.sqrt(np.mean((q_off - d.qpos) ** 2))
    assert rms_on < 0.01, f"self-collision run diverged from mujoco: {rms_on}"
    assert rms_on < rms_off, (rms_on, rms_off)

    ha = _pair_index(spec, model, ("RightHand", "RightArm")) + \
        _pair_index(spec, model, ("LeftHand", "LeftArm"))
    assert len(ha) == 2
    phi_on = np.asarray(engine.pair_candidates(
        model, engine.fk(model, jnp.array(q_on)))[0])
    phi_off = np.asarray(engine.pair_candidates(
        model, engine.fk(model, jnp.array(q_off)))[0])
    # ours resolves the contact to < ~1mm penetration; without pair contacts
    # the hand rests several mm inside the arm
    assert phi_on[ha].max() < 2e-3, phi_on[ha]
    assert phi_off[ha].max() > 3e-3, phi_off[ha]


def test_self_collision_crossed_thighs_tracks_mujoco(setup):
    """Legs crossed mid-gait: the right thigh swings flexed across the left,
    starting 2 cm interpenetrated (RightUpLeg/LeftUpLeg are both in the
    default contact group -- the lower legs/feet are in disjoint groups 1/2
    and never collide, humanoid_1205_v1.xml:112-130).  Both engines must
    push the thighs apart the same way over 1 s."""
    spec, model, mj = setup
    jkp, jkd, tl = _pd_gains()
    jn = {n: i for i, n in enumerate(spec.jnt_names)}
    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    qpos0[7 + jn["RightUpLeg_x"]] = -0.5
    qpos0[7 + jn["RightUpLeg_y"]] = -0.45
    qpos0[7 + jn["LeftUpLeg_y"]] = 0.45
    ctrl = qpos0[7:].copy()          # PD-hold the crossed pose

    tt = _pair_index(spec, model, ("RightUpLeg", "LeftUpLeg"))
    assert len(tt) == 1
    phi0 = np.asarray(engine.pair_candidates(
        model, engine.fk(model, jnp.array(qpos0)))[0])
    assert phi0[tt[0]] > 0.015, "test invalid: thighs not interpenetrated"

    d = _mj_pd_rollout(spec, mj, qpos0, ctrl, jkp, jkd, tl, 30)
    q_on, v_on = _our_pd_rollout(model, qpos0, ctrl, jkp, jkd, tl, 30, 4)

    assert np.isfinite(q_on).all()
    rms = np.sqrt(np.mean((q_on - d.qpos) ** 2))
    assert rms < 0.05, f"crossed-thigh run diverged from mujoco: {rms}"
    # both engines resolved the initial interpenetration
    phi_end = np.asarray(engine.pair_candidates(
        model, engine.fk(model, jnp.array(q_on)))[0])
    assert phi_end[tt[0]] < 5e-3, phi_end[tt[0]]
    assert abs(float(q_on[2]) - d.qpos[2]) < 0.05
