"""action_type='torque' path: golden test vs MuJoCo C on a free-flight
torque-driven trajectory (the reference's do_simulation torque branch,
humanoid_v1.py:170-171)."""
import numpy as np
import jax
import jax.numpy as jnp
import mujoco

from egopose_tpu.physics import parse_mjcf, export_mjcf, build_model, engine

XML = "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml"


def test_torque_control_free_flight_matches_mujoco():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    mj = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    # the EgoPose humanoid has an intrinsic ~0.9mm Neck/LeftShoulder capsule
    # overlap (an always-on micro self-contact); disable contacts on BOTH
    # sides (oracle flag / max_pair_contacts=0) so this test exercises the
    # smooth torque-driven dynamics only
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    no_pairs = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                               max_pair_contacts=0)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(7)
    qpos = np.zeros(spec.nq)
    qpos[2] = 3.0
    qpos[3] = 1.0
    # stay strictly inside the joint ranges: the soft-limit model differs
    # from MuJoCo's constraint solver, so this test exercises the smooth
    # torque-driven dynamics only
    lo = spec.jnt_range[:, 0] + 0.05
    hi = spec.jnt_range[:, 1] - 0.05
    qpos[7:] = np.clip(rng.uniform(-0.25, 0.25, spec.nq - 7), lo, hi)
    qvel = rng.randn(spec.ndof) * 0.1
    ctrl = rng.uniform(-1, 1, spec.nu)
    tl = np.full(spec.nu, 100.0)

    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = np.clip(ctrl, -tl, tl)
    for _ in range(20):
        mujoco.mj_step(mj, d)

    jq, jv = engine.torque_control_step(
        model, jnp.array(qpos), jnp.array(qvel), jnp.array(ctrl),
        jnp.array(tl), 20, no_pairs)
    np.testing.assert_allclose(np.asarray(jq[:3]), d.qpos[:3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(jq[7:]), d.qpos[7:], atol=1e-5)
    np.testing.assert_allclose(np.asarray(jv), d.qvel, atol=1e-4)


def test_env_step_torque_action_type():
    """Env step with action_type='torque' runs and is finite."""
    import yaml
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params

    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    cfg_dict = yaml.safe_load(
        open("/root/reference/config/egomimic/subject_03.yml"))
    cfg_dict["action_type"] = "torque"
    cfg_dict["env_episode_len"] = 5
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=1,
                                    t_len=60, seed=0)
    st = envs.reset(model, p, tables, expert, jax.random.PRNGKey(0),
                    fix_expert_ind=0, fix_start_ind=10)
    st, out = envs.step(model, p, tables, expert, st,
                        jnp.zeros(spec.nu, jnp.float64))
    assert np.isfinite(np.asarray(st.qpos)).all()
    assert np.isfinite(float(out.reward))


def test_set_model_params_j_stiff_j_damp_override():
    """set_model_params parity (humanoid_v1.py:54-59): a torque-mode config
    with j_stiff/j_damp must override the hinge dofs' stiffness/damping in
    the built model, and the engine must actually feel it (the free-flight
    trajectory differs from the default model's)."""
    import yaml
    from egopose_tpu.utils.config import EgoMimicConfig, apply_model_params

    cfg_dict = yaml.safe_load(
        open("/root/reference/config/egomimic/subject_03.yml"))
    cfg_dict["action_type"] = "torque"
    cfg_dict["j_stiff"] = 5.0
    cfg_dict["j_damp"] = 2.5
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)

    spec_d = parse_mjcf(XML)                       # default
    spec_o = apply_model_params(parse_mjcf(XML), cfg)   # overridden
    assert np.all(spec_o.dof_stiffness[6:] == 5.0)
    assert np.all(spec_o.dof_damping[6:] == 2.5)
    assert np.all(spec_o.dof_stiffness[:6] == spec_d.dof_stiffness[:6])
    assert not np.array_equal(spec_o.dof_damping, spec_d.dof_damping)

    # position mode (or missing keys) must be a no-op
    cfg_pos = EgoMimicConfig(cfg_dict={**cfg_dict, "action_type": "position"})
    spec_p = apply_model_params(parse_mjcf(XML), cfg_pos)
    np.testing.assert_array_equal(spec_p.dof_stiffness, spec_d.dof_stiffness)

    # the dynamics must diverge under the override
    no_pairs = engine.DEFAULT_CONTACT._replace(substep_resident=False,
                                               max_pair_contacts=0)
    rng = np.random.RandomState(3)
    qpos = np.zeros(spec_d.nq)
    qpos[2], qpos[3] = 3.0, 1.0
    qpos[7:] = np.clip(rng.uniform(-0.2, 0.2, spec_d.nq - 7),
                       spec_d.jnt_range[:, 0] + 0.05,
                       spec_d.jnt_range[:, 1] - 0.05)
    qvel = rng.randn(spec_d.ndof) * 0.1
    ctrl = jnp.zeros(spec_d.nu, jnp.float64)
    tl = jnp.full(spec_d.nu, 100.0)
    out = {}
    for name, spec in (("default", spec_d), ("override", spec_o)):
        model = build_model(spec, dtype=jnp.float64)
        q, _ = engine.torque_control_step(
            model, jnp.array(qpos), jnp.array(qvel), ctrl, tl, 15, no_pairs)
        out[name] = np.asarray(q)
    assert np.abs(out["default"][7:] - out["override"][7:]).max() > 1e-4
