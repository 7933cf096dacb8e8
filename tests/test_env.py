"""Environment tests: obs contract, expert replay reward, rollout stability.

Mirrored behaviors under test: humanoid_v1.py obs/reward/reset/fail and
gen_expert.py feature generation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egopose_tpu.physics import parse_mjcf, build_model, engine
from egopose_tpu import envs
from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
import yaml

XML = "/root/reference/assets/mujoco_models/humanoid_1205_v1.xml"
CFG = "/root/reference/config/egomimic/subject_03.yml"


@pytest.fixture(scope="module")
def world():
    spec = parse_mjcf(XML)
    model = build_model(spec, dtype=jnp.float64)
    cfg = EgoMimicConfig(cfg_dict=yaml.safe_load(open(CFG)))
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=2,
                                    t_len=300, seed=0)
    return spec, model, cfg, tables, p, expert


def test_obs_dim_matches_reference_layout(world):
    spec, model, cfg, tables, p, expert = world
    # subject_03: qpos[2:] (57) + full qvel (58) = 115, no heading/phase
    qpos = jnp.asarray(expert.qpos[0, 50])
    qvel = jnp.asarray(expert.qvel[0, 50])
    obs = envs.get_obs(p, qpos, qvel, jnp.zeros((), jnp.int32))
    assert obs.shape == (115,)
    # de-headed root quat occupies obs[1:5]; heading of it is ~0
    from egopose_tpu.ops import math_utils as M
    h = float(M.get_heading(obs[1:5]))
    assert min(h, 2 * np.pi - h) < 1e-6


def test_bquat_matches_reference_construction(world):
    """get_body_quat must equal the reference construction: root quat + per-
    body 'sxyz' euler quats over the body's hinge angles."""
    spec, model, cfg, tables, p, expert = world
    qpos = np.asarray(expert.qpos[0, 42])
    bq = np.asarray(envs.get_body_quat(tables, jnp.asarray(qpos)))
    assert bq.shape == (4 * spec.nbody,)
    np.testing.assert_allclose(bq[:4], qpos[3:7])
    # independent check for one 3-hinge body (Spine: qpos 7:10) via scipy
    from scipy.spatial.transform import Rotation as R
    want = R.from_euler("xyz", qpos[7:10]).as_quat()
    want = np.r_[want[3], want[:3]]
    got = bq[4:8]
    flip = np.sign(np.sum(got * want))
    np.testing.assert_allclose(got * flip, want, atol=1e-9)
    # 1-dof body: RightForeArm euler[0]=angle (reference semantics)
    i = spec.body_names.index("RightForeArm") - 1
    s, e = spec.body_qposaddr()["RightForeArm"]
    want = R.from_euler("xyz", [qpos[s], 0, 0]).as_quat()
    want = np.r_[want[3], want[:3]]
    got = bq[4 + 4 * i: 8 + 4 * i]
    flip = np.sign(np.sum(got * want))
    np.testing.assert_allclose(got * flip, want, atol=1e-9)


def test_expert_tracking_reward_is_high(world):
    """Feeding the expert's next pose as the PD target from an expert state
    must produce a near-1 imitation reward (the reward's fixed point)."""
    spec, model, cfg, tables, p, expert = world
    key = jax.random.PRNGKey(0)
    state = envs.reset(model, p, tables, expert, key,
                       fix_expert_ind=0, fix_start_ind=20)
    total = 0.0
    for t in range(5):
        ind = 20 + t + 1
        target = expert.qpos[0, ind, 7:]
        action = (target - p.a_ref) / p.a_scale
        state, out = envs.step(model, p, tables, expert, state, action)
        total += float(out.reward)
    assert total / 5 > 0.55, f"tracking reward too low: {total/5}"
    assert not bool(state.done)


def test_step_autoreset_resets_done_lanes(world):
    spec, model, cfg, tables, p, expert = world
    key = jax.random.PRNGKey(1)
    state = envs.reset(model, p, tables, expert, key,
                       fix_expert_ind=0, fix_start_ind=20)
    # force done
    state = state._replace(done=jnp.ones((), bool), cur_t=jnp.asarray(77, jnp.int32))
    action = jnp.zeros(spec.nu)
    new_state, out, was_done = envs.step_autoreset(
        model, p, tables, expert, state, action, jax.random.PRNGKey(2))
    assert bool(was_done)
    assert int(new_state.cur_t) == 0
    assert float(out.reward) == 0.0
    assert not bool(out.done)


def test_batched_rollout_finite(world):
    """vmapped random-action rollout stays finite and terminates episodes."""
    spec, model, cfg, tables, p, expert = world
    B, T = 8, 40
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    state = jax.vmap(lambda k: envs.reset(model, p, tables, expert, k))(keys)

    def body(carry, key):
        st = carry
        akeys = jax.random.split(key, B)
        actions = 0.1 * jax.random.normal(key, (B, spec.nu))
        st, out, was_done = jax.vmap(
            lambda s, a, k: envs.step_autoreset(model, p, tables, expert, s, a, k)
        )(st, actions, akeys)
        return st, (out.reward, out.done)

    state, (rewards, dones) = jax.lax.scan(
        body, state, jax.random.split(jax.random.PRNGKey(4), T))
    assert np.isfinite(np.asarray(rewards)).all()
    assert np.isfinite(np.asarray(state.qpos)).all()
    # random actions should cause at least one episode failure
    assert np.asarray(dones).sum() > 0


def test_random_cur_t_reset(world):
    """random_cur_t (humanoid_v1.py:218-220): reset draws a mid-episode
    cur_t; obs_phase reflects it."""
    import dataclasses
    spec, model, cfg, tables, p, expert = world
    p2 = dataclasses.replace(p, random_cur_t=True, obs_phase=True,
                             obs_dim=p.obs_dim + 1)
    keys = jax.random.split(jax.random.PRNGKey(5), 32)
    states = jax.vmap(lambda k: envs.reset(model, p2, tables, expert, k))(keys)
    ts = np.asarray(states.cur_t)
    assert ts.min() >= 0 and ts.max() < p.env_episode_len
    assert len(np.unique(ts)) > 5  # actually random
    obs = jax.vmap(lambda s: envs.observe(p2, s))(states)
    assert obs.shape[-1] == p.obs_dim + 1
    np.testing.assert_allclose(np.asarray(obs[:, -1]),
                               ts / p.env_episode_len, atol=1e-6)
    # fixed sampling still starts at 0
    st = envs.reset(model, p2, tables, expert, keys[0], fix_expert_ind=0,
                    fix_start_ind=20)
    assert int(st.cur_t) == 0


def test_diverged_state_terminates_and_stays_finite(world):
    """Divergence guard (finish_step): MuJoCo C surfaces a blown-up
    simulation via engine warnings (mjWARN_BADQACC, values over mjMAXVAL);
    in a batched jitted rollout a NaN lane instead sails past the
    head-height fail check (NaN comparisons are False) and poisons the PPO
    update through the batch mean.  A non-finite or absurd-velocity state
    must read as a failed episode with finite, zero-reward outputs."""
    spec, model, cfg, tables, p, expert = world
    state = envs.reset(model, p, tables, expert, jax.random.PRNGKey(5),
                       fix_expert_ind=0, fix_start_ind=20)

    # non-finite qpos out of the physics step
    bad_qpos = state.qpos.at[10].set(jnp.nan)
    new_state, out = envs.finish_step(model, p, tables, expert, state,
                                      bad_qpos, state.qvel)
    assert bool(out.fail) and bool(out.done)
    assert jnp.isfinite(new_state.qpos).all()
    assert jnp.isfinite(new_state.qvel).all()
    assert jnp.isfinite(out.obs).all()
    assert float(out.reward) == 0.0
    # sanitized to the pre-step state
    assert jnp.allclose(new_state.qpos, state.qpos)
    assert float(jnp.abs(new_state.qvel).max()) == 0.0

    # absurd (but finite) velocity trips the same guard
    huge_qvel = state.qvel.at[3].set(1e9)
    _, out2 = envs.finish_step(model, p, tables, expert, state,
                               state.qpos, huge_qvel)
    assert bool(out2.fail)
    assert jnp.isfinite(out2.obs).all()
    assert float(out2.reward) == 0.0

    # a healthy step is untouched by the guard
    _, out3 = envs.finish_step(model, p, tables, expert, state,
                               state.qpos, state.qvel)
    assert not bool(out3.fail)
    assert float(out3.reward) > 0.0
