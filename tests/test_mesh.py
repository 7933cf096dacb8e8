"""Device-mesh runtime tests (conftest forces 8 virtual CPU devices).

The data-parallel path is the structural replacement for the reference's
fork-based worker pool (/root/reference/agents/agent.py:93-105): rollout
lanes and update batches shard across the mesh, parameters replicate, and
the same training step must produce the same numbers on 1 device and 8.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egopose_tpu.parallel.mesh import make_mesh


def test_make_mesh_raises_on_insufficient_devices():
    with pytest.raises(RuntimeError, match="only"):
        make_mesh(1000)


def test_make_mesh_eight_devices():
    m = make_mesh(8)
    assert len(list(m.devices.flat)) == 8
    assert m.axis_names == ("data",)


def _make_agent(mesh, world):
    from egopose_tpu.rl import AgentEgo
    spec, model, tables, p, expert, cnn_feat, cfg = world
    return AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                    batch_lanes=8, seed=0, dtype=jnp.float64, mesh=mesh)


@pytest.mark.slow
def test_train_step_8way_matches_single_device():
    """One sample+update on an 8-way mesh == the 1-device result, and the
    rollout really lands sharded across all 8 devices."""
    import __graft_entry__ as g
    world = g._world(jnp.float64, episode_len=4)
    p = world[3]
    key = jax.random.PRNGKey(7)
    results = {}
    for n_dev in (1, 8):
        agent = _make_agent(make_mesh(n_dev), world)
        batch, log = agent.sample(key, 8 * p.env_episode_len)
        if n_dev == 8:
            assert len(batch.states.sharding.device_set) == 8, \
                "rollout lanes not sharded across the mesh"
        metrics = agent.update_params(batch)
        results[n_dev] = (np.asarray(batch.rewards), log.avg_c_reward,
                          metrics)
    r1, c1, m1 = results[1]
    r8, c8, m8 = results[8]
    np.testing.assert_allclose(r8, r1, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(c8, c1, rtol=1e-8)
    for k in m1:
        np.testing.assert_allclose(m8[k], m1[k], rtol=1e-6, atol=1e-8,
                                   err_msg=f"metric {k} diverged across mesh")


def test_batch_lanes_must_divide_mesh():
    import __graft_entry__ as g
    from egopose_tpu.rl import AgentEgo
    spec, model, tables, p, expert, cnn_feat, cfg = g._world(
        jnp.float64, episode_len=4)
    with pytest.raises(ValueError, match="divisible"):
        AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                 batch_lanes=9, seed=0, dtype=jnp.float64, mesh=make_mesh(8))
