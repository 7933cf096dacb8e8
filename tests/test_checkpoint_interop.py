"""End-to-end checkpoint interop: a reference-format (torch state_dict)
ego-mimic checkpoint loads into the agent and drives its policy forward
(SURVEY §5.4: 'load these exact pickles')."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp
import yaml

torch.set_default_dtype(torch.float64)


class TorchMLP(tnn.Module):
    def __init__(self, in_dim, hidden):
        super().__init__()
        self.affine_layers = tnn.ModuleList()
        last = in_dim
        for h in hidden:
            self.affine_layers.append(tnn.Linear(last, h))
            last = h

    def forward(self, x):
        for l in self.affine_layers:
            x = torch.relu(l(x))
        return x


class TorchPolicy(tnn.Module):
    """Reference PolicyGaussian layout (core/policy_gaussian.py)."""

    def __init__(self, in_dim, hidden, adim):
        super().__init__()
        self.net = TorchMLP(in_dim, hidden)
        self.action_mean = tnn.Linear(hidden[-1], adim)
        self.action_log_std = tnn.Parameter(torch.full((1, adim), -2.3))

    def forward(self, x):
        return self.action_mean(self.net(x))


class TorchValue(tnn.Module):
    def __init__(self, in_dim, hidden):
        super().__init__()
        self.net = TorchMLP(in_dim, hidden)
        self.value_head = tnn.Linear(hidden[-1], 1)

    def forward(self, x):
        return self.value_head(self.net(x))


class TorchVSNet(tnn.Module):
    """Reference VideoStateNet lstm layout (bi-dir cells rnn_f/rnn_b)."""

    def __init__(self, fdim, hdim):
        super().__init__()
        self.v_net = tnn.Module()
        self.v_net.rnn_f = tnn.LSTMCell(fdim, hdim // 2)
        self.v_net.rnn_b = tnn.LSTMCell(fdim, hdim // 2)


class FakeZF:
    pass


@pytest.mark.slow
def test_reference_checkpoint_drives_agent():
    from egopose_tpu.physics import parse_mjcf, build_model
    from egopose_tpu import envs
    from egopose_tpu.utils.config import EgoMimicConfig, make_env_params
    from egopose_tpu.rl import AgentEgo
    from egopose_tpu.models import torch_import as ti

    cfg_dict = yaml.safe_load(
        open("/root/reference/config/egomimic/subject_03.yml"))
    cfg_dict["env_episode_len"] = 8
    cfg = EgoMimicConfig(cfg_dict=cfg_dict)
    spec = parse_mjcf("/root/reference/assets/mujoco_models/humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    tables = envs.make_body_tables(spec)
    p = make_env_params(cfg, spec, obs_dim=115, dtype=np.float64)
    expert = envs.synthetic_experts(model, p, tables, spec, n_takes=1,
                                    t_len=64, seed=0)
    fdim = 16
    cnn_feat = np.random.RandomState(0).randn(1, 64, fdim)
    agent = AgentEgo(model, spec, p, tables, expert, cnn_feat, cfg,
                     batch_lanes=2, seed=0, dtype=jnp.float64)

    # build a reference-format checkpoint with torch modules
    torch.manual_seed(0)
    tp = TorchPolicy(115 + 128, [300, 200], spec.nu)
    tv = TorchValue(115 + 128, [300, 200])
    pvs = TorchVSNet(fdim, 128)
    vvs = TorchVSNet(fdim, 128)
    zf = FakeZF()
    rs = FakeZF()
    rs._n, rs._M, rs._S = 10, np.zeros(115), np.ones(115)
    zf.rs = rs
    model_cp = {"policy_dict": tp.state_dict(),
                "policy_vs_dict": pvs.state_dict(),
                "value_dict": tv.state_dict(),
                "value_vs_dict": vvs.state_dict(),
                "running_state": zf}

    imported = ti.import_mimic_checkpoint(model_cp, bi_dir=True)
    agent.load_checkpoint({
        "policy_dict": imported["policy_dict"],
        "policy_vs_dict": imported["policy_vs_dict"],
        "value_dict": imported["value_dict"],
        "value_vs_dict": imported["value_vs_dict"],
        "running_state": imported["running_state"],
    })
    assert float(agent.zstat.n) == 10

    # the agent's policy must equal the torch policy on identical inputs
    x = np.random.RandomState(1).randn(5, 115 + 128)
    mean, log_std = agent.policy_net.apply(agent.train_state.policy,
                                           jnp.asarray(x))
    with torch.no_grad():
        want = tp(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(mean), want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(log_std)[0], -2.3)

    # and the whole sampling path runs with the imported params
    batch, log = agent.sample(jax.random.PRNGKey(0), min_batch_size=8)
    assert np.isfinite(log.avg_c_reward)
