"""Checkpoint interop: torch reference modules vs our flax modules must give
identical outputs after import (torch cpu is available as the oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from egopose_tpu.models import torch_import as ti

torch.set_default_dtype(torch.float64)


class TorchMLP(tnn.Module):
    """Transcription of the reference MLP layout (models/mlp.py)."""

    def __init__(self, in_dim, hidden, act="relu"):
        super().__init__()
        self.affine_layers = tnn.ModuleList()
        last = in_dim
        for h in hidden:
            self.affine_layers.append(tnn.Linear(last, h))
            last = h
        self.act = torch.relu if act == "relu" else torch.tanh

    def forward(self, x):
        for l in self.affine_layers:
            x = self.act(l(x))
        return x


class TorchPolicy(tnn.Module):
    def __init__(self, in_dim, hidden, adim, log_std=-2.3):
        super().__init__()
        self.net = TorchMLP(in_dim, hidden)
        self.action_mean = tnn.Linear(hidden[-1], adim)
        self.action_log_std = tnn.Parameter(torch.ones(1, adim) * log_std)

    def forward(self, x):
        return self.action_mean(self.net(x))


def test_policy_gaussian_import_matches_torch():
    tp = TorchPolicy(20, [32, 16], 5)
    x = np.random.RandomState(0).randn(7, 20)
    with torch.no_grad():
        want = tp(torch.tensor(x)).numpy()
    from egopose_tpu.rl.nets import PolicyGaussian
    net = PolicyGaussian(action_dim=5, hidden_dims=(32, 16),
                         activation="relu", log_std_init=-2.3)
    params = ti.import_policy_gaussian(tp.state_dict())
    mean, log_std = net.apply({"params": params["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), want, atol=1e-12)
    np.testing.assert_allclose(np.asarray(log_std)[0], -2.3)


def test_lstm_import_matches_torch():
    """Bi-LSTM batch unroll must match the reference RNN exactly."""
    torch.manual_seed(0)
    in_dim, hdim, t, b = 6, 8, 11, 3

    class TorchRNN(tnn.Module):
        """Transcription of models/rnn.py batch mode, bi_dir."""

        def __init__(self):
            super().__init__()
            self.rnn_f = tnn.LSTMCell(in_dim, hdim // 2)
            self.rnn_b = tnn.LSTMCell(in_dim, hdim // 2)

        def run(self, x, cell, reverse):
            hx = torch.zeros(x.size(1), hdim // 2)
            cx = torch.zeros(x.size(1), hdim // 2)
            out = []
            idx = reversed(range(x.size(0))) if reverse else range(x.size(0))
            for i in idx:
                hx, cx = cell(x[i], (hx, cx))
                out.append(hx.unsqueeze(0))
            if reverse:
                out.reverse()
            return torch.cat(out, 0)

        def forward(self, x):
            return torch.cat([self.run(x, self.rnn_f, False),
                              self.run(x, self.rnn_b, True)], 2)

    trnn = TorchRNN()
    x = np.random.RandomState(1).randn(t, b, in_dim)
    with torch.no_grad():
        want = trnn(torch.tensor(x)).numpy()

    from egopose_tpu.models.rnn import RNN
    net = RNN(in_dim, hdim, "lstm", bi_dir=True)
    params = {"params": ti.import_rnn(
        {k: v.numpy() for k, v in trnn.state_dict().items()}, "", True)}
    got = net.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_running_state_import():
    class RS:
        pass

    rs = RS()
    rs._n = 100
    rs._M = np.arange(5.0)
    rs._S = np.ones(5) * 2
    zf = RS()
    zf.rs = rs
    stat = ti.import_running_state(zf)
    assert float(stat.n) == 100
    np.testing.assert_allclose(np.asarray(stat.mean), rs._M)
    from egopose_tpu.ops import running_norm
    np.testing.assert_allclose(np.asarray(running_norm.std(stat)),
                               np.sqrt(rs._S / 99))
