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


# ---------------------------------------------------------------------------
# CNN / TCN / VideoRegNet interop (VERDICT r1 item 2)
# ---------------------------------------------------------------------------

class TorchChomp(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.n = n

    def forward(self, x):
        return x[:, :, :-self.n].contiguous()


class TorchTemporalBlock(tnn.Module):
    """Transcription of the reference TemporalBlock (models/tcn.py:15-50):
    weight-normed dilated Conv1d x2 (+Chomp when causal) with residual."""

    def __init__(self, n_in, n_out, k, dilation, causal):
        super().__init__()
        pad = (k - 1) * dilation // (1 if causal else 2)
        wn = torch.nn.utils.weight_norm
        self.conv1 = wn(tnn.Conv1d(n_in, n_out, k, padding=pad,
                                   dilation=dilation))
        self.conv2 = wn(tnn.Conv1d(n_out, n_out, k, padding=pad,
                                   dilation=dilation))
        mods = [self.conv1] + ([TorchChomp(pad)] if causal else []) \
            + [tnn.ReLU(), self.conv2] + ([TorchChomp(pad)] if causal else []) \
            + [tnn.ReLU()]
        self.net = tnn.Sequential(*mods)
        self.downsample = tnn.Conv1d(n_in, n_out, 1) if n_in != n_out else None

    def forward(self, x):
        out = self.net(x)
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + res)


class TorchTCN(tnn.Module):
    def __init__(self, n_in, channels, k=3, causal=False):
        super().__init__()
        layers = []
        for i, ch in enumerate(channels):
            inp = n_in if i == 0 else channels[i - 1]
            layers.append(TorchTemporalBlock(inp, ch, k, 2 ** i, causal))
        self.network = tnn.Sequential(*layers)

    def forward(self, x):
        return self.network(x)


@pytest.mark.parametrize("causal", [False, True])
def test_tcn_import_matches_torch(causal):
    """Weight-norm TCN import: weight_g/weight_v -> WeightNorm scale+kernel."""
    torch.manual_seed(2)
    ttcn = TorchTCN(6, [12, 16], k=3, causal=causal).eval()
    x = np.random.RandomState(2).randn(4, 6, 20)  # (B, C, L)
    with torch.no_grad():
        want = ttcn(torch.tensor(x)).numpy()  # (B, C', L)

    from egopose_tpu.models.tcn import TemporalConvNet
    net = TemporalConvNet([12, 16], 3, 0.2, causal)
    sd = {k: v.numpy() for k, v in ttcn.state_dict().items()}
    params = {"params": ti.import_tcn(sd, "")}
    got = net.apply(params, jnp.asarray(x).transpose(0, 2, 1))  # (B, L, C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-10)


class TorchBasicBlock(tnn.Module):
    """torchvision.models.resnet.BasicBlock layout (same state_dict keys)."""

    def __init__(self, n_in, n_out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(n_in, n_out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(n_out)
        self.conv2 = tnn.Conv2d(n_out, n_out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(n_out)
        self.downsample = None
        if stride != 1 or n_in != n_out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(n_in, n_out, 1, stride, bias=False),
                tnn.BatchNorm2d(n_out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet18(tnn.Module):
    """torchvision resnet18 layout under the reference's 'resnet.' wrapper
    (models/resnet.py replaces fc with a Linear(512, out_dim))."""

    def __init__(self, out_dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        for li, w in enumerate(widths):
            prev = 64 if li == 0 else widths[li - 1]
            stride = 1 if li == 0 else 2
            setattr(self, f"layer{li+1}", tnn.Sequential(
                TorchBasicBlock(prev, w, stride), TorchBasicBlock(w, w)))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, out_dim)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li+1}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _randomize_bn_stats(mod, seed):
    """Give BN layers non-trivial running stats so the import is actually
    tested against them (fresh init has mean=0/var=1, which would also pass
    with an importer that drops the stats)."""
    rng = np.random.RandomState(seed)
    for m in mod.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            n = m.running_mean.numel()
            m.running_mean.copy_(torch.tensor(rng.randn(n) * 0.3))
            m.running_var.copy_(torch.tensor(rng.rand(n) + 0.5))
            m.weight.data.copy_(torch.tensor(rng.rand(n) + 0.5))
            m.bias.data.copy_(torch.tensor(rng.randn(n) * 0.1))


def test_resnet18_import_matches_torch():
    torch.manual_seed(3)
    tnet = TorchResNet18(16).eval()
    _randomize_bn_stats(tnet, 3)
    x = np.random.RandomState(3).randn(2, 3, 64, 64)
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy()

    from egopose_tpu.models.resnet import ResNet18
    net = ResNet18(16)
    sd = {f"resnet.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = ti.import_resnet18(sd, "resnet.")
    got = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x).transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


class TorchMobileNet(tnn.Module):
    """Transcription of the reference MobileNet (models/mobile_net.py)."""

    def __init__(self, out_dim):
        super().__init__()

        def conv_bn(inp, oup, s):
            return tnn.Sequential(tnn.Conv2d(inp, oup, 3, s, 1, bias=False),
                                  tnn.BatchNorm2d(oup), tnn.ReLU())

        def conv_dw(inp, oup, s):
            return tnn.Sequential(
                tnn.Conv2d(inp, inp, 3, s, 1, groups=inp, bias=False),
                tnn.BatchNorm2d(inp), tnn.ReLU(),
                tnn.Conv2d(inp, oup, 1, 1, 0, bias=False),
                tnn.BatchNorm2d(oup), tnn.ReLU())

        plan = [(32, 64, 1), (64, 128, 2), (128, 128, 1), (128, 256, 2),
                (256, 256, 1), (256, 512, 2), (512, 512, 1), (512, 512, 1),
                (512, 512, 1), (512, 512, 1), (512, 512, 1), (512, 1024, 2),
                (1024, 1024, 1)]
        self.model = tnn.Sequential(
            conv_bn(3, 32, 2), *[conv_dw(i, o, s) for i, o, s in plan],
            tnn.AvgPool2d(7))
        self.fc = tnn.Linear(1024, out_dim)

    def forward(self, x):
        return self.fc(self.model(x).view(-1, 1024))


def test_mobilenet_import_matches_torch():
    torch.manual_seed(4)
    tnet = TorchMobileNet(8).eval()
    _randomize_bn_stats(tnet, 4)
    x = np.random.RandomState(4).randn(1, 3, 224, 224)
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy()

    from egopose_tpu.models.mobile_net import MobileNet
    net = MobileNet(8)
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = ti.import_mobile_net(sd, "")
    got = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x).transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


class TorchVideoRegNet(tnn.Module):
    """Transcription of models/video_reg_net.py (no_cnn feature-input mode,
    which is how eval consumes it -- state_reg.py save_inf)."""

    def __init__(self, out_dim, v_hdim, cnn_fdim, mlp_dim, v_net_type,
                 tcn_size=None, causal=False):
        super().__init__()
        self.v_net_type = v_net_type
        self.v_hdim = v_hdim
        if v_net_type == "lstm":
            self.v_net = TorchBiRNN(cnn_fdim, v_hdim, bi_dir=not causal)
        else:
            self.v_net = TorchTCN(cnn_fdim, tcn_size, causal=causal)
        self.mlp = TorchMLP(v_hdim, mlp_dim, "relu")
        self.linear = tnn.Linear(mlp_dim[-1], out_dim)

    def forward(self, x):  # x: (T, B, cnn_fdim)
        if self.v_net_type == "tcn":
            x = self.v_net(x.permute(1, 2, 0)).permute(2, 0, 1)
        else:
            x = self.v_net(x)
        return self.linear(self.mlp(x.reshape(-1, self.v_hdim)))


class TorchBiRNN(tnn.Module):
    """Transcription of models/rnn.py batch mode (optionally bidirectional)."""

    def __init__(self, in_dim, out_dim, bi_dir):
        super().__init__()
        self.bi_dir = bi_dir
        hdim = out_dim // 2 if bi_dir else out_dim
        self.rnn_f = tnn.LSTMCell(in_dim, hdim)
        if bi_dir:
            self.rnn_b = tnn.LSTMCell(in_dim, hdim)

    def run(self, x, cell, reverse):
        hx = torch.zeros(x.size(1), cell.hidden_size)
        cx = torch.zeros(x.size(1), cell.hidden_size)
        out = []
        idx = reversed(range(x.size(0))) if reverse else range(x.size(0))
        for i in idx:
            hx, cx = cell(x[i], (hx, cx))
            out.append(hx.unsqueeze(0))
        if reverse:
            out.reverse()
        return torch.cat(out, 0)

    def forward(self, x):
        out = self.run(x, self.rnn_f, False)
        if self.bi_dir:
            out = torch.cat([out, self.run(x, self.rnn_b, True)], 2)
        return out


@pytest.mark.parametrize("v_net_type", ["lstm", "tcn"])
def test_video_reg_net_import_matches_torch(v_net_type):
    torch.manual_seed(5)
    cnn_fdim, v_hdim, out_dim, t, b = 10, 16, 7, 9, 2
    tnet = TorchVideoRegNet(out_dim, v_hdim, cnn_fdim, (24, 12), v_net_type,
                            tcn_size=[12, 16]).eval()
    x = np.random.RandomState(5).randn(t, b, cnn_fdim)
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy().reshape(t, b, out_dim)

    from egopose_tpu.models.video_reg_net import VideoRegNet
    net = VideoRegNet(out_dim, v_hdim, cnn_fdim, no_cnn=True,
                      mlp_dim=(24, 12), v_net_type=v_net_type,
                      v_net_param={"size": [12, 16]})
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = ti.import_video_reg_net(sd, v_net_type=v_net_type)
    got = net.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_statereg_checkpoint_import():
    """Reference statereg pickle format ((model_cp, meta), state_reg.py:91-95)."""
    torch.manual_seed(6)
    tnet = TorchVideoRegNet(5, 8, 6, (16,), "lstm").eval()
    mean, std = np.arange(5.0), np.arange(1.0, 6.0)
    cp = ({"state_net_dict": tnet.state_dict()}, {"mean": mean, "std": std})
    variables, got_mean, got_std = ti.import_statereg_checkpoint(cp)
    np.testing.assert_allclose(got_mean, mean)
    np.testing.assert_allclose(got_std, std)

    from egopose_tpu.models.video_reg_net import VideoRegNet
    net = VideoRegNet(5, 8, 6, no_cnn=True, mlp_dim=(16,))
    x = np.random.RandomState(6).randn(4, 2, 6)
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy().reshape(4, 2, 5)
    got = net.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)
