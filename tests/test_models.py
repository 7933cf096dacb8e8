"""Model-zoo shape/variant tests (the reference's __main__ smoke blocks,
SURVEY §4, as real tests)."""
import numpy as np
import jax
import jax.numpy as jnp

from egopose_tpu.models import (MLP, RNN, TemporalConvNet, VideoStateNet)
from egopose_tpu.models.video_forecast_net import VideoForecastNet
from egopose_tpu.models.video_reg_net import VideoRegNet
from egopose_tpu.models.mobile_net import MobileNet
from egopose_tpu.models.resnet import ResNet18


def test_rnn_shapes():
    net = RNN(12, 24, "gru", bi_dir=True)
    x = jnp.zeros((5, 3, 12))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (5, 3, 24)  # models/rnn.py __main__ check


def test_tcn_shapes_and_causality():
    net = TemporalConvNet([4, 8], kernel_size=3, dropout=0.0, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 6))
    params = net.init(jax.random.PRNGKey(1), x)
    out = net.apply(params, x)
    assert out.shape == (2, 40, 8)
    # causal: changing a future frame must not affect earlier outputs
    x2 = x.at[:, 30:].add(1.0)
    out2 = net.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out[:, :30]),
                               np.asarray(out2[:, :30]), atol=1e-6)
    assert float(jnp.abs(out[:, 35:] - out2[:, 35:]).max()) > 1e-3


def test_video_state_net_tcn_variant():
    net = VideoStateNet(16, v_hdim=8, v_margin=3, v_net_type="tcn",
                        v_net_param={"size": [4, 8], "dropout": 0.0})
    x = jnp.zeros((2, 26, 16))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 20, 8)  # margins trimmed


def test_video_forecast_net_dynamic_v():
    net = VideoForecastNet(16, state_dim=10, v_hdim=8, v_margin=4,
                           s_net_type="lstm", s_hdim=6, dynamic_v=True)
    win = jnp.zeros((3, 12, 16))
    params = net.init(jax.random.PRNGKey(0), win, method=net.encode_video)
    out = net.apply(params, win, method=net.encode_video)
    assert out.shape == (3, 8, 8)  # dynamic: per-step unroll past the margin


def test_video_reg_net_cnn_paths():
    # mobile CNN path on tiny frames
    net = VideoRegNet(out_dim=7, v_hdim=8, cnn_fdim=8, cnn_type="mobile",
                      frame_shape=(32, 32, 3), mlp_dim=(16,),
                      v_net_type="lstm")
    x = jnp.zeros((3, 2, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (3, 2, 7)
    feats = net.apply(variables, jnp.zeros((4, 32, 32, 3)), train=False,
                      method=net.cnn_feature)
    assert feats.shape == (4, 8)


def test_resnet18_shapes():
    net = ResNet18(out_dim=16)
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (2, 16)
    # param count sanity: resnet18 trunk ~11.2M
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 10_000_000 < n < 13_000_000


def test_mobilenet_param_count():
    net = MobileNet(out_dim=16)
    x = jnp.zeros((1, 224, 224, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 3_000_000 < n < 4_500_000  # mobilenet-v1 ~3.2M + head


def test_causal_encode_matches_per_prefix_recomputation():
    """--causal online inference: causal_encode must equal the reference's
    per-step context re-initialization (ego_mimic_eval.py:143-145) --
    run the net on the prefix [0, t+2m] and take the trimmed output at t."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from egopose_tpu.models.video_state_net import VideoStateNet

    t_len, m, n, fdim, vh = 18, 3, 2, 5, 8
    net = VideoStateNet(fdim, vh, m, "lstm", None, causal=False)
    feats = jnp.asarray(np.random.RandomState(0).randn(n, t_len, fdim))
    params = net.init(jax.random.PRNGKey(0), feats)

    got = net.apply(params, feats, method=net.causal_encode)
    assert got.shape == (n, t_len - 2 * m, vh)
    for t in range(t_len - 2 * m):
        prefix_out = net.apply(params, feats[:, :t + 2 * m + 1])
        np.testing.assert_allclose(np.asarray(got[:, t]),
                                   np.asarray(prefix_out[:, t]),
                                   atol=1e-10, err_msg=f"t={t}")

    # a causal net's full pass already IS the online answer
    cnet = VideoStateNet(fdim, vh, m, "lstm", None, causal=True)
    cparams = cnet.init(jax.random.PRNGKey(1), feats)
    np.testing.assert_allclose(
        np.asarray(cnet.apply(cparams, feats, method=cnet.causal_encode)),
        np.asarray(cnet.apply(cparams, feats)), atol=0)
