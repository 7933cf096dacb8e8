"""Sequence-parallel context encoding: the time-sharded conv pass over the
8-device virtual CPU mesh must equal the unsharded pass exactly (halo
exchange covers the receptive field; edge zeros coincide with conv padding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egopose_tpu.models.tcn import TemporalConvNet
from egopose_tpu.models.video_state_net import VideoStateNet
from egopose_tpu.parallel.mesh import make_mesh
from egopose_tpu.parallel.seqpar import (encode_time_sharded, tcn_halo,
                                         vsnet_encode_sp)


def test_tcn_halo():
    # two blocks (d=1,2), k=3: non-causal (k-1)*(1+2)=6 per side;
    # causal doubles it into the past only
    assert tcn_halo([64, 128], 3, causal=False) == (6, 6)
    assert tcn_halo([64, 128], 3, causal=True) == (12, 0)
    assert tcn_halo([32], 5, causal=False) == (4, 4)


@pytest.mark.parametrize("causal", [False, True])
def test_time_sharded_tcn_matches_unsharded(causal):
    net = TemporalConvNet([16, 24], kernel_size=3, dropout=0.0,
                          causal=causal)
    rng = np.random.RandomState(0)
    # T=163: not divisible by 8 (tail padding), chunks >= the causal halo 12
    x = jnp.asarray(rng.randn(2, 163, 8), jnp.float64)
    params = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(params, x, True)

    mesh = make_mesh(8)
    halo_l, halo_r = tcn_halo([16, 24], 3, causal)
    out = encode_time_sharded(mesh,
                              lambda w, m: net.apply(params, w, True, m),
                              x, halo_l, halo_r)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12)


def test_vsnet_encode_sp_matches_apply():
    vs = VideoStateNet(cnn_feat_dim=8, v_hdim=24, v_margin=5,
                       v_net_type="tcn",
                       v_net_param={"size": [16, 24], "dropout": 0.0},
                       causal=False)
    rng = np.random.RandomState(1)
    windows = jnp.asarray(rng.randn(3, 72, 8), jnp.float64)
    params = vs.init(jax.random.PRNGKey(1), windows)
    ref = vs.apply(params, windows)
    out = vsnet_encode_sp(make_mesh(8), vs, params, windows)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12)


def test_vregnet_apply_sp_matches_apply():
    from egopose_tpu.models.video_reg_net import VideoRegNet
    from egopose_tpu.parallel.seqpar import vregnet_apply_sp
    net = VideoRegNet(out_dim=12, v_hdim=24, cnn_fdim=8, no_cnn=True,
                      mlp_dim=(16,), v_net_type="tcn",
                      v_net_param={"size": [16, 24], "dropout": 0.0})
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(163, 2, 8), jnp.float64)   # (T, B, F)
    params = net.init(jax.random.PRNGKey(2), x)
    ref = net.apply(params, x)
    out = vregnet_apply_sp(make_mesh(8), net, params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12)


def test_vregnet_apply_sp_rejects_lstm():
    from egopose_tpu.models.video_reg_net import VideoRegNet
    from egopose_tpu.parallel.seqpar import vregnet_apply_sp
    net = VideoRegNet(out_dim=4, v_hdim=16, cnn_fdim=8, no_cnn=True,
                      v_net_type="lstm")
    x = jnp.zeros((24, 1, 8))
    params = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="TCN"):
        vregnet_apply_sp(make_mesh(8), net, params, x)


def test_vsnet_encode_sp_rejects_lstm():
    vs = VideoStateNet(cnn_feat_dim=8, v_hdim=16, v_margin=2,
                       v_net_type="lstm")
    windows = jnp.zeros((1, 20, 8))
    params = vs.init(jax.random.PRNGKey(0), windows)
    with pytest.raises(ValueError, match="TCN"):
        vsnet_encode_sp(make_mesh(8), vs, params, windows)


def test_time_sharded_rejects_thin_chunks():
    net = TemporalConvNet([16, 24], kernel_size=3, dropout=0.0)
    x = jnp.zeros((1, 24, 8))  # chunk 3 < halo 6
    params = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="halo"):
        encode_time_sharded(make_mesh(8),
                            lambda w, m: net.apply(params, w, True, m),
                            x, 6, 6)
