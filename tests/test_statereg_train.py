"""Statereg training loop smoke + TPU-fix regression tests: chunk batching
on the (T,B,...) batch axis, per-step dropout keys, prefetch pipeline."""
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_statereg_train_batched(tmp_path, monkeypatch):
    cfg = yaml.safe_load(open(f"{REPO}/config/statereg/subject_03.yml"))
    cfg.update(dict(fr_num=24, fr_margin=3, v_hdim=16, cnn_fdim=12,
                    mlp_dim=[24], num_epoch=2, save_model_interval=2,
                    seed=5))
    (tmp_path / "config/statereg").mkdir(parents=True)
    yaml.dump(cfg, open(tmp_path / "config/statereg/tiny.yml", "w"))
    monkeypatch.chdir(tmp_path)

    from egopose_tpu.cli import state_reg
    variables, dataset = state_reg.main(
        ["--cfg", "tiny", "--mode", "train", "--synthetic",
         "--batch-chunks", "3"])
    assert "batch_stats" in variables  # resnet BN trained
    # checkpoint written with (model_cp, meta) reference format
    cp = "results/statereg/tiny/models/iter_0002.p"
    assert os.path.exists(cp)
    import pickle
    model_cp, meta = pickle.load(open(cp, "rb"))
    assert "state_net_dict" in model_cp
    assert meta["mean"].shape == (dataset.traj_dim,)

    # the epoch log carries the frames/s throughput measurement
    log = open("results/statereg/tiny/log/log.txt").read()
    assert "frames/s" in log
    assert "3 chunks per batch" in log


def test_statereg_dropout_keys_differ_per_step():
    """Regression for the constant-PRNGKey(0) dropout bug: two steps of a
    dropout-bearing net must see different masks."""
    import jax
    import jax.numpy as jnp
    from egopose_tpu.models.tcn import TemporalConvNet

    net = TemporalConvNet([8, 8], 3, 0.5, False)
    x = jnp.ones((2, 16, 4))
    params = net.init(jax.random.PRNGKey(0), x)
    base = jax.random.PRNGKey(1)
    outs = [net.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.fold_in(base, step)})
            for step in (0, 1)]
    assert np.abs(np.asarray(outs[0]) - np.asarray(outs[1])).max() > 1e-6


def test_two_channel_ingest_matches_host_padding():
    """The production pipeline ships raw 2-channel flow and appends the zero
    third channel on device (pad_flow_channels); result must be bit-identical
    to the old host-side 3-channel prepare_of path, including tail padding
    and the mask."""
    import jax.numpy as jnp
    from egopose_tpu.cli.state_reg import prepare_of, pad_flow_channels

    rng = np.random.RandomState(3)
    for t, fr_num in [(7, 12), (12, 12)]:
        of_np = rng.randn(t, 8, 8, 2).astype(np.float32)
        of3, mask3 = prepare_of(of_np, fr_num, np.float32)
        of2, mask2 = prepare_of(of_np, fr_num, np.float32,
                                pad_channels=False)
        assert of2.shape[-1] == 2 and of3.shape[-1] == 3
        np.testing.assert_array_equal(mask2, mask3)
        padded = np.asarray(pad_flow_channels(jnp.asarray(of2)))
        np.testing.assert_array_equal(padded, of3)
        # idempotent on already-3-channel input
        np.testing.assert_array_equal(
            np.asarray(pad_flow_channels(jnp.asarray(of3))), of3)
