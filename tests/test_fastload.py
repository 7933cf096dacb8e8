"""Native packed-flow loader: builds, reads correctly, beats garbage."""
import numpy as np
import pytest

from egopose_tpu.data.fastload import PackedFlowReader, get_lib


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    d = tmp_path_factory.mktemp("flow")
    rng = np.random.RandomState(0)
    paths = {}
    data = {}
    for take in ("a", "b"):
        arr = rng.randn(40, 8, 8, 2).astype(np.float32)
        p = str(d / f"{take}.npy")
        np.save(p, arr)
        paths[take] = p
        data[take] = arr
    return paths, data


def test_native_lib_builds():
    assert get_lib() is not None, "cc build of fastload.c failed"


def test_read_batch_matches_numpy(packed):
    paths, data = packed
    reader = PackedFlowReader(paths, n_threads=4)
    assert set(reader.native.keys()) == {"a", "b"}  # native path active
    reqs = [("a", 0, 5), ("b", 10, 7), ("a", 35, 5), ("b", 0, 40)]
    outs = reader.read_batch(reqs)
    for (take, s, c), out in zip(reqs, outs):
        np.testing.assert_array_equal(out, data[take][s:s + c])
