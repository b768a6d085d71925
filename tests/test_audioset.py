"""AudioSet TFRecord round-trip: write release-format SequenceExamples,
pack to HDF5, load through the standard path, train a step."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mla_tpu.data import audioset, hdf5


def _fixture(tmp_path, rng, n=12, t=10):
    x = rng.integers(0, 256, size=(n, t, 128), dtype=np.uint8)
    labels = [list(rng.choice(527, size=rng.integers(1, 4), replace=False)) for _ in range(n)]
    p = str(tmp_path / "shard-00000.tfrecord")
    audioset.write_sequence_examples(p, x, labels)
    return p, x, labels


def test_roundtrip_tfrecord_to_hdf5(tmp_path, rng):
    p, x, labels = _fixture(tmp_path, rng)
    out = str(tmp_path / "bal_train.h5")
    n = audioset.pack_audioset(str(tmp_path / "*.tfrecord"), out)
    assert n == len(x)
    xf, yf, ids = hdf5.load_data(out)
    assert xf.shape == (len(x), 10, 128) and yf.shape == (len(x), 527)
    # uint8 was stored pre-quantized; loader dequantizes with (q-128)/128
    np.testing.assert_allclose(xf, hdf5.uint8_to_float32(x), atol=1e-6)
    for i, ls in enumerate(labels):
        assert set(np.nonzero(yf[i])[0]) == set(ls)
    assert ids[0] == b"vid000000"


def test_short_clips_edge_padded(tmp_path, rng):
    x = rng.integers(0, 256, size=(2, 6, 128), dtype=np.uint8)  # 6 < 10 frames
    p = str(tmp_path / "short.tfrecord")
    audioset.write_sequence_examples(p, x, [[1], [2]])
    xs, ys, _ = audioset.read_sequence_examples([p])
    assert xs.shape == (2, 10, 128)
    np.testing.assert_array_equal(xs[0, 6], xs[0, 5])  # padded by repeat


def test_missing_glob_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        audioset.pack_audioset(str(tmp_path / "nope*.tfrecord"), str(tmp_path / "o.h5"))
