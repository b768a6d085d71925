"""Grain pipeline (T9) + profiling harness + labels tests."""

import numpy as np
import pytest

from mla_tpu.data import labels
from mla_tpu.data.pipeline import balanced_index_dataset, make_train_iterator
from mla_tpu.data.synthetic import ArrayDataset
from mla_tpu.utils import profiling


def _longtail(rng, n=1500, c=12):
    y = np.zeros((n, c), bool)
    for k in range(c):
        y[:, k] = rng.random(n) < (0.8 * 0.5**k + 0.004)
    y[~y.any(1), 0] = True
    return y


def test_balanced_index_dataset_is_deterministic(rng):
    y = _longtail(rng)
    a = balanced_index_dataset(y, seed=3)
    b = balanced_index_dataset(y, seed=3)
    ia = [a[i] for i in range(200)]
    ib = [b[i] for i in range(200)]
    assert ia == ib
    c = balanced_index_dataset(y, seed=4)
    assert [c[i] for i in range(200)] != ia


def test_balanced_index_dataset_balances(rng):
    y = _longtail(rng)
    ds = balanced_index_dataset(y, seed=0)
    idx = np.array([ds[i] for i in range(6000)])
    frac = y[idx].sum(0) / y[idx].sum()
    assert frac.min() > (1 / y.shape[1]) / 3, frac


def test_balanced_index_dataset_random_access_matches_stream(rng):
    """Statelessness: ds[i] independent of access order (resume anywhere)."""
    y = _longtail(rng)
    ds = balanced_index_dataset(y, seed=9)
    forward = [ds[i] for i in range(50)]
    assert ds[25] == forward[25] and ds[49] == forward[49]


def test_make_train_iterator_batches(rng):
    y = _longtail(rng, n=300)
    x = rng.standard_normal((300, 10, 16)).astype(np.float32)
    ds = ArrayDataset(x, y.astype(np.float32), np.arange(300), "features")
    it = make_train_iterator(ds, batch_size=32, seed=0)
    bx, by = next(it)
    assert bx.shape == (32, 10, 16) and by.shape == (32, y.shape[1])
    # resume-by-skip reproduces the stream
    it2 = make_train_iterator(ds, batch_size=32, seed=0, start_index=1)
    b2x, _ = next(it2)
    nx, _ = next(it)
    np.testing.assert_array_equal(b2x, nx)


def test_host_sharded_stream_reassembles_global_batches(rng):
    """T9 multi-host: concatenating every host's step-s sub-batch must
    reproduce the unsharded stream's batch s exactly, and each host's
    stream must resume at a global batch index in O(1)."""
    y = _longtail(rng, n=400)
    x = rng.standard_normal((400, 6)).astype(np.float32)
    ds = ArrayDataset(x, y.astype(np.float32), np.arange(400), "features")
    B, H = 24, 4
    whole = make_train_iterator(ds, B, seed=2)
    hosts = [make_train_iterator(ds, B, seed=2, host_index=h, host_count=H)
             for h in range(H)]
    for _ in range(3):
        wx, wy = next(whole)
        parts = [next(it) for it in hosts]
        np.testing.assert_array_equal(np.concatenate([p[0] for p in parts]), wx)
        np.testing.assert_array_equal(np.concatenate([p[1] for p in parts]), wy)
    # O(1) resume at global batch 2 reproduces host 1's third sub-batch
    resumed = make_train_iterator(ds, B, seed=2, start_index=2,
                                  host_index=1, host_count=H)
    fresh = make_train_iterator(ds, B, seed=2, host_index=1, host_count=H)
    next(fresh); next(fresh)
    np.testing.assert_array_equal(next(resumed)[0], next(fresh)[0])
    with pytest.raises(ValueError, match="divisible"):
        next(make_train_iterator(ds, 25, host_count=4))
    with pytest.raises(ValueError, match="host_index"):
        next(make_train_iterator(ds, 24, host_index=4, host_count=4))


def test_time_fn_returns_sane_numbers():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    stats = profiling.time_fn(f, x, iters=3, warmup=1)
    assert stats["mean_ms"] > 0 and stats["iters_per_sec"] > 0


def test_step_timer():
    t = profiling.StepTimer(window=4)
    t.start()
    for _ in range(6):
        t.step(10)
    assert t.items_per_sec > 0 and t.mean_step_ms >= 0
    assert len(t._times) == 4  # rolling window


def test_labels():
    assert len(labels.ESC50_LABELS) == 50
    assert len(labels.URBANSOUND8K_LABELS) == 10
    assert labels.labels_for("synthetic_esc50", 50)[0] == "dog"
    generic = labels.labels_for("synthetic_audioset", 527)
    assert generic[526] == "class_526"
    # class-count mismatch falls back to generic names rather than erroring
    assert labels.labels_for("synthetic_esc50", 49)[0] == "class_0"


def test_audioset_csv_loader(tmp_path):
    p = tmp_path / "class_labels_indices.csv"
    p.write_text('index,mid,display_name\n0,/m/0,"Speech"\n1,/m/1,"Music"\n')
    names = labels.load_audioset_labels(str(p))
    assert names == ["Speech", "Music"]
