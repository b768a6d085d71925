"""Out-of-core HDF5 training source (data/ooc.py, round-2 VERDICT missing
item 1): fit() trains from disk with loss trajectories IDENTICAL to the
in-RAM hdf5 path, for both input pipelines, with compressed wire staging,
and through grain multiprocess prefetch (reader pickling)."""

import dataclasses
import os
import pickle

import numpy as np
import pytest

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mla_tpu.data.hdf5 import pack_hdf5
from mla_tpu.data.ooc import (
    HDF5ColumnReader,
    OutOfCoreDataset,
    generate_synthetic_pack,
    take_rows,
)
from mla_tpu.data.synthetic import synth_waveforms


@pytest.fixture(scope="module")
def packs(tmp_path_factory):
    d = tmp_path_factory.mktemp("ooc")
    x, y = synth_waveforms(48, 6, clip_seconds=1.0, multi_label=True, seed=0)
    train = str(d / "train.h5")
    pack_hdf5(train, x, y)
    xe, ye = synth_waveforms(16, 6, clip_seconds=1.0, multi_label=True, seed=9)
    ev = str(d / "eval.h5")
    pack_hdf5(ev, xe, ye)
    return train, ev, x, y


def test_reader_reads_rows_and_pickles(packs):
    train, _, x, _ = packs
    r = HDF5ColumnReader(train, "x")
    assert r.shape == x.shape and len(r) == len(x) and r.ndim == 2
    np.testing.assert_allclose(r[3], x[3], rtol=0, atol=0)
    np.testing.assert_allclose(r[2:5], x[2:5])
    r2 = pickle.loads(pickle.dumps(r))  # what grain mp workers do
    np.testing.assert_allclose(r2[7], x[7])
    assert r.nbytes == x.astype(np.float32).nbytes


def test_take_handles_unsorted_duplicates(packs):
    train, _, x, _ = packs
    ds = OutOfCoreDataset(train)
    idx = np.array([5, 1, 5, 40, 0, 1])
    got = ds.take(idx)
    np.testing.assert_allclose(got, x[idx])
    # the shared helper picks the right path for both flavors
    np.testing.assert_allclose(take_rows(ds, idx), x[idx])


def _cfg(train, ev, pipeline="numpy", staging="float32"):
    return Config(
        name=f"ooc_{pipeline}_{staging}",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                          n_classes=6, n_blocks=2, hidden_units=24,
                          conv_channels=(4, 8), convs_per_stage=1,
                          compute_dtype="float32"),
        data=DataConfig(dataset="hdf5", hdf5_path=train, eval_hdf5_path=ev,
                        out_of_core=True, pipeline=pipeline,
                        staging_dtype=staging, clip_seconds=1.0),
        train=TrainConfig(batch_size=8, num_steps=4, log_every=1,
                          eval_every=4, checkpoint_every=0, seed=0),
    )


@pytest.mark.parametrize("pipeline", ["numpy", "grain"])
def test_ooc_fit_matches_in_ram(packs, tmp_path, pipeline):
    """Disk-streamed training == in-RAM hdf5 training, loss for loss (the
    index stream is identical; only the read path differs)."""
    from mla_tpu.train.loop import fit

    train, ev, _, _ = packs
    cfg = _cfg(train, ev, pipeline)
    res = fit(cfg, workspace=str(tmp_path / "ooc"), log=False)
    ram = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, out_of_core=False)
    )
    ref = fit(ram, workspace=str(tmp_path / "ram"), log=False)
    got = [h["loss"] for h in res.history]
    want = [h["loss"] for h in ref.history]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res.eval_stats[-1]["mAP"],
                               ref.eval_stats[-1]["mAP"], atol=1e-6)


def test_ooc_fit_with_wire_staging(packs, tmp_path):
    """Per-batch adpcm4 wire encoding composes with disk reads (read f32
    rows -> encode -> decode in-step), same trajectory as in-RAM streamed
    adpcm4."""
    from mla_tpu.train.loop import fit

    train, ev, _, _ = packs
    cfg = _cfg(train, ev, "numpy", staging="adpcm4")
    res = fit(cfg, workspace=str(tmp_path / "ooc"), log=False)
    ram = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, out_of_core=False,
                                 device_resident=False),
    )
    ref = fit(ram, workspace=str(tmp_path / "ram"), log=False)
    np.testing.assert_allclose([h["loss"] for h in res.history],
                               [h["loss"] for h in ref.history],
                               rtol=1e-6, atol=1e-7)


def test_ooc_grain_mp_prefetch(packs):
    """The reader crosses grain's multiprocess boundary: workers re-open
    the file and the stream equals the in-process one."""
    from mla_tpu.data.pipeline import make_train_iterator

    train, _, x, y = packs
    ds = OutOfCoreDataset(train)
    it0 = make_train_iterator(ds, 8, seed=3, workers=0)
    it2 = make_train_iterator(ds, 8, seed=3, workers=2)
    for _ in range(3):
        bx0, by0 = next(it0)
        bx2, by2 = next(it2)
        np.testing.assert_allclose(bx0, bx2)
        np.testing.assert_allclose(by0, by2)


def test_generate_synthetic_pack_streams_to_disk(tmp_path):
    p = str(tmp_path / "big.h5")
    nbytes = generate_synthetic_pack(p, n_clips=40, n_classes=5,
                                     clip_seconds=0.5, rows_per_write=16,
                                     seed=1)
    assert nbytes == os.path.getsize(p)
    ds = OutOfCoreDataset(p)
    assert ds.x.shape == (40, 8000) and ds.y.shape == (40, 5)
    # chunk s=16 regenerates independently: row 16 == first row of chunk 2
    xw, _ = synth_waveforms(24, 5, 0.5, multi_label=True, seed=1 + 16)
    np.testing.assert_allclose(ds.x[16], xw[0])
    assert ds.y.sum() >= 40  # every clip labeled


def test_multi_file_reader_and_dataset(tmp_path):
    """Sharded packs (C2 load_many, out-of-core): a 2-file OutOfCoreDataset
    equals the single concatenated pack for scalar reads, increasing-array
    reads, random takes, and pickling across a worker boundary."""
    from mla_tpu.data.ooc import MultiColumnReader

    xa, ya = synth_waveforms(20, 6, clip_seconds=0.5, multi_label=True, seed=1)
    xb, yb = synth_waveforms(12, 6, clip_seconds=0.5, multi_label=True, seed=2)
    pa, pb = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    pack_hdf5(pa, xa, ya)
    pack_hdf5(pb, xb, yb)
    x = np.concatenate([xa, xb])

    r = MultiColumnReader([pa, pb])
    assert r.shape == x.shape and len(r) == 32
    np.testing.assert_allclose(r[5], x[5])
    np.testing.assert_allclose(r[25], x[25])  # second file
    np.testing.assert_allclose(r[np.array([3, 18, 19, 20, 31])],
                               x[[3, 18, 19, 20, 31]])
    r2 = pickle.loads(pickle.dumps(r))
    np.testing.assert_allclose(r2[21], x[21])

    ds = OutOfCoreDataset([pa, pb])
    assert ds.y.shape == (32, 6) and len(ds.ids) == 32
    idx = np.array([30, 2, 30, 19, 0])
    np.testing.assert_allclose(ds.take(idx), x[idx])


def test_make_dataset_multi_pack_paths(tmp_path):
    """hdf5_path accepts comma lists and globs for BOTH readers; the
    in-RAM and out-of-core datasets agree row for row."""
    from mla_tpu.config import DataConfig
    from mla_tpu.data.synthetic import make_dataset

    xa, ya = synth_waveforms(10, 4, clip_seconds=0.5, multi_label=True, seed=3)
    xb, yb = synth_waveforms(6, 4, clip_seconds=0.5, multi_label=True, seed=4)
    pack_hdf5(str(tmp_path / "shard_0.h5"), xa, ya)
    pack_hdf5(str(tmp_path / "shard_1.h5"), xb, yb)
    x = np.concatenate([xa, xb])

    comma = f"{tmp_path}/shard_0.h5, {tmp_path}/shard_1.h5"
    globp = f"{tmp_path}/shard_*.h5"
    for spec in (comma, globp):
        ram = make_dataset(DataConfig(dataset="hdf5", hdf5_path=spec), 4)
        assert ram.x.shape == (16, 8000)
        np.testing.assert_allclose(ram.x, x)
        ooc = make_dataset(
            DataConfig(dataset="hdf5", hdf5_path=spec, out_of_core=True), 4)
        np.testing.assert_allclose(take_rows(ooc, np.arange(16)), ram.x)
        np.testing.assert_allclose(ooc.y, ram.y)
    with pytest.raises(FileNotFoundError):
        make_dataset(DataConfig(dataset="hdf5",
                                hdf5_path=f"{tmp_path}/nope_*.h5"), 4)
