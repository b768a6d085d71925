"""End-to-end C2->C12 integration: pack a dataset to HDF5, train from the
pack, auto-resume continues from the checkpoint (SURVEY.md §5 recovery)."""

import dataclasses

import numpy as np

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mla_tpu.data import hdf5
from mla_tpu.data.synthetic import make_dataset, synth_features
from mla_tpu.train.loop import fit


def _pack(tmp_path, n_classes=8):
    xtr, ytr = synth_features(64, n_classes, seed=0)
    xev, yev = synth_features(24, n_classes, seed=10_000)
    ptr, pev = str(tmp_path / "train.h5"), str(tmp_path / "eval.h5")
    hdf5.pack_hdf5(ptr, xtr, ytr.astype(bool))
    hdf5.pack_hdf5(pev, xev, yev.astype(bool))
    return ptr, pev


def _cfg(tmp_path, ptr, pev, steps=20):
    return Config(
        name="hdf5_test",
        workspace=str(tmp_path / "ws"),
        model=ModelConfig(variant="multi_level_attention", trunk="none", n_classes=8,
                          n_blocks=2, hidden_units=64, compute_dtype="float32"),
        data=DataConfig(dataset="hdf5", hdf5_path=ptr, eval_hdf5_path=pev),
        train=TrainConfig(batch_size=16, num_steps=steps, eval_every=steps,
                          checkpoint_every=10, log_every=5, data_parallel=1),
    )


def test_train_from_hdf5_pack(tmp_path):
    ptr, pev = _pack(tmp_path)
    res = fit(_cfg(tmp_path, ptr, pev), log=False)
    assert np.isfinite(res.history[-1]["loss"])
    assert res.eval_stats[-1]["mAP"] > 0


def test_hdf5_kind_detection(tmp_path):
    ptr, _ = _pack(tmp_path)
    ds = make_dataset(DataConfig(dataset="hdf5", hdf5_path=ptr), 8, "train")
    assert ds.kind == "features" and ds.x.shape[-1] == 128
    # waveform pack -> waveform kind
    pw = str(tmp_path / "wav.h5")
    hdf5.pack_hdf5(pw, np.zeros((4, 16000), np.float32), np.eye(4, dtype=bool))
    dsw = make_dataset(DataConfig(dataset="hdf5", hdf5_path=pw), 4, "train")
    assert dsw.kind == "waveform"


def test_auto_resume_continues(tmp_path):
    ptr, pev = _pack(tmp_path)
    cfg10 = _cfg(tmp_path, ptr, pev, steps=10)
    fit(cfg10, log=False)  # leaves a checkpoint at step 10
    cfg20 = dataclasses.replace(
        cfg10, train=dataclasses.replace(cfg10.train, num_steps=20)
    )
    res = fit(cfg20, log=False, auto_resume=True)
    assert int(res.state.step) == 20
    # resumed run must match an uninterrupted 20-step run exactly
    res_full = fit(dataclasses.replace(cfg20, workspace=str(tmp_path / "ws2")), log=False)
    import jax

    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        res.state.params, res_full.state.params,
    )
    assert all(jax.tree.leaves(same))
