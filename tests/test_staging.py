"""Compressed HBM-resident dataset staging (DataConfig.staging_dtype):
the training set lives in device memory in wire form (int16 / mu-law /
4-bit ADPCM) and each batch is decoded on device inside the gather
program. Contract: fit() runs end-to-end and learns for every staging
dtype, int16 staging is within one PCM16 LSB of the float32 batches, and
invalid configurations fail loudly.
"""

import dataclasses

import numpy as np
import pytest

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mla_tpu.train.loop import fit


def _cfg(tmp_path, stage, steps=6):
    return Config(
        name=f"staging_{stage}",
        workspace=str(tmp_path / stage),
        model=ModelConfig(variant="single_attention", trunk="cnn",
                          n_classes=6, n_blocks=1, hidden_units=24,
                          conv_channels=(4, 8), convs_per_stage=1,
                          compute_dtype="float32"),
        data=DataConfig(dataset="synthetic_esc50", n_train_clips=16,
                        n_eval_clips=8, clip_seconds=2.0,
                        balanced_sampling=False, staging_dtype=stage),
        train=TrainConfig(batch_size=4, num_steps=steps, eval_every=1000,
                          checkpoint_every=0, log_every=1,
                          data_parallel=1),
    )


@pytest.mark.parametrize("stage", ["int16", "uint8", "adpcm4"])
def test_fit_trains_with_compressed_staging(stage, tmp_path):
    res = fit(_cfg(tmp_path, stage), log=False)
    losses = np.array([h["loss"] for h in res.history])
    assert np.isfinite(losses).all()
    # quantized inputs must not break learning on the easy synthetic task
    assert losses[-1] < losses[0]


def test_int16_staging_matches_float32_losses(tmp_path):
    """int16 staging quantizes inputs by at most 1/32768 — the loss
    trajectory stays within float-noise of the uncompressed run."""
    ref = fit(_cfg(tmp_path, "float32"), log=False)
    got = fit(_cfg(tmp_path, "int16"), log=False)
    r = np.array([h["loss"] for h in ref.history])
    g = np.array([h["loss"] for h in got.history])
    np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-3)


def test_grain_stream_int16_matches_float32_losses(tmp_path):
    """Streamed (grain) batches travel in wire form too: the same int16
    quantization bound as the HBM-resident path, so grain+int16 tracks
    grain+float32 within float noise."""
    def run(stage):
        cfg = _cfg(tmp_path, stage)
        cfg = dataclasses.replace(
            cfg, name="grain_" + stage,
            data=dataclasses.replace(cfg.data, pipeline="grain"))
        return np.array([h["loss"] for h in fit(cfg, log=False).history])

    np.testing.assert_allclose(run("int16"), run("float32"),
                               rtol=2e-2, atol=2e-3)


def test_grain_stream_adpcm4_learns(tmp_path):
    cfg = _cfg(tmp_path, "adpcm4")
    cfg = dataclasses.replace(
        cfg, name="grain_adpcm4",
        data=dataclasses.replace(cfg.data, pipeline="grain"))
    losses = np.array([h["loss"] for h in fit(cfg, log=False).history])
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_dp8_matches_dp1_with_int16_staging(tmp_path):
    """The wire-form batch is sharded over the data axis and decoded
    inside the step on every shard — DP must still reproduce the DP=1
    loss trajectory exactly (same decode, same psum)."""
    def run(dp):
        cfg = _cfg(tmp_path, "int16")
        cfg = dataclasses.replace(
            cfg, name=f"dp{dp}_int16",
            train=dataclasses.replace(cfg.train, data_parallel=dp,
                                      batch_size=8))
        return np.array([h["loss"] for h in fit(cfg, log=False).history])

    np.testing.assert_allclose(run(8), run(1), rtol=1e-5, atol=1e-6)


def test_compressed_staging_rejects_feature_input(tmp_path):
    cfg = _cfg(tmp_path, "int16")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, trunk="none"),
        data=dataclasses.replace(cfg.data, dataset="synthetic_audioset",
                                 n_train_clips=16, n_eval_clips=8),
    )
    with pytest.raises(ValueError, match="waveform"):
        fit(cfg, log=False)


def test_unknown_staging_dtype_rejected(tmp_path):
    cfg = _cfg(tmp_path, "int8")
    with pytest.raises(ValueError, match="staging_dtype"):
        fit(cfg, log=False)
