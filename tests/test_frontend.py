"""Front-end parity: mla_tpu.ops.frontend vs the NumPy VGGish oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import FrontendConfig
from mla_tpu.ops import frontend
from tests.oracle import frontend_oracle as oracle

CFG = FrontendConfig()


def _wave(rng, seconds=2.0):
    n = int(CFG.sample_rate * seconds)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_constants():
    assert CFG.window_length == 400
    assert CFG.hop_length == 160
    assert CFG.fft_size == 512
    assert CFG.num_spectrogram_bins == 257
    assert CFG.example_window_frames == 96


def test_mel_filterbank_matches_oracle():
    ours = frontend.mel_filterbank(64, 257, 16000, 125.0, 7500.0)
    ref = oracle.spectrogram_to_mel_matrix(64, 257, 16000, 125.0, 7500.0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_frame_matches_oracle(rng):
    x = _wave(rng, 0.5)
    ours = np.asarray(frontend.frame_signal(jnp.asarray(x), 400, 160))
    ref = oracle.frame(x, 400, 160)
    np.testing.assert_array_equal(ours, ref)


def test_frame_batched(rng):
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    ours = np.asarray(frontend.frame_signal(jnp.asarray(x), 400, 160))
    for b in range(3):
        np.testing.assert_array_equal(ours[b], oracle.frame(x[b], 400, 160))


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_stft_magnitude(rng, method):
    x = _wave(rng, 1.0)
    ours = np.asarray(
        frontend.stft_magnitude(jnp.asarray(x), 400, 160, 512, method=method)
    )
    ref = oracle.stft_magnitude(x, 512, 160, 400)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_log_mel_spectrogram(rng, method):
    x = _wave(rng)
    ours = np.asarray(frontend.log_mel_spectrogram(jnp.asarray(x), CFG, method=method))
    ref = oracle.log_mel_spectrogram(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_waveform_to_patches(rng):
    x = _wave(rng, 10.0)
    ours = np.asarray(frontend.waveform_to_patches(jnp.asarray(x), CFG))
    ref = oracle.waveform_to_examples(x)
    assert ours.shape == ref.shape == (10, 96, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    assert frontend.patches_per_clip(len(x), CFG) == 10


def test_waveform_to_patches_batched_jit(rng):
    x = rng.standard_normal((4, CFG.sample_rate * 3)).astype(np.float32) * 0.1
    fn = jax.jit(lambda w: frontend.waveform_to_patches(w, CFG))
    ours = np.asarray(fn(jnp.asarray(x)))
    assert ours.shape[0] == 4
    for b in range(4):
        np.testing.assert_allclose(ours[b], oracle.waveform_to_examples(x[b]), atol=2e-4)
