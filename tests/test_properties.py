"""Property tests: mathematical invariants of the core ops, plus the
driver-contract dryrun at several device counts."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mla_tpu.ops.attention_pool as ap
from mla_tpu.ops import frontend
from tests.oracle import frontend_oracle as oracle


def test_attention_pool_time_permutation_invariant(rng):
    """Attention pooling is a normalized sum over time -> permutation
    invariant in T (unlike sequence models; this is the weak-labeling
    assumption of arXiv:1803.02353)."""
    g = rng.standard_normal((2, 12, 6)).astype(np.float32)
    c = rng.standard_normal((2, 12, 6)).astype(np.float32)
    perm = rng.permutation(12)
    a = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    b = np.asarray(ap.attention_pool(jnp.asarray(g[:, perm]), jnp.asarray(c[:, perm]), "exp"))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_attention_pool_gate_shift_invariant(rng):
    """Softmax-over-time normalization: adding a per-clip constant to gate
    logits must not change the output."""
    g = rng.standard_normal((2, 10, 4)).astype(np.float32)
    c = rng.standard_normal((2, 10, 4)).astype(np.float32)
    a = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    b = np.asarray(ap.attention_pool(jnp.asarray(g + 3.7), jnp.asarray(c), "exp"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("window,hop", [(400, 160), (256, 128), (512, 512),
                                        (300, 100), (250, 70)])
def test_frame_signal_fuzz(rng, window, hop):
    """frame_signal matches the strided oracle for assorted geometries,
    including ones that hit the gather fallback (250/70)."""
    n = window + hop * 17 + 13
    x = rng.standard_normal(n).astype(np.float32)
    ours = np.asarray(frontend.frame_signal(jnp.asarray(x), window, hop))
    ref = oracle.frame(x, window, hop)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("sr,mels,fmin,fmax", [(16000, 64, 125.0, 7500.0),
                                               (22050, 40, 20.0, 11025.0 / 2),
                                               (8000, 32, 50.0, 3800.0)])
def test_mel_filterbank_fuzz(sr, mels, fmin, fmax):
    nbins = 257
    ours = frontend.mel_filterbank(mels, nbins, sr, fmin, fmax)
    ref = oracle.spectrogram_to_mel_matrix(mels, nbins, sr, fmin, fmax)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_dryrun_multichip_device_counts(n_dev):
    """The driver may probe different mesh sizes; every count must work."""
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(n_dev)
