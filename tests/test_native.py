"""Native C++ audio ingest tests: wav decode vs scipy, polyphase resample vs
scipy.resample_poly, ring buffer semantics."""

import io

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import resample_poly as scipy_resample_poly

from mla_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native audio_ingest failed to build"
)


def _wav_bytes(x, sr, dtype):
    if dtype == np.int16:
        data = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    elif dtype == np.int32:
        data = (np.clip(x, -1, 1) * 2147483647).astype(np.int32)
    else:
        data = x.astype(dtype)
    bio = io.BytesIO()
    wavfile.write(bio, sr, data)
    return bio.getvalue()


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.float32])
def test_wav_decode_matches_scipy(rng, dtype):
    x = (rng.standard_normal(5000) * 0.3).astype(np.float32)
    raw = _wav_bytes(x, 22050, dtype)
    ours, sr = native.wav_decode(raw)
    sr_ref, ref = wavfile.read(io.BytesIO(raw))
    if ref.dtype == np.int16:
        ref = ref / 32768.0
    elif ref.dtype == np.int32:
        ref = ref / 2147483648.0
    assert sr == sr_ref == 22050
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_wav_decode_stereo_downmix(rng):
    x = (rng.standard_normal((1000, 2)) * 0.3).astype(np.float32)
    raw = _wav_bytes(x, 16000, np.float32)
    ours, sr = native.wav_decode(raw)
    np.testing.assert_allclose(ours, x.mean(axis=1), atol=1e-6)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.wav_decode(b"not a wav file at all, sorry!" * 10)


@pytest.mark.parametrize("sr_in,sr_out", [(44100, 16000), (22050, 16000), (8000, 16000)])
def test_resample_matches_scipy(rng, sr_in, sr_out):
    x = (rng.standard_normal(sr_in) * 0.3).astype(np.float32)  # 1 second
    ours = native.resample(x, sr_in, sr_out)
    from math import gcd

    g = gcd(sr_in, sr_out)
    ref = scipy_resample_poly(x.astype(np.float64), sr_out // g, sr_in // g)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_resample_identity(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(native.resample(x, 16000, 16000), x)


def test_resample_preserves_tone(rng):
    sr_in, sr_out, f0 = 48000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 2000)
    assert abs(peak_hz - f0) < 2.0


def test_ring_buffer_chunks(rng):
    rb = native.NativeRingBuffer()
    x = np.arange(100, dtype=np.float32)
    rb.push(x[:30])
    assert rb.pop_chunk(50, 40) is None  # not enough yet
    rb.push(x[30:])
    assert len(rb) == 100
    c1 = rb.pop_chunk(50, 40)  # overlap retention: advance < chunk
    np.testing.assert_array_equal(c1, x[:50])
    c2 = rb.pop_chunk(50, 40)
    np.testing.assert_array_equal(c2, x[40:90])
    assert len(rb) == 20


def test_native_mulaw_matches_python(rng):
    """The C++ wire codec is bit-identical to audio_io's numpy version
    (nearbyint == numpy round-half-even) and round-trips within the 8-bit
    mu-law error bound."""
    from mla_tpu.data import audio_io

    x = np.clip(rng.standard_normal(50000) * 0.5, -1, 1).astype(np.float32)
    # 0.327249 is a measured boundary value where a float32-log1p numpy
    # encoder diverged from the double C++ path (25 vs 26) — both sides
    # now quantize in float64, so it must agree (advisor finding, round 2)
    x[:5] = [0.0, 1.0, -1.0, 0.5, 0.327249]
    enc_native = native.mulaw_encode(x)
    enc_py = audio_io.mulaw_encode(x)
    np.testing.assert_array_equal(enc_native, enc_py)
    dec_native = native.mulaw_decode(enc_native)
    # decode: C++ computes in double, numpy in float32 — ulp-level spread
    np.testing.assert_allclose(dec_native, audio_io.mulaw_decode(enc_py),
                               rtol=0, atol=5e-7)
    assert np.abs(dec_native - x).max() < 2.2e-2
