"""Host audio IO: wav read + resample to the front-end's sample rate
(reference C3's ``wavfile_to_examples`` entry does this on host too —
SURVEY.md §3.1; resampling stays host-side, everything after is device).

scipy-only (soundfile is not in this image); polyphase resampling via
scipy.signal.resample_poly matches librosa's quality for speech/audio
tagging purposes.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from scipy.io import wavfile as _wavfile
from scipy.signal import resample_poly as _resample_poly


def _pcm_to_float_mono(data: np.ndarray) -> np.ndarray:
    """Integer PCM scaled by its dtype range; multi-channel mean-downmixed."""
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    return x


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float32 waveform in [-1, 1], sample_rate);
    mono 16 kHz is the reference pipeline's contract.

    Uses the native C++ decoder (data.native) when built; scipy fallback."""
    from mla_tpu.data import native

    if native.available():
        with open(path, "rb") as f:
            return native.wav_decode(f.read())
    sr, data = _wavfile.read(path)
    return _pcm_to_float_mono(data), int(sr)


def read_wav_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """In-memory wav decode (the HTTP serving path receives file bytes)."""
    from mla_tpu.data import native

    if native.available():
        return native.wav_decode(data)
    import io as _io

    sr, raw = _wavfile.read(_io.BytesIO(data))
    return _pcm_to_float_mono(raw), int(sr)


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return np.asarray(x, np.float32)
    from mla_tpu.data import native

    if native.available():
        return native.resample(np.asarray(x, np.float32), sr, target_sr)
    frac = Fraction(target_sr, sr).limit_denominator(1000)
    return _resample_poly(x, frac.numerator, frac.denominator).astype(np.float32)


def load_wav_16k(path: str, target_sr: int = 16000) -> np.ndarray:
    x, sr = read_wav(path)
    return resample(x, sr, target_sr)


def pcm16_quantize(x: np.ndarray) -> np.ndarray:
    """float [-1,1] -> int16 PCM (int16 passes through), float32 math.
    THE quantizer every wire path shares (serving, client SDK, training
    feeds, the ADPCM codec): a single rounding seam keeps the
    'bit-identical encode everywhere' claim true — f32-vs-f64 product
    rounding can differ by one LSB on boundary values."""
    x = np.asarray(x)
    if x.dtype == np.int16:
        return x
    return np.asarray(
        np.clip(np.asarray(x, np.float32), -1.0, 1.0) * 32767.0, np.int16)


def write_wav(path: str, x: np.ndarray, sr: int = 16000):
    _wavfile.write(path, sr, pcm16_quantize(x))


# --- mu-law wire codec (G.711-style, mu=255) ---------------------------------
# Serving wire format: 8-bit mu-law quarters the f32 bytes (halves int16) at
# ~38 dB SNR — the standard telephony trade. The decoder also exists as a
# device-side jnp expression inside BatchedStreamingServer so the wire bytes
# travel host->HBM still compressed (serve/server.py).

MULAW_MU = 255.0


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> uint8 mu-law code (mu=255).

    Encodes in float64 so the codes are bit-identical to the native C++
    encoder (which uses double throughout): a float32 log1p rounds a
    handful of boundary values (~3 per million) to the adjacent code,
    silently breaking the documented exact-wire contract between the
    Python and native feeders (advisor finding, round 2)."""
    x = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(MULAW_MU * np.abs(x)) / np.log1p(MULAW_MU)
    return np.asarray(np.round((y + 1.0) * 127.5), np.uint8)


def mulaw_decode(q, xp=np):
    """uint8 mu-law code -> float32 [-1, 1]. ``xp`` selects the array
    module: numpy on host, jax.numpy inside the server's jitted chunk
    program — ONE formula for both sides of the wire, so encoder and
    decoder cannot drift apart."""
    y = xp.asarray(q).astype(xp.float32) / 127.5 - 1.0
    return xp.sign(y) * xp.expm1(xp.abs(y) * float(np.log1p(MULAW_MU))) / MULAW_MU
