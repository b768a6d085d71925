"""Log-mel front-end (reference C3: ``mel_features.py`` / ``vggish_input.py``,
SURVEY.md §2.1 — reconstructed from the VGGish spec; mount empty).

Waveform -> framed log-mel patches, pure ``jax.numpy`` — the un-fused but
already TPU-correct formulation (SURVEY.md §7 stage 2). The fused Pallas
kernel (T1) in ``pallas_frontend.py`` is numerics-gated against this module.

Two STFT formulations:
  - ``method="fft"``: ``jnp.fft.rfft`` (XLA FFT).
  - ``method="matmul"``: real DFT as two matmuls against cos/sin bases —
    MXU-native, the formulation the Pallas kernel fuses (cf. PAPERS.md
    "MelT: GEMM-Native NDFT").

Exact VGGish semantics being matched (the contract, since the reference
mount is empty — SURVEY.md §0):
  num_frames = 1 + (n - window) // hop ; periodic Hann window;
  |rfft(frame, fft_size=next_pow2(window))| ; HTK mel scale
  mel(f) = 1127 ln(1 + f/700); triangular filters between band edges linear
  in mel, DC bin zeroed; log(mel + 0.01); non-overlapping 96-frame patches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.config import FrontendConfig

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz):
    """HTK-style mel scale used by the VGGish front-end."""
    return _MEL_HIGH_FREQUENCY_Q * np.log(
        1.0 + (np.asarray(frequencies_hertz, dtype=np.float64) / _MEL_BREAK_FREQUENCY_HERTZ)
    )


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    num_mel_bins: int = 64,
    num_spectrogram_bins: int = 257,
    sample_rate: int = 16000,
    lower_edge_hertz: float = 125.0,
    upper_edge_hertz: float = 7500.0,
) -> np.ndarray:
    """[num_spectrogram_bins, num_mel_bins] triangular filter matrix.

    Matches VGGish ``spectrogram_to_mel_matrix``: band edges linearly spaced
    in mel between the lower/upper edges; each filter rises from the lower
    band edge to the center and falls to the upper; the DC bin row is zero.
    """
    nyquist_hertz = sample_rate / 2.0
    if lower_edge_hertz >= upper_edge_hertz:
        raise ValueError("lower_edge_hertz must be < upper_edge_hertz")
    spectrogram_bins_hertz = np.linspace(0.0, nyquist_hertz, num_spectrogram_bins)
    spectrogram_bins_mel = hertz_to_mel(spectrogram_bins_hertz)
    band_edges_mel = np.linspace(
        hertz_to_mel(lower_edge_hertz), hertz_to_mel(upper_edge_hertz), num_mel_bins + 2
    )
    mel_weights = np.empty((num_spectrogram_bins, num_mel_bins), dtype=np.float64)
    for i in range(num_mel_bins):
        lower_edge_mel, center_mel, upper_edge_mel = band_edges_mel[i : i + 3]
        lower_slope = (spectrogram_bins_mel - lower_edge_mel) / (center_mel - lower_edge_mel)
        upper_slope = (upper_edge_mel - spectrogram_bins_mel) / (upper_edge_mel - center_mel)
        mel_weights[:, i] = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    mel_weights[0, :] = 0.0  # DC bin carries no mel energy
    return mel_weights.astype(np.float32)


def periodic_hann(window_length: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window: 0.5 - 0.5 cos(2 pi n / N)."""
    return (
        0.5 - 0.5 * np.cos(2.0 * np.pi / window_length * np.arange(window_length))
    ).astype(np.float32)


@functools.lru_cache(maxsize=8)
def dft_bases(window_length: int, fft_size: int):
    """Real-DFT cos/sin bases folded with the periodic Hann window.

    Returns (C, S) each [window_length, fft_size//2 + 1] float32 such that for
    a raw frame x: re = x @ C, im = x @ S reproduce
    rfft(hann * x, fft_size).real/.imag. Folding the window into the basis
    saves one VPU pass in the fused kernel.
    """
    n = np.arange(window_length, dtype=np.float64)[:, None]
    k = np.arange(fft_size // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_size
    win = periodic_hann(window_length).astype(np.float64)[:, None]
    cos_b = (np.cos(ang) * win).astype(np.float32)
    sin_b = (-np.sin(ang) * win).astype(np.float32)
    return cos_b, sin_b


def frame_signal(x: jax.Array, window_length: int, hop_length: int) -> jax.Array:
    """Frame the last axis into [..., num_frames, window_length].

    num_frames = 1 + (n - window_length) // hop_length (VGGish ``frame``).

    Built from static strided slices (no gather): when hop divides the
    signal into blocks, frame t is a concatenation of whole blocks starting
    at block t plus a head of a later block — the exact trick the Pallas
    kernel uses (SURVEY.md §7 stage 5), so XLA lowers this to cheap copies.
    """
    n = x.shape[-1]
    num_frames = 1 + (n - window_length) // hop_length
    if num_frames <= 0:
        raise ValueError(f"signal too short to frame: {n} < {window_length}")
    # The block decomposition below is valid for ANY window/hop geometry:
    # frame t starts at sample t*hop, i.e. at hop-block t, and is the first
    # `window` samples of blocks t, t+1, ... — each piece a static slice.
    # (A gather fallback guarded here in round 1 was dead code; ADVICE.md.)
    blocks_needed = (window_length + hop_length - 1) // hop_length
    usable = (num_frames - 1 + blocks_needed) * hop_length
    pad = max(0, usable - n)
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blocks = x[..., :usable].reshape(*x.shape[:-1], -1, hop_length)
    pieces = []
    for b in range(blocks_needed):
        width = min(hop_length, window_length - b * hop_length)
        pieces.append(blocks[..., b : b + num_frames, :width])
    return jnp.concatenate(pieces, axis=-1)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def split_bf16(a: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 pair with a == hi + lo to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_bf16x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Near-f32 matmul from THREE native bf16 MXU passes (vs six for
    Precision.HIGHEST): split both operands hi/lo, keep hi@hi + hi@lo +
    lo@hi, drop lo@lo (below f32 rounding at these magnitudes). Worst case
    ~3e-4 on log-mel values near the log floor (tested at 5e-4) at half the
    MXU passes of HIGHEST."""
    a_hi, a_lo = split_bf16(a)
    b_hi, b_lo = split_bf16(b)
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out = out + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def stft_magnitude(
    x: jax.Array,
    window_length: int,
    hop_length: int,
    fft_size: int,
    method: str = "matmul",
    precision: str = "highest",
) -> jax.Array:
    """[..., num_frames, fft_size//2+1] magnitude spectrogram (Hann windowed).

    precision="highest" (default): full-f32 DFT matmuls — XLA's default
    matmul precision is bf16 on TPU (~1e-2 absolute error) and the parity
    contract is ~1e-4 (SURVEY.md §4). "default" (bf16 passes) is ~6x cheaper
    and fine for training-mode feature extraction.
    """
    frames = frame_signal(x, window_length, hop_length)
    if method == "fft":
        win = jnp.asarray(periodic_hann(window_length))
        spec = jnp.fft.rfft(frames * win, n=fft_size, axis=-1)
        return jnp.abs(spec).astype(frames.dtype)
    elif method == "matmul":
        cos_b, sin_b = dft_bases(window_length, fft_size)
        if precision == "bf16x3":
            re = dot_bf16x3(frames, jnp.asarray(cos_b))
            im = dot_bf16x3(frames, jnp.asarray(sin_b))
        else:
            prec = _PRECISIONS[precision]
            re = jnp.dot(frames, jnp.asarray(cos_b), precision=prec)
            im = jnp.dot(frames, jnp.asarray(sin_b), precision=prec)
        return jnp.sqrt(re * re + im * im)
    raise ValueError(f"unknown stft method {method!r}")


@functools.lru_cache(maxsize=8)
def trimmed_spectral_bases(cfg: FrontendConfig):
    """(cos, sin, mel, n_bins_used): DFT bases + mel filterbank trimmed to
    the last spectrogram bin with nonzero mel weight. EXACT — the dropped
    trailing bins (above mel_max_hz, e.g. 240..256 of the default config)
    have all-zero mel weight, so they contribute nothing after the mel
    matmul; skipping them cuts the DFT GEMM's N by ~6-33% depending on how
    the compiler pads (measured 9.5 -> 8.9 ms / 256 ten-second clips on
    chip at HIGHEST)."""
    cos_b, sin_b = dft_bases(cfg.window_length, cfg.fft_size)
    mel_w = mel_filterbank(
        cfg.num_mel_bins, cfg.num_spectrogram_bins, cfg.sample_rate,
        cfg.mel_min_hz, cfg.mel_max_hz,
    )
    n = int(np.nonzero(mel_w.any(axis=1))[0][-1]) + 1
    return cos_b[:, :n].copy(), sin_b[:, :n].copy(), mel_w[:n].copy(), n


def log_mel_spectrogram(
    x: jax.Array, cfg: FrontendConfig = FrontendConfig(), method: str = "matmul"
) -> jax.Array:
    """Waveform [..., n] -> log-mel [..., num_frames, num_mel_bins]."""
    mel_prec = "highest" if cfg.precision == "bf16x3" else cfg.precision
    if method == "matmul":
        # fused trimmed path: frames -> DFT GEMMs over only the mel-active
        # bins -> magnitude -> mel GEMM -> log, one XLA fusion region
        cos_b, sin_b, mel_t, _ = trimmed_spectral_bases(cfg)
        frames = frame_signal(x, cfg.window_length, cfg.hop_length)
        if cfg.precision == "bf16x3":
            re = dot_bf16x3(frames, jnp.asarray(cos_b))
            im = dot_bf16x3(frames, jnp.asarray(sin_b))
        else:
            prec = _PRECISIONS[cfg.precision]
            re = jnp.dot(frames, jnp.asarray(cos_b), precision=prec)
            im = jnp.dot(frames, jnp.asarray(sin_b), precision=prec)
        mag = jnp.sqrt(re * re + im * im)
        return jnp.log(
            jnp.dot(mag, jnp.asarray(mel_t), precision=_PRECISIONS[mel_prec])
            + cfg.log_offset
        )
    mag = stft_magnitude(
        x, cfg.window_length, cfg.hop_length, cfg.fft_size, method, cfg.precision
    )
    mel_w = jnp.asarray(
        mel_filterbank(
            cfg.num_mel_bins,
            cfg.num_spectrogram_bins,
            cfg.sample_rate,
            cfg.mel_min_hz,
            cfg.mel_max_hz,
        )
    )
    return jnp.log(jnp.dot(mag, mel_w, precision=_PRECISIONS[mel_prec]) + cfg.log_offset)


def waveform_to_patches(
    x: jax.Array, cfg: FrontendConfig = FrontendConfig(), method: str = "matmul"
) -> jax.Array:
    """Waveform [..., n] -> patches [..., N, 96, 64] (VGGish examples).

    The reference's ``waveform_to_examples`` minus resampling (host-side,
    see ``mla_tpu.data.audio_io``). N = number of non-overlapping 0.96 s
    windows of log-mel frames.
    """
    log_mel = log_mel_spectrogram(x, cfg, method)
    wf, hf = cfg.example_window_frames, cfg.example_hop_frames
    t = log_mel.shape[-2]
    n_patches = 1 + (t - wf) // hf
    if n_patches <= 0:
        raise ValueError(f"too few frames ({t}) for one {wf}-frame patch")
    lm = log_mel[..., : (n_patches - 1) * hf + wf, :]
    if hf == wf:  # non-overlapping: pure reshape
        return lm.reshape(*lm.shape[:-2], n_patches, wf, lm.shape[-1])
    starts = np.arange(n_patches) * hf
    return jnp.stack([lm[..., s : s + wf, :] for s in starts], axis=-3)


def apply_frontend(x: jax.Array, cfg: FrontendConfig = FrontendConfig()) -> jax.Array:
    """Dispatch on cfg.impl: fused Pallas kernel (T1) or jnp/XLA ops.
    The Pallas path interprets off-TPU so the same config runs in CPU tests."""
    if cfg.impl == "pallas":
        from mla_tpu.ops.pallas_frontend import fused_log_mel_patches

        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_log_mel_patches(x, cfg, precision=cfg.precision, interpret=interpret)
    if cfg.impl == "xla":
        return waveform_to_patches(x, cfg)
    raise ValueError(f"unknown frontend impl {cfg.impl!r}")


def patches_per_clip(n_samples: int, cfg: FrontendConfig = FrontendConfig()) -> int:
    """Static patch count for an n_samples-long clip (shape planning)."""
    num_frames = 1 + (n_samples - cfg.window_length) // cfg.hop_length
    return 1 + (num_frames - cfg.example_window_frames) // cfg.example_hop_frames


def patch_hop_seconds(cfg: FrontendConfig = FrontendConfig()) -> float:
    """Seconds between consecutive patch starts (0.96 s at the VGGish
    grid) — the timeline's native time base. ONE definition: event
    timestamps in infer/eval/serve must all derive hop_s from here."""
    return cfg.example_hop_frames * cfg.hop_length / cfg.sample_rate
