"""T1: fused log-mel front-end as one Pallas TPU kernel (SURVEY.md §2.2,
§7 stage 5; reference analogue is host-NumPy C3 — the entire §3.1 call
stack collapses into this program).

Formulation (v2, round 2): frames are grouped by start-block residue so the
windowed real DFT is ONE MXU-shaped GEMM per residue class instead of
round 1's three K=hop block-GEMMs:

  frame t starts at sample t*hop and spans g = ceil(window/hop) hop-blocks,
  so the frames with t ≡ s (mod g) are a FREE row-merge reshape of the
  hop-blocked waveform: V_s = blocks[s : s+g*F/g].reshape(F/g, g*hop).
  XLA builds the g views outside the kernel (strided copies — Mosaic
  rejects lane-dim row-merge reshapes in-kernel, round-1 finding); per grid
  step (one clip x one residue class) the kernel computes, entirely in VMEM:

    V_s @ C -> re, V_s @ S -> im        (K = g*hop = 480: 4 full K-tiles,
                                         vs round 1's K=160 blocks that
                                         padded to 256 = 1.6x MXU waste)
    sqrt(re^2 + im^2)                   magnitude
    @ mel -> log(mel + 0.01)            trimmed filterbank (below)
    -> out[b, s]                        [F/g, 64] log-mel rows

  and XLA interleaves the residue classes back outside (transpose+reshape
  on the tiny [F, 64] output) into 96x64 patches.

Exact spectral-bin trimming: mel filters end at 7500 Hz < Nyquist, so the
trailing spectrogram bins (241..256 for the default config) have all-zero
mel weight. The kernel computes only the bins that can contribute —
identical output, and the DFT GEMM's N drops from 257 (3 lane-tiles) to
241 (2 lane-tiles).

Precision modes (``precision=``):
  "highest"  f32 HIGHEST GEMMs (6 bf16 MXU passes each) — bit-comparable
             to the f32 oracle, ~1e-4 parity.
  "bf16x3"   hi/lo split-GEMMs (3 native bf16 passes, ops.frontend.
             dot_bf16x3 math) — ~2x the GEMM throughput at ~1e-5 added
             error, inside the 2e-4 parity budget.
  "default"  single bf16 pass, ~4e-2 — training-mode feature extraction.

HBM traffic: waveform-blocks in (g views = g x waveform bytes) + [F, 64]
patches out; no spectrogram, magnitude, or mel intermediate ever touches
HBM.

Performance status (measured 2026-08-16 on the tunnel chip — calibrated
peaks: 37.7 TFLOPS f32-DEFAULT GEMM, 19.0 TFLOPS f32-HIGHEST, ~221 GB/s
HBM; see docs/RESULTS.md): this v2 kernel is GEMM-bound at ~7 ms/256
clips with ~7 ms of un-hideable residue-view materialization on top
(Mosaic rejects the in-kernel row-merge reshape that would make framing
free — re-probed 2026-08-17 via scripts/probe_mosaic_reshape.py, still
rejected), total 14.0 ms. XLA's
implicit-im2col GEMM fuses framing into the DFT operand read at ZERO copy
cost and runs at ~56% of the HIGHEST peak end-to-end: 8.9 ms with the
same exact bin-trim (ops.frontend.trimmed_spectral_bases). On hardware
whose f32-HIGHEST is a 6-pass emulation (not this chip's 2-pass), the
bf16x3 mode halves the kernel's GEMM time; here HIGHEST(2-pass) < bf16x3
(3-pass), so the mode exists but cannot win. ``FrontendConfig.impl``
therefore stays "xla"; the kernel remains the fused single-program
formulation (BASELINE.json:5), parity-gated in CI, and the training
front-end of the us8k milestone config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mla_tpu.config import FrontendConfig
from mla_tpu.ops.frontend import dft_bases, mel_filterbank, split_bf16


def _framing_plan(cfg: FrontendConfig, n_samples: int):
    """Static framing geometry for one clip."""
    window, hop = cfg.window_length, cfg.hop_length
    wf, hf = cfg.example_window_frames, cfg.example_hop_frames
    if hf != wf:
        raise NotImplementedError(
            "fused Pallas front-end supports non-overlapping patches only "
            f"(example_hop_frames={hf} != example_window_frames={wf}); "
            "use FrontendConfig.impl='xla' for overlapping patch configs"
        )
    n_frames = 1 + (n_samples - window) // hop
    n_patches = 1 + (n_frames - wf) // hf
    if n_patches < 1:
        raise ValueError(f"clip too short: {n_samples} samples -> {n_frames} frames < {wf}")
    used_frames = (n_patches - 1) * hf + wf
    blocks_needed = -(-window // hop)  # ceil = g, the residue-class count
    usable = (used_frames - 1 + blocks_needed) * hop
    if usable > n_samples:
        raise ValueError(
            f"need {usable} samples for {used_frames} whole frames, clip has {n_samples}"
        )
    return window, hop, used_frames, n_patches, blocks_needed, usable


@functools.lru_cache(maxsize=8)
def _trimmed_bases(cfg: FrontendConfig, g: int, hop: int, window: int):
    """(cos, sin, mel) with the DFT bases zero-padded to g*hop rows and all
    three trimmed to the last spectrogram bin with nonzero mel weight —
    an EXACT reduction (dropped bins contribute nothing after the mel
    matmul)."""
    cos_b, sin_b = dft_bases(window, cfg.fft_size)
    mel_w = mel_filterbank(
        cfg.num_mel_bins, cfg.num_spectrogram_bins, cfg.sample_rate,
        cfg.mel_min_hz, cfg.mel_max_hz,
    )
    n_bins = int(np.nonzero(mel_w.any(axis=1))[0][-1]) + 1
    k = g * hop
    cos_p = np.zeros((k, n_bins), np.float32)
    sin_p = np.zeros((k, n_bins), np.float32)
    cos_p[:window] = cos_b[:, :n_bins]
    sin_p[:window] = sin_b[:, :n_bins]
    return cos_p, sin_p, mel_w[:n_bins].copy(), n_bins


def _make_kernel(log_offset: float, precision):
    """One grid step = one (clip, residue class): GEMM-native DFT + mag +
    mel + log, all operands VMEM-resident."""

    def kernel(v_ref, cos_ref, sin_ref, mel_ref, out_ref):
        v = v_ref[0, 0]  # [F/g, g*hop]
        if precision == "bf16x3":
            v_hi, v_lo = split_bf16(v)
            ch, cl = split_bf16(cos_ref[:])
            sh, sl = split_bf16(sin_ref[:])
            re = (
                jnp.dot(v_hi, ch, preferred_element_type=jnp.float32)
                + jnp.dot(v_hi, cl, preferred_element_type=jnp.float32)
                + jnp.dot(v_lo, ch, preferred_element_type=jnp.float32)
            )
            im = (
                jnp.dot(v_hi, sh, preferred_element_type=jnp.float32)
                + jnp.dot(v_hi, sl, preferred_element_type=jnp.float32)
                + jnp.dot(v_lo, sh, preferred_element_type=jnp.float32)
            )
        else:
            re = jnp.dot(v, cos_ref[:], preferred_element_type=jnp.float32,
                         precision=precision)
            im = jnp.dot(v, sin_ref[:], preferred_element_type=jnp.float32,
                         precision=precision)
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        out_ref[0, 0] = jnp.log(mel + log_offset)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "interpret"))
def fused_log_mel_patches(
    wav: jax.Array,
    cfg: FrontendConfig = FrontendConfig(),
    precision: str = "highest",
    interpret: bool = False,
) -> jax.Array:
    """Waveform [B, n_samples] -> log-mel patches [B, N, 96, 64], one fused
    Pallas program. ``interpret=True`` runs the same kernel on CPU (used by
    the parity tests; SURVEY.md §7 risk (e))."""
    if wav.ndim == 1:
        return fused_log_mel_patches(wav[None], cfg, precision, interpret)[0]
    b, n_samples = wav.shape
    window, hop, used_frames, n_patches, g, usable = _framing_plan(cfg, n_samples)
    cos_p, sin_p, mel_t, n_bins = _trimmed_bases(cfg, g, hop, window)
    k = g * hop

    # frames per residue class; pad F up to a multiple of g (the pad frames
    # read zero blocks and their output rows are dropped after interleave)
    f_pad = -(-used_frames // g) * g
    fg = f_pad // g
    blocks_want = (g - 1) + f_pad  # view s spans blocks [s, s + f_pad)
    wav32 = wav.astype(jnp.float32)[:, : min(usable, n_samples)]
    n_blocks_have = wav32.shape[1] // hop
    blocks = wav32[:, : n_blocks_have * hop].reshape(b, n_blocks_have, hop)
    if blocks_want > n_blocks_have:
        blocks = jnp.pad(blocks, ((0, 0), (0, blocks_want - n_blocks_have), (0, 0)))
    # residue-class views: V[b, s, m] = frame g*m + s (a strided row-merge
    # reshape — free layout math for XLA, illegal inside Mosaic)
    views = jnp.stack(
        [blocks[:, s : s + f_pad].reshape(b, fg, k) for s in range(g)], axis=1
    )  # [B, g, F/g, g*hop]

    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "bf16x3": "bf16x3",
    }[precision]
    kernel = _make_kernel(cfg.log_offset, prec)

    dft_passes = 3 if precision == "bf16x3" else (1 if precision == "default" else 6)
    flops_per_clip = (
        2 * f_pad * k * n_bins * 2 * dft_passes
        + 2 * f_pad * n_bins * cfg.num_mel_bins * 6
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 1, fg, k), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_bins), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_bins), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, cfg.num_mel_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, fg, cfg.num_mel_bins), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, fg, cfg.num_mel_bins), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_clip,
            bytes_accessed=b * (g * f_pad * hop * 4 + f_pad * cfg.num_mel_bins * 4),
            transcendentals=b * f_pad * (n_bins + cfg.num_mel_bins),
        ),
        interpret=interpret,
    )(views, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_t))
    # interleave residue classes back to time order: frame t = g*m + s
    frames_out = out.transpose(0, 2, 1, 3).reshape(b, f_pad, cfg.num_mel_bins)
    return frames_out[:, :used_frames].reshape(
        b, n_patches, cfg.example_window_frames, cfg.num_mel_bins
    )


def frontend_bytes_moved(batch: int, n_samples: int, cfg: FrontendConfig = FrontendConfig()) -> int:
    """HBM traffic of the fused kernel (roofline denominator): the g
    residue-class views in + patches out."""
    window, hop, used_frames, _, g, _ = _framing_plan(cfg, n_samples)
    f_pad = -(-used_frames // g) * g
    return batch * (g * f_pad * hop * 4 + used_frames * cfg.num_mel_bins * 4)
