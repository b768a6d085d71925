"""T1: fused log-mel front-end as one Pallas TPU kernel (SURVEY.md §2.2,
§7 stage 5; reference analogue is host-NumPy C3 — the entire §3.1 call
stack collapses into this kernel).

Per grid step (= one clip), entirely in VMEM:
  waveform slice -> hop-strided blocks -> overlapping 400-sample frames via
  STATIC concatenation of whole blocks (no gather: window offsets decompose
  into hop-sized pieces) -> windowed real DFT as TWO MXU matmuls against
  Hann-folded cos/sin bases (GEMM-native NDFT; cf. PAPERS.md "MelT") ->
  magnitude -> mel filterbank matmul -> log(mel + 0.01) -> [96, 64] patches
  written to HBM.

No intermediate (frames / spectrogram) ever touches HBM — the XLA fallback
materializes a [B, 960, 400] frame tensor (~1.5 MB/clip) plus a [B, 960,
257] spectrogram in HBM; here HBM traffic is waveform in + patches out.

Numerics: frame construction is exact; matmul precision is configurable —
HIGHEST (bit-comparable to the f32 oracle ~1e-4) or DEFAULT (bf16 passes,
~4e-2, faster). Compute dtype is f32 throughout; magnitudes are small
and log-compressed, bf16 storage would eat the parity budget.

Performance status (measured 2026-08-16 on the v5e chip, compile-free
timing): correct and fused; the XLA fallback is ~1.5x faster at HIGHEST
precision (9.4 vs 14.1 ms / 256 ten-second clips; 18 vs 27 k clips/s) —
XLA's single K=512 GEMM pipelines the MXU better than this kernel's three
K=160 block-GEMMs (Mosaic rejects the reshape/concat needed to build the
[F, window] frame matrix in-kernel, so the block decomposition is forced).
``FrontendConfig.impl`` therefore defaults to "xla"; the kernel remains
the fused single-program formulation (BASELINE.json:5), is parity-gated in
CI, and is the training front-end of the us8k milestone config.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mla_tpu.config import FrontendConfig
from mla_tpu.ops.frontend import dft_bases, mel_filterbank


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
    blocks_needed = -(-window // hop)  # ceil
    usable = (used_frames - 1 + blocks_needed) * hop
    if usable > n_samples:
        raise ValueError(
            f"need {usable} samples for {used_frames} whole frames, clip has {n_samples}"
        )
    return window, hop, used_frames, n_patches, blocks_needed, usable


def _make_kernel(hop, used_frames, blocks_needed, log_offset, precision):
    """Block-wise GEMM-native DFT: Mosaic rejects flat->2D reshapes and
    lane-dim concatenation, so instead of materializing [F, window] frames,
    the windowed DFT is computed as a sum over hop-sized row-blocks of the
    basis:  re[t] = sum_b blocks[t+b] @ C[b*hop:(b+1)*hop]  — identical math
    (frame t is the concatenation of whole hop blocks), pure MXU."""

    def kernel(wav_ref, cos_ref, sin_ref, mel_ref, out_ref):
        blocks = wav_ref[0]  # [n_blocks, hop]
        re = None
        im = None
        for b in range(blocks_needed):
            piece = blocks[b : b + used_frames, :]
            r = jnp.dot(piece, cos_ref[b], preferred_element_type=jnp.float32,
                        precision=precision)
            i = jnp.dot(piece, sin_ref[b], preferred_element_type=jnp.float32,
                        precision=precision)
            re = r if re is None else re + r
            im = i if im is None else im + i
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=precision)
        out_ref[0] = jnp.log(mel + log_offset)

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
    window, hop, used_frames, n_patches, blocks_needed, usable = _framing_plan(
        cfg, n_samples
    )
    cos_b, sin_b = dft_bases(window, cfg.fft_size)
    mel_w = mel_filterbank(
        cfg.num_mel_bins, cfg.num_spectrogram_bins, cfg.sample_rate,
        cfg.mel_min_hz, cfg.mel_max_hz,
    )
    n_bins = cfg.num_spectrogram_bins
    # split the Hann-folded bases into hop-row blocks (zero-pad the tail
    # block): basis block b multiplies waveform block t+b for frame t.
    cos_blk = np.zeros((blocks_needed, hop, n_bins), np.float32)
    sin_blk = np.zeros((blocks_needed, hop, n_bins), np.float32)
    for blk in range(blocks_needed):
        width = min(hop, window - blk * hop)
        cos_blk[blk, :width] = cos_b[blk * hop : blk * hop + width]
        sin_blk[blk, :width] = sin_b[blk * hop : blk * hop + width]
    # Mosaic's dot lowering supports only DEFAULT (bf16 passes) and HIGHEST
    # (full f32); HIGH falls back to HIGHEST.
    prec = dict(
        highest=jax.lax.Precision.HIGHEST, high=jax.lax.Precision.HIGHEST,
        default=jax.lax.Precision.DEFAULT,
    )[precision]
    kernel = _make_kernel(hop, used_frames, blocks_needed, cfg.log_offset, prec)
    n_blocks = used_frames - 1 + blocks_needed
    # the [B, n] -> [B, n_blocks, hop] reshape is free (layout-compatible)
    # and happens in XLA outside the kernel; Mosaic can't do it in-kernel.
    wav_blocks = wav.astype(jnp.float32)[:, : n_blocks * hop].reshape(b, n_blocks, hop)
    flops_per_clip = (
        2 * used_frames * blocks_needed * hop * n_bins * 2
        + 2 * used_frames * n_bins * cfg.num_mel_bins
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_blocks, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blocks_needed, hop, n_bins), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blocks_needed, hop, n_bins), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, cfg.num_mel_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, used_frames, cfg.num_mel_bins), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, used_frames, cfg.num_mel_bins), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_clip,
            bytes_accessed=b * (n_samples * 4 + used_frames * cfg.num_mel_bins * 4),
            transcendentals=b * used_frames * (n_bins + cfg.num_mel_bins),
        ),
        interpret=interpret,
    )(wav_blocks, jnp.asarray(cos_blk), jnp.asarray(sin_blk), jnp.asarray(mel_w))
    return out.reshape(b, n_patches, cfg.example_window_frames, cfg.num_mel_bins)


def frontend_bytes_moved(batch: int, n_samples: int, cfg: FrontendConfig = FrontendConfig()) -> int:
    """Minimal HBM traffic of the fused kernel (roofline denominator)."""
    _, _, used_frames, _, _, _ = _framing_plan(cfg, n_samples)
    return batch * (n_samples * 4 + used_frames * cfg.num_mel_bins * 4)
