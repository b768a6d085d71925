"""Segment-embedding trunks (reference C4: deep CNN over 96x64 log-mel
patches -> 128-d embedding per ~1 s segment; SURVEY.md §2.1).

TPU-first choices: NHWC layout (XLA-TPU's native conv layout), channel
widths that are multiples of the 128-lane register file where it matters,
bf16 activations with f32 params, no host-visible state beyond flax
collections.

Trunks:
  - ``CompactCNN``: conv stages (Conv3x3 + norm + ReLU) x convs_per_stage,
    2x2 maxpool between stages, global average pool, Dense -> embed_dim.
    The trainable trunk the caesar-one variant uses conceptually (it trains
    its own CNN rather than using frozen bottleneck features).
  - ``VGGish``: the exact canonical VGGish topology (conv 64 / 128 / 256x2 /
    512x2 with 2x2 pools + FC4096 x2 + FC128) for embedding-parity work.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class CompactCNN(nn.Module):
    """Configurable NHWC conv trunk. Default shape is the reference-style
    trainable CNN; with ``pool="avg"`` + ``global_pool="avg+max"`` it
    becomes the PANNs CNN10/CNN14 block structure (Kong et al. 2020, the
    modern successor family for AudioSet tagging)."""

    conv_channels: Sequence[int] = (64, 128, 256, 512)
    convs_per_stage: int = 2
    embed_dim: int = 128
    norm: str = "batch"  # batch | group | none
    pool: str = "max"  # max | avg (inter-stage 2x2 pooling)
    global_pool: str = "avg"  # avg | avg+max
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, H, W] or [B, H, W, 1] log-mel patch -> [B, embed_dim]."""
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        for stage, ch in enumerate(self.conv_channels):
            for i in range(self.convs_per_stage):
                x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=self.norm == "none",
                            dtype=self.dtype, name=f"conv{stage}_{i}")(x)
                if self.norm == "batch":
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                     dtype=self.dtype, name=f"bn{stage}_{i}")(x)
                elif self.norm == "group":
                    x = nn.GroupNorm(num_groups=min(32, ch), dtype=self.dtype,
                                     name=f"gn{stage}_{i}")(x)
                x = nn.relu(x)
            if min(x.shape[1], x.shape[2]) >= 2:
                if self.pool == "avg":
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.global_pool == "avg+max":
            x = jnp.mean(x, axis=(1, 2)) + jnp.max(x, axis=(1, 2))
        else:
            x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(x)
        return nn.relu(x)


class VGGish(nn.Module):
    """Canonical VGGish (the reference family's frozen feature extractor).

    conv3x3-64 /pool/ conv3x3-128 /pool/ (conv3x3-256)x2 /pool/
    (conv3x3-512)x2 /pool/ flatten / FC4096 / FC4096 / FC128. Input 96x64x1.
    """

    embed_dim: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        plan: Tuple[Tuple[int, int], ...] = ((64, 1), (128, 1), (256, 2), (512, 2))
        for stage, (ch, reps) in enumerate(plan):
            for i in range(reps):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # [B, 6*4*512]
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1_2")(x))
        x = nn.relu(nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(x))
        return x
