"""Model assembly (reference ``models.py`` build_model dispatch, C3-C8;
SURVEY.md §2.1 — reconstructed, mount empty).

``AudioTagger`` is the flagship module: trunk over each patch + embedded
mapping blocks + the selected clip-level head. The full forward is one XLA
program — patches are folded into the batch axis for the trunk (keeps the
MXU fed with one big conv batch, no per-segment Python loop).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.config import ModelConfig
from mla_tpu.models.heads import (
    AttentionModule,
    DecisionLevelPool,
    EmbeddedMapping,
    MultiHeadAttentionPool,
)
from mla_tpu.models.trunk import CompactCNN, VGGish

VARIANTS = (
    "multi_level_attention",
    "single_attention",
    "multi_attention",
    "avg_pool",
    "max_pool",
)


class AudioTagger(nn.Module):
    """patches [B, T, 96, 64] (trunk != none) or features [B, T, D] -> probs [B, C]."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.trunk == "cnn":
            self.trunk_module = CompactCNN(
                conv_channels=cfg.conv_channels,
                convs_per_stage=cfg.convs_per_stage,
                embed_dim=cfg.embed_dim,
                dtype=dtype,
            )
        elif cfg.trunk in ("cnn10", "cnn14"):
            # PANNs block structure: 2 convs/stage, avg 2x2 pools, avg+max
            # global pooling (Kong et al. 2020); cnn14 adds the 1024/2048
            # stages
            chans = (64, 128, 256, 512) if cfg.trunk == "cnn10" else (
                64, 128, 256, 512, 1024, 2048
            )
            self.trunk_module = CompactCNN(
                conv_channels=chans,
                convs_per_stage=2,
                embed_dim=cfg.embed_dim,
                pool="avg",
                global_pool="avg+max",
                dtype=dtype,
            )
        elif cfg.trunk == "vggish":
            self.trunk_module = VGGish(embed_dim=cfg.embed_dim, dtype=dtype)
        elif cfg.trunk == "none":
            self.trunk_module = None
        else:
            raise ValueError(f"unknown trunk {cfg.trunk!r}")

        self.blocks = [
            EmbeddedMapping(
                hidden_units=cfg.hidden_units,
                layers_per_block=cfg.layers_per_block,
                dropout_rate=cfg.dropout_rate,
                dtype=dtype,
                name=f"block{i}",
            )
            for i in range(cfg.n_blocks)
        ]
        if cfg.variant == "multi_level_attention":
            self.atts = [
                AttentionModule(cfg.n_classes, cfg.att_activation, cfg.cla_activation,
                                dtype, name=f"att{i}")
                for i in range(cfg.n_blocks)
            ]
            self.out = nn.Dense(cfg.n_classes, dtype=jnp.float32, name="out")
        elif cfg.variant == "single_attention":
            self.att = AttentionModule(
                cfg.n_classes, cfg.att_activation, cfg.cla_activation, dtype, name="att"
            )
        elif cfg.variant == "multi_attention":
            self.mh = MultiHeadAttentionPool(
                cfg.n_classes, cfg.n_attention_heads, cfg.att_activation,
                cfg.cla_activation, dtype, name="mh",
            )
        elif cfg.variant in ("avg_pool", "max_pool"):
            self.pool = DecisionLevelPool(cfg.n_classes, cfg.variant[:3], dtype, name="pool")
        else:
            raise ValueError(f"unknown variant {cfg.variant!r}; pick from {VARIANTS}")

    def embed(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Input -> [B, T, embed_dim] segment embeddings (runs the trunk)."""
        if self.trunk_module is None:
            return x
        b, t = x.shape[0], x.shape[1]
        flat = x.reshape((b * t,) + x.shape[2:])  # patches into the batch axis
        if self.cfg.remat_trunk:
            # recompute trunk activations in backward instead of storing
            # them: trades MXU FLOPs for HBM (jax.checkpoint via nn.remat)
            emb = nn.remat(lambda m, xx: m(xx, train))(self.trunk_module, flat)
        else:
            emb = self.trunk_module(flat, train=train)
        return emb.reshape(b, t, -1)

    def head(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, T, D] embeddings -> [B, C] clip probabilities."""
        cfg = self.cfg
        if cfg.variant == "multi_level_attention":
            zs: List[jnp.ndarray] = []
            for block, att in zip(self.blocks, self.atts):
                h = block(h, train=train)
                zs.append(att(h))
            z = jnp.concatenate(zs, axis=-1)  # [B, L*C]
            return nn.sigmoid(self.out(z))
        for block in self.blocks:
            h = block(h, train=train)
        if cfg.variant == "single_attention":
            return self.att(h)
        if cfg.variant == "multi_attention":
            return self.mh(h)
        return self.pool(h)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.embed(x, train=train), train=train)

    def segment_logits(self, x: jnp.ndarray):
        """Per-segment (gate, cla) logits per level/head — the streaming-
        inference contract (T6/T11): pooling state is accumulated outside
        over chunks. Defined for EVERY variant: the pool baselines
        (avg/max) emit a zero gate — uniform weights under the exp
        accumulator (= avg) or a validity marker under the "max"
        accumulator (see serve.streaming.stream_activations)."""
        h = self.embed(x, train=False)
        cfg = self.cfg
        if cfg.variant == "multi_level_attention":
            outs = []
            for block, att in zip(self.blocks, self.atts):
                h = block(h, train=False)
                outs.append(att.logits(h))
            return outs
        for block in self.blocks:
            h = block(h, train=False)
        if cfg.variant == "single_attention":
            return [self.att.logits(h)]
        if cfg.variant == "multi_attention":
            return self.mh.logits(h)  # one (gate, cla) per head
        return [self.pool.logits(h)]  # avg_pool / max_pool

    def timeline(self, x: jnp.ndarray):
        """Weakly-supervised localization readout (arXiv:1803.02353 §2):
        per-segment attention weights and class probabilities, one
        ``(weights [B, T, C], seg_probs [B, T, C])`` pair per level/head.

        Exactly consistent with the clip forward: for every level,
        ``sum_t weights * seg_probs`` equals that level's pooled vector,
        so feeding those sums to the variant's finalize tail reproduces
        ``__call__``'s scores bit-for-bit (tested). The reference family
        visualizes exactly this pair to localize events in time; the
        clip-only C15 script never exposed it."""
        from mla_tpu.ops.attention_pool import attention_timeline
        from mla_tpu.serve.streaming import stream_activations

        att_act, cla_act = stream_activations(self.cfg)
        return [
            attention_timeline(g, c, att_act, cla_act)
            for g, c in self.segment_logits(x)
        ]

    def finalize_multi_level(self, pooled: List[jnp.ndarray]) -> jnp.ndarray:
        """Concat per-level pooled vectors -> final FC + sigmoid (streaming tail)."""
        z = jnp.concatenate(pooled, axis=-1)
        return nn.sigmoid(self.out(z))

    def finalize_multi_head(self, pooled: List[jnp.ndarray]) -> jnp.ndarray:
        """Concat per-head pooled vectors -> final FC + sigmoid (streaming tail
        for the multi_attention variant)."""
        return self.mh.finalize(pooled)


def build_model(cfg: ModelConfig) -> AudioTagger:
    """Reference ``build_model(variant, n_classes)`` equivalent."""
    return AudioTagger(cfg)


def example_input(cfg: ModelConfig, batch: int = 2, t: int = 10, frames: int = 96,
                  bins: int = 64) -> jnp.ndarray:
    if cfg.trunk == "none":
        return jnp.zeros((batch, t, cfg.embed_dim), jnp.float32)
    return jnp.zeros((batch, t, frames, bins), jnp.float32)
