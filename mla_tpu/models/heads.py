"""Clip-level heads (reference C5-C8, arXiv:1803.02353 §2-§3).

``EmbeddedMapping`` blocks transform the [B, T, D] segment-embedding
sequence; an ``AttentionModule`` pools over time; the head variants differ
in how many attention modules and where they attach (SURVEY.md §2.1 C7/C8).

All Dense compute can run in bf16; the pooling normalization itself is done
in f32 (gate softmax ratios are precision-sensitive).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from mla_tpu.ops.attention_pool import attention_pool

Dtype = Any


class EmbeddedMapping(nn.Module):
    """One level: ``layers_per_block`` x (Dense hidden_units + ReLU + Dropout).

    Paper: 1-3 FC layers of ~500 ReLU units, dropout ~0.4 per block (C5).
    hidden_units defaults to 512 in configs — a 128-lane-friendly width.
    """

    hidden_units: int = 512
    layers_per_block: int = 1
    dropout_rate: float = 0.4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = h.astype(self.dtype)
        for i in range(self.layers_per_block):
            h = nn.Dense(self.hidden_units, dtype=self.dtype, name=f"fc{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return h


class AttentionModule(nn.Module):
    """Attention pooling over time (C6): per-class gate + per-class classifier.

    y_c = sum_t act(hW_v+b_v)_{t,c} * cla(hW_f+b_f)_{t,c} / sum_t act(...)_{t,c}
    With att_activation="exp" the gate is a learned softmax over time.
    """

    n_classes: int
    att_activation: str = "exp"
    cla_activation: str = "sigmoid"
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        # shared by __call__ and logits (the streaming path reuses the same
        # projections, so whole-clip and chunked scores are the same function)
        self.gate_proj = nn.Dense(self.n_classes, dtype=self.dtype, name="gate")
        self.cla_proj = nn.Dense(self.n_classes, dtype=self.dtype, name="cla")

    def logits(self, h: jnp.ndarray):
        """Per-segment (gate, cla) logits — used by the streaming path (T6)."""
        return (
            self.gate_proj(h).astype(jnp.float32),
            self.cla_proj(h).astype(jnp.float32),
        )

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        gate, cla = self.logits(h)
        # pooling ratio in f32: bf16 exp/ratios lose the parity tolerance
        return attention_pool(gate, cla, self.att_activation, self.cla_activation)


class DecisionLevelPool(nn.Module):
    """Baseline heads (C8): per-segment sigmoid classifier, avg/max over time.

    setup-style so the streaming path (T11) can reuse the projection:
    ``logits`` exposes per-segment (gate, cla) in the attention modules'
    streaming contract — a zero gate, which under the exp accumulator
    weights every segment uniformly (= avg) and under the "max"
    accumulator just marks segments valid — so the pool baselines stream
    through the exact same O(1) state as the attention heads."""

    n_classes: int
    mode: str = "avg"  # avg | max
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.cla_proj = nn.Dense(self.n_classes, dtype=self.dtype, name="cla")

    def logits(self, h: jnp.ndarray):
        """Per-segment (gate, cla) logits — the streaming contract (T6).
        The gate is identically zero: valid (finite) and uniform."""
        cla = self.cla_proj(h).astype(jnp.float32)
        return jnp.zeros_like(cla), cla

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        _, cla = self.logits(h)
        seg = nn.sigmoid(cla)
        if self.mode == "avg":
            return jnp.mean(seg, axis=-2)
        if self.mode == "max":
            return jnp.max(seg, axis=-2)
        raise ValueError(f"unknown pool mode {self.mode!r}")


class MultiHeadAttentionPool(nn.Module):
    """'Multi attention' baseline (C8): several attention modules on the SAME
    (last) hidden layer, concatenated, FC -> sigmoid.

    setup-style (not compact) so the streaming path (T11) can reuse the same
    projections: ``logits`` exposes per-head (gate, cla) for chunked
    accumulation and ``finalize`` applies the concat+FC tail — whole-clip and
    streamed scores are then the same function of the same parameters."""

    n_classes: int
    n_heads: int = 4
    att_activation: str = "exp"
    cla_activation: str = "sigmoid"
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.heads = [
            AttentionModule(self.n_classes, self.att_activation, self.cla_activation,
                            self.dtype, name=f"att{i}")
            for i in range(self.n_heads)
        ]
        self.out = nn.Dense(self.n_classes, dtype=jnp.float32, name="out")

    def logits(self, h: jnp.ndarray):
        """Per-head per-segment (gate, cla) logits — the streaming contract."""
        return [head.logits(h) for head in self.heads]

    def finalize(self, pooled: List[jnp.ndarray]) -> jnp.ndarray:
        """Concat per-head pooled vectors -> final FC + sigmoid."""
        z = jnp.concatenate(pooled, axis=-1)
        return nn.sigmoid(self.out(z))

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        pooled = [
            attention_pool(g, c, self.att_activation, self.cla_activation)
            for g, c in self.logits(h)
        ]
        return self.finalize(pooled)
