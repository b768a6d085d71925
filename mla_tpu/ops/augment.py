"""SpecAugment-style training augmentation (Park et al. 2019): random time-
and mel-frequency masking on log-mel patches. Not present in the reference
(its family predates SpecAugment) but standard for this task today; off by
default (TrainConfig.spec_augment).

Static-shape, jit-friendly: masks are built from broadcasted iota
comparisons with per-clip fold_in keys — no dynamic shapes, runs inside the
train-step program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _span_mask(key: jax.Array, size: int, max_width: int) -> jax.Array:
    """[size] bool mask with one random span of width U[0, max_width] set."""
    kw, ks = jax.random.split(key)
    width = jax.random.randint(kw, (), 0, max_width + 1)
    start = jax.random.randint(ks, (), 0, jnp.maximum(size - width, 1))
    idx = jnp.arange(size)
    return (idx >= start) & (idx < start + width)


def spec_augment(
    patches: jax.Array,
    key: jax.Array,
    n_time_masks: int = 2,
    time_mask_width: int = 24,
    n_freq_masks: int = 2,
    freq_mask_width: int = 12,
    mask_value: float | None = None,
) -> jax.Array:
    """[B, T, frames, mels] (or [B, frames, mels]) -> masked copy.

    Each clip gets independent masks (key folded per clip). Time masks span
    the frame axis within every patch; frequency masks span mel bins.
    mask_value=None masks to the per-clip mean (keeps log-mel statistics
    closer to unmasked data than zeroing).
    """
    squeeze = patches.ndim == 3
    if squeeze:
        patches = patches[:, None]
    b, t, frames, mels = patches.shape

    def one_clip(p, k):
        fill = jnp.mean(p) if mask_value is None else jnp.asarray(mask_value, p.dtype)
        tm = jnp.zeros((frames,), bool)
        fm = jnp.zeros((mels,), bool)
        keys = jax.random.split(k, n_time_masks + n_freq_masks)
        for i in range(n_time_masks):
            tm |= _span_mask(keys[i], frames, time_mask_width)
        for i in range(n_freq_masks):
            fm |= _span_mask(keys[n_time_masks + i], mels, freq_mask_width)
        masked = jnp.where(tm[None, :, None] | fm[None, None, :], fill, p)
        return masked

    keys = jax.random.split(key, b)
    out = jax.vmap(one_clip)(patches, keys)
    return out[:, 0] if squeeze else out


def mixup(
    x: jax.Array,
    y: jax.Array,
    key: jax.Array,
    alpha: float = 0.5,
):
    """Mixup over the batch axis (Zhang et al. 2018; standard in the PANNs
    lineage): convex-combine each example with a shuffled partner using a
    Beta(alpha, alpha) weight. Works on any feature rank (waveform,
    patches, or bottleneck features). Returns (x_mixed, y_mixed)."""
    kperm, klam = jax.random.split(key)
    b = x.shape[0]
    perm = jax.random.permutation(kperm, b)
    lam = jax.random.beta(klam, alpha, alpha, (b,))
    lam = jnp.maximum(lam, 1.0 - lam)  # keep the original example dominant
    lam_x = lam.reshape((b,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    lam_y = lam.reshape((b, 1)).astype(y.dtype)
    return (
        lam_x * x + (1 - lam_x) * x[perm],
        lam_y * y + (1 - lam_y) * y[perm],
    )
