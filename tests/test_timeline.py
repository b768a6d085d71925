"""Localization timeline (model.timeline / ops.attention_timeline): the
per-segment (attention weight, class prob) readout must be EXACTLY
consistent with the clip forward — for every level, sum_t w*f equals the
pooled vector, so the variant's finalize tail reproduces __call__.

The reference family visualizes this pair for weakly-supervised event
localization (arXiv:1803.02353 §2); the clip-only C15 script never exposed
it, so the contract here is internal consistency, not an external oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import ModelConfig
from mla_tpu.models.zoo import AudioTagger


def _setup(variant, rng, **kw):
    base = dict(n_blocks=2, layers_per_block=1, hidden_units=32,
                compute_dtype="float32")
    base.update(kw)
    cfg = ModelConfig(variant=variant, trunk="none", n_classes=13, **base)
    cfg = dataclasses.replace(cfg)
    x = jnp.asarray(rng.standard_normal((3, 10, 128)).astype(np.float32))
    model = AudioTagger(cfg)
    params = model.init(jax.random.key(0), x)
    return cfg, model, params, x


def _pooled(tl):
    """Per-level sum_t w*f — what the finalize tails consume."""
    return [jnp.sum(w * f, axis=-2) for w, f in tl]


@pytest.mark.parametrize("variant", ["single_attention", "avg_pool", "max_pool"])
def test_timeline_reproduces_forward_single_level(variant, rng):
    cfg, model, params, x = _setup(variant, rng)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 1
    got = np.asarray(_pooled(tl)[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_timeline_reproduces_forward_multi_level(rng):
    cfg, model, params, x = _setup("multi_level_attention", rng, n_blocks=3)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 3
    got = np.asarray(model.apply(params, _pooled(tl),
                                 method="finalize_multi_level"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_timeline_reproduces_forward_multi_attention(rng):
    cfg, model, params, x = _setup("multi_attention", rng,
                                   n_attention_heads=3)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 3
    got = np.asarray(model.apply(params, _pooled(tl),
                                 method="finalize_multi_head"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("variant,expect_uniform", [
    ("single_attention", False), ("avg_pool", True)])
def test_timeline_weights_normalized(variant, expect_uniform, rng):
    _, model, params, x = _setup(variant, rng)
    w, f = model.apply(params, x, method="timeline")[0]
    w, f = np.asarray(w), np.asarray(f)
    np.testing.assert_allclose(w.sum(axis=-2), 1.0, rtol=1e-6)
    assert (w >= 0).all() and (f >= 0).all() and (f <= 1).all()
    if expect_uniform:  # avg_pool: zero gate -> every patch weighs 1/T
        np.testing.assert_allclose(w, 1.0 / x.shape[1], rtol=1e-6)


def test_timeline_max_mode_masks_invalid_segments(rng):
    """The max gate treats -inf gate logits as masked, mirroring
    update_stream_state: a masked segment never wins the argmax."""
    from mla_tpu.ops.attention_pool import attention_timeline

    cla = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    gate = jnp.zeros_like(cla).at[:, 3:].set(-jnp.inf)
    w, f = attention_timeline(gate, cla, "max", "sigmoid")
    w = np.asarray(w)
    assert (w[:, 3:] == 0).all()
    got = np.asarray((w * np.asarray(f)).sum(axis=-2))
    want = np.asarray(jax.nn.sigmoid(cla[:, :3]).max(axis=-2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_infer_timeline_cli(tmp_path, rng):
    """infer --timeline writes the per-patch CSV next to the top-k JSON."""
    import wave

    from mla_tpu.__main__ import main

    sr = 16000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    wav_path = tmp_path / "tone.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    out = tmp_path / "tl.csv"
    main(["infer", "--config=esc50_single_attention", "--wav", str(wav_path),
          "--checkpoint=random", "--top_k=3", "--timeline", str(out)])
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("patch,time_s,prob:")
    assert lines[0].count("prob:") == 3 and lines[0].count("att:") == 3
    assert len(lines) >= 2  # header + >=1 patch row
    first = lines[1].split(",")
    assert first[0] == "0" and float(first[1]) == 0.0
