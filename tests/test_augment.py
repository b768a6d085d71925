"""SpecAugment masking tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.ops.augment import spec_augment


def test_masks_are_spans_and_deterministic(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 96, 64)).astype(np.float32))
    a = np.asarray(spec_augment(x, jax.random.key(0)))
    b = np.asarray(spec_augment(x, jax.random.key(0)))
    np.testing.assert_array_equal(a, b)  # same key -> same masks
    c = np.asarray(spec_augment(x, jax.random.key(1)))
    assert np.any(a != c)  # different key -> different masks
    # some values changed, most survive
    changed = np.mean(a != np.asarray(x))
    assert 0.0 < changed < 0.8


def test_clips_masked_independently(rng):
    x = jnp.asarray(np.ones((2, 2, 96, 64), np.float32))
    out = np.asarray(spec_augment(x, jax.random.key(3), mask_value=0.0))
    m0 = out[0] == 0
    m1 = out[1] == 0
    assert m0.any() or m1.any()
    assert np.any(m0 != m1)  # per-clip keys


def test_mask_value_mean_default(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 96, 64)).astype(np.float32) + 5.0)
    out = np.asarray(spec_augment(x, jax.random.key(4)))
    masked_vals = out[out != np.asarray(x)]
    if masked_vals.size:
        np.testing.assert_allclose(masked_vals, float(np.asarray(x).mean()), atol=1e-5)


def test_3d_input_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 96, 64)).astype(np.float32))
    out = spec_augment(x, jax.random.key(5))
    assert out.shape == x.shape


def test_train_step_with_spec_augment(tmp_path, rng):
    from mla_tpu.config import Config, ModelConfig, TrainConfig
    from mla_tpu.models.zoo import AudioTagger
    from mla_tpu.train.state import create_train_state, make_train_step

    mcfg = ModelConfig(variant="single_attention", trunk="cnn", n_classes=5, n_blocks=1,
                       conv_channels=(8,), convs_per_stage=1, hidden_units=16,
                       compute_dtype="float32")
    cfg = Config(model=mcfg, train=TrainConfig(batch_size=2, num_steps=1, spec_augment=True))
    x = jnp.asarray(rng.standard_normal((2, 2, 96, 64)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 5)) < 0.3).astype(np.float32))
    model = AudioTagger(mcfg)
    state = create_train_state(cfg, model, x)
    step = jax.jit(make_train_step(cfg, model, "patches"))
    _, loss = step(state, x, y)
    assert np.isfinite(float(loss))
