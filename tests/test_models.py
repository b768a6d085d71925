"""Model zoo tests: logit parity vs the torch-cpu oracle (SURVEY.md §4) and
shape/behavior checks for every variant and trunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import ModelConfig
from mla_tpu.models.zoo import AudioTagger, example_input
from tests.oracle import model_oracle as oracle


def _init(cfg: ModelConfig, x):
    model = AudioTagger(cfg)
    params = model.init(jax.random.key(0), x)
    return model, params


def _f32(cfg: ModelConfig) -> ModelConfig:
    import dataclasses

    return dataclasses.replace(cfg, compute_dtype="float32")


def test_multi_level_attention_matches_torch_oracle(rng):
    cfg = _f32(ModelConfig(variant="multi_level_attention", trunk="none", n_classes=31,
                           n_blocks=3, layers_per_block=2, hidden_units=64))
    x = rng.standard_normal((4, 10, 128)).astype(np.float32)
    model, params = _init(cfg, jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = oracle.multi_level_attention_forward(
        jax.tree.map(np.asarray, params["params"]), x, cfg.n_blocks, cfg.layers_per_block
    )
    assert ours.shape == (4, 31)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_single_attention_matches_torch_oracle(rng):
    cfg = _f32(ModelConfig(variant="single_attention", trunk="none", n_classes=17,
                           n_blocks=2, layers_per_block=1, hidden_units=32))
    x = rng.standard_normal((3, 10, 128)).astype(np.float32)
    model, params = _init(cfg, jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = oracle.single_attention_forward(
        jax.tree.map(np.asarray, params["params"]), x, cfg.n_blocks, cfg.layers_per_block
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_multi_attention_matches_torch_oracle(rng):
    cfg = _f32(ModelConfig(variant="multi_attention", trunk="none", n_classes=9,
                           n_blocks=2, layers_per_block=1, hidden_units=32,
                           n_attention_heads=3))
    x = rng.standard_normal((3, 10, 128)).astype(np.float32)
    model, params = _init(cfg, jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = oracle.multi_attention_forward(
        jax.tree.map(np.asarray, params["params"]), x, cfg.n_blocks,
        cfg.layers_per_block, cfg.n_attention_heads,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["avg", "max"])
def test_pool_variants_match_torch_oracle(rng, mode):
    cfg = _f32(ModelConfig(variant=f"{mode}_pool", trunk="none", n_classes=11,
                           n_blocks=1, layers_per_block=1, hidden_units=32))
    x = rng.standard_normal((3, 10, 128)).astype(np.float32)
    model, params = _init(cfg, jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    ref = oracle.avg_max_pool_forward(
        jax.tree.map(np.asarray, params["params"]), x, cfg.n_blocks, cfg.layers_per_block, mode
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_flax_conv_matches_torch(rng):
    """NHWC SAME conv parity — anchors the CNN trunk's conv semantics (C4)."""
    import flax.linen as nn

    conv = nn.Conv(8, (3, 3), padding="SAME", dtype=jnp.float32)
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    params = conv.init(jax.random.key(1), jnp.asarray(x))
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    ref = oracle.conv2d_nhwc(jax.tree.map(np.asarray, params["params"]), x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", ["multi_level_attention", "single_attention",
                                     "multi_attention", "avg_pool", "max_pool"])
def test_all_variants_forward(rng, variant):
    cfg = ModelConfig(variant=variant, trunk="none", n_classes=20, n_blocks=2,
                      hidden_units=64, compute_dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, 10, 128)).astype(np.float32))
    model, params = _init(cfg, x)
    probs = np.asarray(model.apply(params, x))
    assert probs.shape == (2, 20)
    assert (probs >= 0).all() and (probs <= 1).all()


@pytest.mark.parametrize("trunk", ["cnn", "vggish", "cnn10"])
def test_trunk_forward_shapes(rng, trunk):
    cfg = ModelConfig(variant="single_attention", trunk=trunk, n_classes=10, n_blocks=1,
                      conv_channels=(8, 16), convs_per_stage=1, hidden_units=32,
                      compute_dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, 3, 96, 64)).astype(np.float32))
    model = AudioTagger(cfg)
    variables = model.init(jax.random.key(0), x)
    probs = model.apply(variables, x)
    assert probs.shape == (2, 10)
    assert np.isfinite(np.asarray(probs)).all()


def test_cnn_trunk_batchnorm_train_mode(rng):
    cfg = ModelConfig(variant="single_attention", trunk="cnn", n_classes=5, n_blocks=1,
                      conv_channels=(8,), convs_per_stage=1, hidden_units=16,
                      compute_dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, 2, 96, 64)).astype(np.float32))
    model = AudioTagger(cfg)
    variables = model.init(jax.random.key(0), x, train=False)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(2)},
    )
    assert out.shape == (2, 5)
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
                     variables["batch_stats"], mutated["batch_stats"]),
    )
    assert changed


def test_dropout_only_in_train_mode(rng):
    cfg = ModelConfig(variant="single_attention", trunk="none", n_classes=5, n_blocks=1,
                      hidden_units=64, dropout_rate=0.5, compute_dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, 10, 128)).astype(np.float32))
    model, params = _init(cfg, x)
    a = model.apply(params, x)
    b = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eval: deterministic
    c = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(3)})
    assert np.any(np.asarray(a) != np.asarray(c))


def test_example_input_shapes():
    assert example_input(ModelConfig(trunk="none")).shape == (2, 10, 128)
    assert example_input(ModelConfig(trunk="cnn")).shape == (2, 10, 96, 64)
