"""Time-sharded (context-parallel) inference == whole-clip inference, on the
8-device CPU mesh — the T6 story end-to-end through the product API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, ModelConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.parallel import mesh as pmesh
from mla_tpu.serve.sharded import tag_clip_time_sharded
from mla_tpu.serve.streaming import tag_clip


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        name="sharded_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn", n_classes=7,
                          n_blocks=2, hidden_units=48, conv_channels=(8, 16),
                          convs_per_stage=1, compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    from mla_tpu.ops.frontend import waveform_to_patches

    wav = (np.random.default_rng(7).standard_normal(16000 * 33) * 0.1).astype(np.float32)
    patches = waveform_to_patches(jnp.asarray(wav[: 16000 * 2])[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    return cfg, variables, wav


def test_time_sharded_equals_whole_clip(setup):
    cfg, variables, wav = setup
    mesh = pmesh.make_mesh()  # 8 CPU devices on the "data" axis
    whole = tag_clip(cfg, variables, wav)  # 34 patches, not a multiple of 8
    sharded = tag_clip_time_sharded(cfg, variables, wav, mesh)
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)


def test_time_sharded_multi_attention(setup):
    cfg, variables, wav = setup
    import dataclasses

    cfg1 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, variant="multi_attention")
    )
    model = build_model(cfg1.model)
    from mla_tpu.ops.frontend import waveform_to_patches

    patches = waveform_to_patches(jnp.asarray(wav[: 16000 * 2])[None], cfg1.frontend)
    variables1 = model.init(jax.random.key(2), patches)
    mesh = pmesh.make_mesh()
    whole = tag_clip(cfg1, variables1, wav)
    sharded = tag_clip_time_sharded(cfg1, variables1, wav, mesh)
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", ["avg_pool", "max_pool"])
def test_time_sharded_pool_baselines(setup, variant):
    """The pool baselines shard over time too: psum for the uniform-gate
    avg accumulators, pmax for the max mode (round-2 VERDICT missing
    item 4). 34 patches over 8 devices exercises the padded-shard mask."""
    cfg, variables, wav = setup
    import dataclasses

    cfg1 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, variant=variant)
    )
    model = build_model(cfg1.model)
    from mla_tpu.ops.frontend import waveform_to_patches

    patches = waveform_to_patches(jnp.asarray(wav[: 16000 * 2])[None], cfg1.frontend)
    variables1 = model.init(jax.random.key(3), patches)
    mesh = pmesh.make_mesh()
    whole = tag_clip(cfg1, variables1, wav)
    sharded = tag_clip_time_sharded(cfg1, variables1, wav, mesh)
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)


def test_time_sharded_single_attention(setup):
    cfg, variables, wav = setup
    import dataclasses

    cfg1 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, variant="single_attention")
    )
    model = build_model(cfg1.model)
    from mla_tpu.ops.frontend import waveform_to_patches

    patches = waveform_to_patches(jnp.asarray(wav[: 16000 * 2])[None], cfg1.frontend)
    variables1 = model.init(jax.random.key(1), patches)
    mesh = pmesh.make_mesh()
    whole = tag_clip(cfg1, variables1, wav)
    sharded = tag_clip_time_sharded(cfg1, variables1, wav, mesh)
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)
