"""Mixup augmentation + embed CLI tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.ops.augment import mixup


def test_mixup_convexity(rng):
    x = jnp.asarray(rng.standard_normal((8, 10, 16)).astype(np.float32))
    y = jnp.asarray((rng.random((8, 5)) < 0.3).astype(np.float32))
    xm, ym = mixup(x, y, jax.random.key(0), alpha=0.5)
    assert xm.shape == x.shape and ym.shape == y.shape
    # labels stay in [0, 1]; mixed labels are convex combinations
    assert float(ym.min()) >= 0 and float(ym.max()) <= 1
    # lam >= 0.5: the original example dominates — mixed x is closer to x
    d_self = np.linalg.norm(np.asarray(xm - x))
    d_other = np.linalg.norm(np.asarray(xm) - np.asarray(x)[::-1])
    assert d_self < d_other * 2  # loose sanity


def test_mixup_deterministic(rng):
    x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    y = jnp.asarray((rng.random((4, 3)) < 0.5).astype(np.float32))
    a = mixup(x, y, jax.random.key(7))
    b = mixup(x, y, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_train_step_with_mixup(rng):
    from mla_tpu.config import Config, ModelConfig, TrainConfig
    from mla_tpu.models.zoo import AudioTagger
    from mla_tpu.train.state import create_train_state, make_train_step

    mcfg = ModelConfig(variant="single_attention", trunk="none", n_classes=5, n_blocks=1,
                       hidden_units=16, compute_dtype="float32")
    cfg = Config(model=mcfg, train=TrainConfig(batch_size=4, num_steps=1, mixup_alpha=0.4))
    x = jnp.asarray(rng.standard_normal((4, 10, 128)).astype(np.float32))
    y = jnp.asarray((rng.random((4, 5)) < 0.3).astype(np.float32))
    model = AudioTagger(mcfg)
    state = create_train_state(cfg, model, x)
    step = jax.jit(make_train_step(cfg, model, "features"))
    _, loss = step(state, x, y)
    assert np.isfinite(float(loss))


def test_embed_cli(tmp_path, capsys, rng):
    from mla_tpu.__main__ import main
    from mla_tpu.data import audio_io

    wav = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    wp = str(tmp_path / "e.wav")
    audio_io.write_wav(wp, wav)
    out = str(tmp_path / "emb.npy")
    main(["embed", "--wav", wp, "--out", out,
          "--set", "model.conv_channels=8", "model.convs_per_stage=1"])
    emb = np.load(out)
    assert emb.shape == (3, 128)  # 3 patches x embed_dim
    assert np.isfinite(emb).all()
