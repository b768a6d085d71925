"""LR schedules / grad clipping (C11) and trunk rematerialization options."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mla_tpu.models.zoo import AudioTagger
from mla_tpu.train.state import create_train_state, make_optimizer, make_train_step


@pytest.mark.parametrize("sched", ["constant", "cosine", "exponential"])
def test_schedules_build_and_step(sched):
    cfg = Config(train=TrainConfig(learning_rate=1e-3, lr_schedule=sched, num_steps=100,
                                   warmup_steps=10, gradient_clip_norm=1.0))
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 100.0)}  # big grads exercise clipping
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["w"])
    assert np.isfinite(u).all()


def test_unknown_schedule_raises():
    cfg = Config(train=TrainConfig(lr_schedule="bogus"))
    with pytest.raises(ValueError, match="lr_schedule"):
        make_optimizer(cfg)


def test_remat_trunk_same_loss_and_grads(rng):
    base = ModelConfig(variant="single_attention", trunk="cnn", n_classes=6, n_blocks=1,
                       conv_channels=(8,), convs_per_stage=1, hidden_units=32,
                       compute_dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, 3, 96, 64)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 6)) < 0.3).astype(np.float32))

    losses = {}
    for remat in (False, True):
        mcfg = dataclasses.replace(base, remat_trunk=remat)
        cfg = Config(model=mcfg, train=TrainConfig(batch_size=2, num_steps=1))
        model = AudioTagger(mcfg)
        state = create_train_state(cfg, model, x)
        step = jax.jit(make_train_step(cfg, model, "patches"))
        new_state, loss = step(state, x, y)
        losses[remat] = float(loss)
    assert losses[False] == pytest.approx(losses[True], rel=1e-6)
