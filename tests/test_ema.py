"""Parameter EMA (TrainConfig.ema_decay): the Polyak shadow follows the
published recurrence exactly, eval reads the shadow when enabled, and the
shadow survives checkpoint round-trips (it is a plain pytree leaf of
TrainState). The reference family has no EMA; this is a training-quality
feature standard in the audio-tagging literature (e.g. PANNs-style
training recipes)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.train.state import (create_train_state, eval_params,
                                 make_eval_step, make_train_step)


def _tiny_cfg(**train_kw):
    kw = dict(batch_size=4, num_steps=4, eval_every=1000,
              checkpoint_every=0, log_every=1, data_parallel=1)
    kw.update(train_kw)
    return Config(
        name="ema_test",
        model=ModelConfig(variant="single_attention", trunk="none",
                          n_classes=5, n_blocks=1, hidden_units=16,
                          compute_dtype="float32"),
        data=DataConfig(dataset="synthetic_audioset", n_train_clips=16,
                        n_eval_clips=8),
        train=TrainConfig(**kw),
    )


def _setup(cfg):
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 10, 128)).astype(np.float32)
    y = (rng.random((4, 5)) < 0.3).astype(np.float32)
    state = create_train_state(cfg, model, x)
    step = make_train_step(cfg, model, "features")
    return model, state, step, x, y


def test_ema_follows_recurrence():
    d = 0.5
    cfg = _tiny_cfg(ema_decay=d)
    _, state, step, x, y = _setup(cfg)
    manual = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y))
        manual = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p), manual, state.params)
    jax.tree.map(
        lambda e, m: np.testing.assert_allclose(np.asarray(e), m, atol=1e-6),
        state.ema_params, manual)


def test_ema_disabled_is_none():
    cfg = _tiny_cfg()
    _, state, step, x, y = _setup(cfg)
    assert state.ema_params is None
    state, _ = step(state, jnp.asarray(x), jnp.asarray(y))
    assert state.ema_params is None
    assert eval_params(cfg, state) is state.params


def test_eval_reads_frozen_shadow():
    """decay=1.0 freezes the shadow at init: after training, the eval step
    must reproduce the INIT params' output, not the online params'."""
    cfg = _tiny_cfg(ema_decay=1.0)
    model, state, step, x, y = _setup(cfg)
    init_probs = model.apply({"params": state.params}, jnp.asarray(x),
                             train=False)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y))
    eval_step = make_eval_step(cfg, model, "features")
    got = eval_step(state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(init_probs),
                               atol=1e-6)
    online = model.apply({"params": state.params}, jnp.asarray(x),
                         train=False)
    assert not np.allclose(np.asarray(got), np.asarray(online), atol=1e-6)

    # ema_eval=False opts eval back onto the online params
    cfg_online = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_eval=False))
    got_online = make_eval_step(cfg_online, model, "features")(
        state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_online), np.asarray(online),
                               atol=1e-6)


def test_weights_verb_dumps_ema_shadow(tmp_path, capsys):
    """`weights --out --ema` exports the Polyak shadow (the serving
    tree), not the online params."""
    from mla_tpu import config as _cmod
    from mla_tpu.models.convert import params_to_flat
    from mla_tpu.train.loop import fit
    from mla_tpu.__main__ import main

    cfg = _tiny_cfg(ema_decay=0.9, checkpoint_every=4)
    cfg = dataclasses.replace(cfg, name="ema_weights_test",
                              workspace=str(tmp_path))
    _cmod._CONFIGS["ema_weights_test"] = lambda: cfg
    res = fit(cfg, log=False)
    out = str(tmp_path / "ema.npz")
    main(["weights", "--config", "ema_weights_test",
          "--workspace", str(tmp_path), "--out", out, "--ema"])
    flat = dict(np.load(out))
    want = params_to_flat(jax.tree.map(np.asarray, dict(res.state.ema_params)),
                          prefix="params/")
    for k, v in want.items():
        np.testing.assert_array_equal(flat[k], v)


def test_fit_checkpoints_and_resumes_ema(tmp_path):
    from mla_tpu.train.loop import fit, resume

    cfg = _tiny_cfg(ema_decay=0.9, checkpoint_every=4)
    cfg = dataclasses.replace(cfg, workspace=str(tmp_path))
    res = fit(cfg, log=False)
    assert res.state.ema_params is not None
    state, _ = resume(cfg, str(tmp_path))
    assert state.ema_params is not None
    # the restored shadow equals the trained shadow, and differs from the
    # online params (training moved them away from the decayed average)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.ema_params, res.state.ema_params)
    flat_p = np.concatenate([np.ravel(l) for l in jax.tree.leaves(state.params)])
    flat_e = np.concatenate([np.ravel(l) for l in jax.tree.leaves(state.ema_params)])
    assert not np.allclose(flat_p, flat_e)
