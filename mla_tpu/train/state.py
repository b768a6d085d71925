"""Train state + step builders (reference C10 loss, C11 optimizer, C12 loop
body — ``main.py`` in the reference family, SURVEY.md §2.1).

TPU-first: the whole step (optional device front-end -> trunk -> heads ->
BCE -> backward -> Adam) is ONE jittable function of (state, batch); the
caller jits it with shardings + donated state (BASELINE.json:5 "no host
round-trips", SURVEY.md §7 stage 6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mla_tpu.config import Config
from mla_tpu.models.zoo import AudioTagger
from mla_tpu.ops import frontend as fe

_EPS = 1e-7


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm
    opt_state: Any
    dropout_key: jax.Array
    # Polyak/EMA shadow of params (None when train.ema_decay == 0): decays
    # toward the online params each step; eval/serving read it for the
    # smoother late-training operating point standard in audio tagging.
    # As a pytree mirroring params it inherits TP shardings and Orbax
    # checkpointing for free.
    ema_params: Any = None


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Multi-label binary cross-entropy over sigmoid probabilities (C10).
    The reference computes BCE on probabilities (attention pooling emits
    probs, not logits), so clamp for the log."""
    p = jnp.clip(probs.astype(jnp.float32), _EPS, 1.0 - _EPS)
    t = targets.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam at lr~1e-3 (C11: the reference family's setting), with optional
    warmup + decay schedule and gradient clipping."""
    t = cfg.train
    if t.lr_schedule == "constant":
        sched = optax.constant_schedule(t.learning_rate)
    elif t.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(t.learning_rate, max(t.num_steps, 1))
    elif t.lr_schedule == "exponential":
        sched = optax.exponential_decay(
            t.learning_rate, transition_steps=1000, decay_rate=t.lr_decay_rate
        )
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
    if t.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
        sched = optax.join_schedules([warm, sched], [t.warmup_steps])
    parts = []
    if t.gradient_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(t.gradient_clip_norm))
    parts.append(optax.adam(sched))
    return optax.chain(*parts)


def create_train_state(
    cfg: Config, model: AudioTagger, sample_batch: jnp.ndarray, seed: Optional[int] = None
) -> TrainState:
    seed = cfg.train.seed if seed is None else seed
    init_key, dropout_key = jax.random.split(jax.random.key(seed))
    variables = model.init(init_key, sample_batch, train=False)
    tx = make_optimizer(cfg)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        dropout_key=dropout_key,
        ema_params=(jax.tree.map(jnp.asarray, params)
                    if cfg.train.ema_decay > 0 else None),
    )


def _apply_frontend(cfg: Config, x: jnp.ndarray) -> jnp.ndarray:
    """Device-side front-end for waveform batches (C3 on TPU inside the
    step program; fused Pallas kernel when cfg.frontend.impl == 'pallas')."""
    return fe.apply_frontend(x, cfg.frontend)


def decode_staged(x: jnp.ndarray, stage: str,
                  clip_samples: Optional[int] = None) -> jnp.ndarray:
    """Device-side decode of a compressed waveform batch
    (DataConfig.staging_dtype wire form) -> float32 [-1,1]. Used inside
    the jitted train step for BOTH input paths: HBM-resident gathers and
    host-streamed batches travel in wire form either way. A float32
    input passes through regardless of ``stage`` — floats are never wire
    form, so a caller feeding already-decoded audio (tests, direct step
    use) must not be re-scaled."""
    if x.dtype == jnp.float32:
        return x
    if stage == "int16":
        return x.astype(jnp.float32) / 32768.0
    if stage == "uint8":
        from mla_tpu.data.audio_io import mulaw_decode

        return mulaw_decode(x, xp=jnp)
    if stage == "adpcm4":
        from mla_tpu.data.adpcm import adpcm4_decode

        return adpcm4_decode(x, n=clip_samples, xp=jnp)
    return x


def make_train_step(
    cfg: Config, model: AudioTagger, input_kind: str,
    clip_samples: Optional[int] = None,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], Tuple[TrainState, jnp.ndarray]]:
    """(state, x, y) -> (state', loss). x is a waveform [B, n], feature
    sequence [B, T, D], or patch tensor [B, T, 96, 64] per ``input_kind``.
    With ``data.staging_dtype != float32`` (waveform input), x arrives in
    wire form and is decoded here on device; ``clip_samples`` slices the
    adpcm4 block padding (None = no slicing, for block-aligned clips)."""
    tx = make_optimizer(cfg)
    # CompactCNN-family trunks default to BatchNorm (mutable batch_stats)
    has_bn = cfg.model.trunk in ("cnn", "cnn10", "cnn14")
    train_cfg = cfg
    if cfg.train.frontend_precision is not None:
        train_cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(
                cfg.frontend, precision=cfg.train.frontend_precision
            ),
        )

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray):
        if input_kind == "waveform":
            x = decode_staged(x, cfg.data.staging_dtype, clip_samples)
            x_in = _apply_frontend(train_cfg, x)
        else:
            x_in = x
        rng = jax.random.fold_in(state.dropout_key, state.step)
        if cfg.train.mixup_alpha > 0:
            from mla_tpu.ops.augment import mixup

            x_in, y = mixup(x_in, y, jax.random.fold_in(rng, 2), cfg.train.mixup_alpha)
        if cfg.train.spec_augment and input_kind in ("waveform", "patches"):
            from mla_tpu.ops.augment import spec_augment

            x_in = spec_augment(
                x_in, jax.random.fold_in(rng, 1),
                time_mask_width=cfg.train.time_mask_width,
                freq_mask_width=cfg.train.freq_mask_width,
            )

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                probs, mutated = model.apply(
                    variables, x_in, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                new_stats = mutated["batch_stats"]
            else:
                probs = model.apply(variables, x_in, train=True, rngs={"dropout": rng})
                new_stats = state.batch_stats
            return bce_loss(probs, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = cfg.train.ema_decay
        new_ema = (
            jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                         state.ema_params, new_params)
            if d > 0 else state.ema_params
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, loss

    return step


def variables_from_state(state: TrainState, params: Any = None) -> dict:
    """Model-apply variables dict from a TrainState (``params`` overrides
    the tree, e.g. the EMA shadow) — the one place the params/batch_stats
    assembly idiom lives."""
    variables = {"params": state.params if params is None else params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


def eval_params(cfg: Config, state: TrainState) -> Any:
    """The param tree eval/serving should read: the EMA shadow when
    enabled (train.ema_decay > 0 and train.ema_eval), else the online
    params."""
    if cfg.train.ema_decay > 0 and cfg.train.ema_eval \
            and state.ema_params is not None:
        return state.ema_params
    return state.params


def make_eval_step(cfg: Config, model: AudioTagger, input_kind: str):
    """(state, x) -> probs, eval mode (running BN stats, no dropout;
    EMA params when enabled)."""

    def step(state: TrainState, x: jnp.ndarray) -> jnp.ndarray:
        if input_kind == "waveform":
            x = _apply_frontend(cfg, x)
        variables = variables_from_state(state, eval_params(cfg, state))
        return model.apply(variables, x, train=False).astype(jnp.float32)

    return step
