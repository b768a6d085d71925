"""Context-parallel (time-sharded) inference (T6 end-to-end, SURVEY.md §5
"long-context" row): for a clip too long for one chip's HBM/step budget,
shard the patch axis T across the mesh — every device runs trunk + per-level
logits on its T/n_devices patches, folds them into local streaming
accumulators, and ONE psum over the O(n_classes) state produces the exact
whole-clip attention pooling. Communication is a single scalar-sized
collective per level, riding ICI; ring attention is structurally
unnecessary (pooling is O(T), not O(T^2))."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mla_tpu.config import Config
from mla_tpu.models.zoo import build_model
from mla_tpu.ops import attention_pool as ap
from mla_tpu.ops import frontend as fe


def tag_clip_time_sharded(
    cfg: Config,
    variables: Dict,
    waveform: np.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> np.ndarray:
    """Whole-clip scores with the patch axis sharded over ``mesh[axis]``.

    Equivalent to serve.streaming.tag_clip to float tolerance; the patch
    count is padded up to a multiple of the axis size with silence patches
    whose contribution is masked out of the accumulators.
    """
    model = build_model(cfg.model)
    n_dev = mesh.shape[axis]
    patches = fe.apply_frontend(
        jnp.asarray(waveform, jnp.float32)[None], cfg.frontend
    )  # [1, T, 96, 64]
    t = patches.shape[1]
    t_pad = -(-t // n_dev) * n_dev
    if t_pad != t:
        pad = jnp.zeros((1, t_pad - t) + patches.shape[2:], patches.dtype)
        patches = jnp.concatenate([patches, pad], axis=1)
    valid = (jnp.arange(t_pad) < t).astype(jnp.float32)[None]  # [1, T_pad]

    c = cfg.model.n_classes

    from mla_tpu.serve.streaming import stream_activations, stream_finalize_scores

    att_act, cla_act = stream_activations(cfg.model)

    def local(p_shard, valid_shard):
        levels = model.apply(variables, p_shard, method="segment_logits")
        states = []
        for g, cl in levels:
            # mask padded patches: gate logits -> -inf so the accumulator
            # ignores them (exp contributes 0; "max" treats them invalid)
            mask = valid_shard[..., None]
            g = jnp.where(mask > 0, g, -jnp.inf)
            st = ap.update_stream_state(
                ap.init_stream_state((1, c)), g, cl, att_act, cla_act,
            )
            states.append(ap.psum_stream_state(st, axis, att_act))
        return stream_finalize_scores(model, variables, cfg.model.variant, states)

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis, None, None), P(None, axis)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )
    return np.asarray(fn(patches, valid))[0]
