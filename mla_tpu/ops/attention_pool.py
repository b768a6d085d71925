"""Attention pooling over time (reference C6, arXiv:1803.02353 §2) and its
chunked-streaming formulation (build component T6, SURVEY.md §2.2).

Clip-level output from per-segment features h_t:

    y_c = sum_t  v_norm(h_t)_c * f(h_t)_c ,
    v_norm(h_t)_c = act(a_t)_c / sum_k act(a_k)_c

where a = h W_v + b_v are gate logits, f = cla_act(h W_f + b_f) is the
per-segment classifier, and ``act`` is a non-negative gate activation.
With act = exp this IS softmax-over-time attention ("learned softmax
weights", BASELINE.json:5).

Streaming: the pooled output is a ratio of two time-sums, so arbitrarily
long audio folds into O(1) state — running (numerator, denominator)
accumulators, renormalized online-softmax style for the exp gate (running
max m, accumulators scaled by exp(m_old - m_new) when the max moves). The
same pair combines across chips with one psum if the time axis is sharded
(SURVEY.md §5 "long-context"): ring attention / Ulysses are structurally
N/A because this pooling is O(T), not O(T^2) self-attention.

The pool baselines (reference C8) stream through the SAME state:
- avg: a uniform gate (all logits 0) under the exp activation IS the mean
  — softmax of zeros weights every segment 1/T, so no new machinery.
- max: ``att_activation="max"`` turns the state into a degenerate running
  maximum (num = max_t f_t so far, den = 1 once any segment is seen);
  masked segments carry gate logits of -inf, exactly like the exp gate.
  Requires non-negative classifier outputs (the pool head's sigmoid) —
  the zero-initialized num is the identity only for f >= 0.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


def gate_activation(logits: jax.Array, kind: str, *, stable_shift: bool = True) -> jax.Array:
    """Non-negative gate activation act(a). For ``exp`` the caller is expected
    to subtract a per-clip max first (done in :func:`attention_pool`)."""
    if kind == "exp":
        return jnp.exp(logits)
    if kind == "sigmoid":
        return jax.nn.sigmoid(logits)
    if kind == "relu":
        return jax.nn.relu(logits)
    if kind == "softplus":
        return jax.nn.softplus(logits)
    raise ValueError(f"unknown att_activation {kind!r}")


def cla_activation(logits: jax.Array, kind: str) -> jax.Array:
    if kind == "sigmoid":
        return jax.nn.sigmoid(logits)
    if kind == "linear":
        return logits
    raise ValueError(f"unknown cla_activation {kind!r}")


def attention_pool(
    gate_logits: jax.Array,
    cla_logits: jax.Array,
    att_activation: str = "exp",
    cla_act: str = "sigmoid",
    time_axis: int = -2,
) -> jax.Array:
    """Pool [..., T, C] gate/classifier logits into [..., C] clip scores.

    Numerically stable for the exp gate (per-clip max subtraction — the
    normalization ratio is shift-invariant, so this is exact).
    """
    if att_activation == "exp":
        m = jax.lax.stop_gradient(jnp.max(gate_logits, axis=time_axis, keepdims=True))
        att = jnp.exp(gate_logits - m)
    else:
        att = gate_activation(gate_logits, att_activation)
    f = cla_activation(cla_logits, cla_act)
    num = jnp.sum(att * f, axis=time_axis)
    den = jnp.sum(att, axis=time_axis)
    return num / jnp.maximum(den, _EPS)


def attention_timeline(
    gate_logits: jax.Array,
    cla_logits: jax.Array,
    att_activation: str = "exp",
    cla_act: str = "sigmoid",
    time_axis: int = -2,
) -> Tuple[jax.Array, jax.Array]:
    """Per-segment readout of the pooled decision: the paper family's
    weakly-supervised localization (arXiv:1803.02353 §2 — the clip score
    is y_c = sum_t w_{t,c} f_{t,c}, so (w, f) localizes each class in
    time; reference C15 only prints clip scores, the timeline is the
    model's native event readout).

    Returns ``(weights, seg_probs)``, both [..., T, C]:
      - ``weights`` normalized over T per class (sums to 1 where any
        segment is valid); for the ``max`` gate they are the argmax
        indicator (split across ties), so sum_t w*f == max_t f.
      - ``seg_probs`` = cla_activation(cla_logits), the per-segment
        classifier.
    Exactly consistent with :func:`attention_pool`:
    ``sum_t weights * seg_probs == attention_pool(...)``.
    """
    f = cla_activation(cla_logits, cla_act)
    if att_activation == "max":
        # gate logits only mark validity here (-inf = masked), matching
        # update_stream_state's max mode
        valid = jnp.isfinite(gate_logits)
        fv = jnp.where(valid, f, -jnp.inf)
        m = jnp.max(fv, axis=time_axis, keepdims=True)
        att = ((fv >= m) & valid).astype(f.dtype)
    elif att_activation == "exp":
        m = jnp.max(gate_logits, axis=time_axis, keepdims=True)
        att = jnp.exp(gate_logits - jnp.where(jnp.isfinite(m), m, 0.0))
    else:
        att = gate_activation(gate_logits, att_activation)
    w = att / jnp.maximum(jnp.sum(att, axis=time_axis, keepdims=True), _EPS)
    return w, f


class StreamState(NamedTuple):
    """O(1) per-clip streaming state: running-max-renormalized accumulators.

    Invariant: with m = running max of gate logits seen so far,
      num = sum_t exp(a_t - m) * f_t ,  den = sum_t exp(a_t - m)
    (for non-exp gates m stays 0 and the accumulators are plain sums).
    """

    num: jax.Array  # [..., C]
    den: jax.Array  # [..., C]
    m: jax.Array  # [..., C] running gate-logit max (exp gate only)


def init_stream_state(shape: Tuple[int, ...], dtype=jnp.float32) -> StreamState:
    return StreamState(
        num=jnp.zeros(shape, dtype),
        den=jnp.zeros(shape, dtype),
        m=jnp.full(shape, -jnp.inf, dtype),
    )


def update_stream_state(
    state: StreamState,
    gate_logits: jax.Array,
    cla_logits: jax.Array,
    att_activation: str = "exp",
    cla_act: str = "sigmoid",
    time_axis: int = -2,
) -> StreamState:
    """Fold one chunk of [..., T_chunk, C] logits into the running state."""
    f = cla_activation(cla_logits, cla_act)
    if att_activation == "max":
        # running maximum (max_pool baseline): gate logits only mark
        # validity (-inf = masked, mirroring the exp-gate mask contract)
        valid = jnp.isfinite(gate_logits)
        chunk_max = jnp.max(jnp.where(valid, f, -jnp.inf), axis=time_axis)
        seen = jnp.any(valid, axis=time_axis).astype(state.den.dtype)
        return StreamState(
            num=jnp.maximum(state.num, jnp.where(jnp.isfinite(chunk_max),
                                                 chunk_max, state.num)),
            den=jnp.maximum(state.den, seen),
            m=state.m,
        )
    if att_activation == "exp":
        chunk_m = jnp.max(gate_logits, axis=time_axis)
        new_m = jnp.maximum(state.m, chunk_m)
        # all-masked chunks (every gate logit -inf, e.g. a fully-padded time
        # shard) give new_m = -inf; subtract 0 there so exp(-inf - 0) = 0
        # instead of exp(-inf - -inf) = nan
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        att = jnp.exp(gate_logits - jnp.expand_dims(safe_m, time_axis))
        # rescale old accumulators into the new max's frame; exp(-inf-...) -> 0
        scale = jnp.where(jnp.isfinite(state.m), jnp.exp(state.m - safe_m), 0.0)
        return StreamState(
            num=state.num * scale + jnp.sum(att * f, axis=time_axis),
            den=state.den * scale + jnp.sum(att, axis=time_axis),
            m=new_m,
        )
    att = gate_activation(gate_logits, att_activation)
    return StreamState(
        num=state.num + jnp.sum(att * f, axis=time_axis),
        den=state.den + jnp.sum(att, axis=time_axis),
        m=state.m,
    )


def merge_stream_states(a: StreamState, b: StreamState, att_activation: str = "exp") -> StreamState:
    """Associatively merge two partial states (chunk-tree or cross-chip)."""
    if att_activation == "max":
        return StreamState(jnp.maximum(a.num, b.num),
                           jnp.maximum(a.den, b.den), a.m)
    if att_activation == "exp":
        new_m = jnp.maximum(a.m, b.m)
        sa = jnp.where(jnp.isfinite(a.m), jnp.exp(a.m - new_m), 0.0)
        sb = jnp.where(jnp.isfinite(b.m), jnp.exp(b.m - new_m), 0.0)
        return StreamState(a.num * sa + b.num * sb, a.den * sa + b.den * sb, new_m)
    return StreamState(a.num + b.num, a.den + b.den, a.m)


def psum_stream_state(state: StreamState, axis_name: str, att_activation: str = "exp") -> StreamState:
    """Combine time-sharded partial states across a mesh axis (T6's entire
    context-parallel story: one collective on O(C) state, rides ICI)."""
    if att_activation == "max":
        return StreamState(
            num=jax.lax.pmax(state.num, axis_name),
            den=jax.lax.pmax(state.den, axis_name),
            m=state.m,
        )
    if att_activation == "exp":
        global_m = jax.lax.pmax(state.m, axis_name)
        scale = jnp.where(jnp.isfinite(state.m), jnp.exp(state.m - global_m), 0.0)
        return StreamState(
            num=jax.lax.psum(state.num * scale, axis_name),
            den=jax.lax.psum(state.den * scale, axis_name),
            m=global_m,
        )
    return StreamState(
        num=jax.lax.psum(state.num, axis_name),
        den=jax.lax.psum(state.den, axis_name),
        m=state.m,
    )


def stream_finalize(state: StreamState) -> jax.Array:
    """Running state -> clip scores; exact match to whole-clip attention_pool."""
    return state.num / jnp.maximum(state.den, _EPS)
