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


class TimelineState(NamedTuple):
    """O(cap) per-stream localization ring (the streaming counterpart of
    :func:`attention_timeline`): the last ``cap`` patches' raw gate logits
    and per-segment class probs, per level, kept ON DEVICE and written
    inside the same jitted tick program as the StreamState fold — zero
    extra host traffic per tick; a client fetches the window only when it
    asks for a timeline. Static shapes throughout (XLA-friendly): a
    wrap-around cursor ring, masked scatter for partially-valid chunks.
    """

    g: jax.Array  # [S, cap, L, C] raw gate logits of the last cap patches
    f: jax.Array  # [S, cap, L, C] per-segment class probs (post-activation)
    cursor: jax.Array  # [S] int32 next ring slot to write
    count: jax.Array  # [S] int32 total valid patches ever folded


def init_timeline_state(n_streams: int, cap: int, n_levels: int,
                        n_classes: int, dtype=jnp.float32) -> TimelineState:
    return TimelineState(
        g=jnp.zeros((n_streams, cap, n_levels, n_classes), dtype),
        f=jnp.zeros((n_streams, cap, n_levels, n_classes), dtype),
        cursor=jnp.zeros(n_streams, jnp.int32),
        count=jnp.zeros(n_streams, jnp.int32),
    )


def update_timeline_state(
    tl: TimelineState,
    gate_stack: jax.Array,  # [S, P, L, C] raw gate logits for this chunk
    prob_stack: jax.Array,  # [S, P, L, C] per-segment class probs
    active: jax.Array,  # [S] bool
    n_valid: jax.Array,  # [S] int32 valid patches (<= P; a flush pads)
) -> TimelineState:
    """Fold one chunk's per-patch readout into the ring. Writes are masked
    per (stream, patch): inactive rows and padded flush patches keep the
    existing ring content (an unconditional write would clobber up to
    P - n_valid GOOD older entries once the ring has wrapped). Requires
    P <= cap so one chunk's slots are unique."""
    S, P = gate_stack.shape[:2]
    cap = tl.g.shape[1]
    s_idx = jnp.arange(S)[:, None]  # [S, 1]
    p_idx = jnp.arange(P)[None, :]  # [1, P]
    idx = (tl.cursor[:, None] + p_idx) % cap  # [S, P]
    valid = (active[:, None] & (p_idx < n_valid[:, None]))[..., None, None]
    g = tl.g.at[s_idx, idx].set(jnp.where(valid, gate_stack, tl.g[s_idx, idx]))
    f = tl.f.at[s_idx, idx].set(jnp.where(valid, prob_stack, tl.f[s_idx, idx]))
    adv = jnp.where(active, n_valid, 0).astype(jnp.int32)
    return TimelineState(
        g=g, f=f,
        cursor=(tl.cursor + adv) % cap,
        count=tl.count + adv,
    )


def window_timeline(gate_window, prob_window, num, den, m,
                    att_activation: str = "exp"):
    """Final per-patch attention weights for a RECORDED window of gate
    logits, normalized against the stream's final :class:`StreamState`
    (num, den, m rows) — host numpy math, the streaming counterpart of
    :func:`attention_timeline`. For the exp gate the weights are globally
    exact (w_t = exp(g_t - m_fin) / den_fin): when the ring has dropped
    old patches, the window's weights sum to the fraction of attention
    mass it covers (<= 1) — an honest readout. For the max gate, weights
    mark the window's copies of the global argmax (all-zero if the
    arg-maximizing patch fell off the ring), tie-split within the window.

    Returns ``(weights, prob_window)``, both [T_window, C] float32.
    """
    import numpy as np

    g = np.asarray(gate_window, np.float32)
    f = np.asarray(prob_window, np.float32)
    num = np.asarray(num, np.float32)
    den = np.asarray(den, np.float32)
    m = np.asarray(m, np.float32)
    if att_activation == "max":
        winners = (f >= num) & np.isfinite(g)
        w = winners / np.maximum(winners.sum(axis=0, keepdims=True), 1)
        return w.astype(np.float32), f
    if att_activation == "exp":
        safe_m = np.where(np.isfinite(m), m, 0.0)
        att = np.exp(g - safe_m[None, :])
    elif att_activation == "sigmoid":
        att = 1.0 / (1.0 + np.exp(-g))
    elif att_activation == "relu":
        att = np.maximum(g, 0.0)
    elif att_activation == "softplus":
        att = np.logaddexp(g, 0.0)
    else:
        raise ValueError(f"unknown att_activation {att_activation!r}")
    return (att / np.maximum(den[None, :], _EPS)).astype(np.float32), f


@jax.jit
def _pack_timeline(tl, states, sid, extra=None):
    """Device-side gather of everything a timeline readout needs into ONE
    f32 blob — an optional caller ``extra`` row (e.g. the stream's clip
    scores) first, then ring rows, per-level num/den/m, and the
    (cursor, count) int32 pair bitcast into the last two f32 lanes — so
    the host pays a single tunnel fetch (~27 ms here) instead of
    4 + 3*n_levels separate ones (or the 2 an earlier version paid for a
    separate int fetch)."""
    parts = [] if extra is None else [extra.astype(jnp.float32).ravel()]
    parts += [tl.g[sid].astype(jnp.float32).ravel(),
              tl.f[sid].astype(jnp.float32).ravel()]
    parts += [jnp.stack([st.num[sid], st.den[sid], st.m[sid]])
              .astype(jnp.float32).ravel()
              for st in states]
    ints = jnp.stack([tl.cursor[sid], tl.count[sid]]).astype(jnp.int32)
    parts.append(jax.lax.bitcast_convert_type(ints, jnp.float32))
    return jnp.concatenate(parts)


def read_timeline(states, tl, sid: int, att_activation: str, extra=None):
    """Decode one stream's localization ring against its final accumulator
    state: ``(start_patch, [(weights [T, C], probs [T, C]) per level])``,
    oldest patch first, weights via :func:`window_timeline` (globally
    exact for the exp gate). Shared by StreamingTagger, the batched
    server, both HTTP tiers, and the AOT StreamingArtifact so every
    surface reads the same math — and deliberately FLAX-FREE (this module
    imports only jax/numpy) so an exported-artifact edge can read
    timelines with just jax installed. ONE on-demand device fetch (a
    packed f32 blob ~1 MB at the flagship's cap=64, cursor/count bitcast
    into its tail) — the per-tick hot path never fetches.

    ``extra``: optional 1-D device array to ride the same fetch (the HTTP
    tiers pass the stream's clip scores — a second ~27 ms fetch saved);
    when given, returns ``(start_patch, levels, extra_values)``."""
    import numpy as np

    if tl is None:
        raise RuntimeError(
            "timeline disabled; construct with timeline_cap > 0")
    blob = np.asarray(_pack_timeline(tl, states, sid, extra))
    k = 0 if extra is None else int(extra.shape[-1])
    cur, cnt = (int(v) for v in blob[-2:].view(np.int32))
    cap, n_levels, c = tl.g.shape[1:]
    ring = cap * n_levels * c
    g = blob[k: k + ring].reshape(cap, n_levels, c)
    f = blob[k + ring: k + 2 * ring].reshape(cap, n_levels, c)
    st = blob[k + 2 * ring: -2].reshape(n_levels, 3, c)  # [L,(num,den,m),C]
    n = min(cnt, cap)
    idx = (cur - n + np.arange(n)) % cap  # oldest -> newest
    levels = []
    for li in range(n_levels):
        w, fw = window_timeline(
            g[idx, li], f[idx, li],
            st[li, 0], st[li, 1], st[li, 2], att_activation)
        levels.append((w, fw))
    if extra is None:
        return cnt - n, levels
    return cnt - n, levels, blob[:k].copy()


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
