"""Streaming inference service (T11, BASELINE.json:11: "raw-waveform in ->
clip scores out, long-form audio chunked on-device"; reference analogue is
C15's one-shot ``inference`` — SURVEY.md §3.4).

Design: the host feeds raw waveform chunks; ONE jitted device program per
chunk runs front-end -> trunk -> per-level (gate, cla) logits -> fold into
the O(1) streaming attention state (ops.attention_pool); scores can be read
at any time by finalizing the state — mathematically identical to running
the whole clip at once (tested to ~1e-6). Memory is constant in audio
length: unbounded audio on a single chip.

Chunk boundary handling: STFT frames and 96-frame patches must not be cut —
the tagger carries (a) up to window-hop samples of waveform tail and (b) up
to 95 leftover log-mel frames... simplified here by choosing the chunk unit
= whole patches: each device call consumes exactly `chunk_patches` patches
worth of samples; the host-side ring buffer splits arbitrary incoming audio
into those exact units (plus a final zero-padded flush).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.config import Config
from mla_tpu.models.zoo import AudioTagger, build_model
from mla_tpu.ops import attention_pool as ap
from mla_tpu.ops import frontend as fe


def _samples_per_patches(cfg, n_patches: int) -> int:
    """Samples consumed by exactly n_patches non-overlapping patches,
    rounded up to whole hop blocks: the fused Pallas front-end frames by
    hop blocks and needs ceil(window/hop) blocks behind the last frame
    ((frames-1+g)*hop >= (frames-1)*hop + window), while the XLA path
    simply ignores the < hop extra samples — so one size serves both
    impls (found by `infer --stream` failing on a pallas config)."""
    frames = n_patches * cfg.example_hop_frames + (
        cfg.example_window_frames - cfg.example_hop_frames
    )
    g = -(-cfg.window_length // cfg.hop_length)
    return (frames - 1 + g) * cfg.hop_length


def _whole_patches(cfg, n_samples: int) -> int:
    """Number of COMPLETE patches in n_samples (reference C3 framing)."""
    if n_samples < cfg.window_length:
        return 0
    frames = 1 + (n_samples - cfg.window_length) // cfg.hop_length
    if frames < cfg.example_window_frames:
        return 0
    return 1 + (frames - cfg.example_window_frames) // cfg.example_hop_frames


STREAMING_VARIANTS = (
    "multi_level_attention",
    "single_attention",
    "multi_attention",
    "avg_pool",
    "max_pool",
)


def stream_activations(mcfg) -> tuple:
    """(att_activation, cla_activation) the STREAMING accumulators use for
    a variant. Attention variants stream with their configured activations.
    The pool baselines (round-2 VERDICT missing item 4) map onto the same
    state: avg_pool = exp gate over the head's all-zero gate logits
    (softmax of zeros is uniform -> the mean), max_pool = the degenerate
    "max" accumulator mode; both classify with the head's sigmoid."""
    if mcfg.variant == "avg_pool":
        return "exp", "sigmoid"
    if mcfg.variant == "max_pool":
        return "max", "sigmoid"
    return mcfg.att_activation, mcfg.cla_activation


def n_stream_levels(mcfg) -> int:
    """How many independent (gate, cla) accumulator pairs a variant streams:
    one per level for multi-level, one per head for multi-attention, one
    otherwise."""
    if mcfg.variant == "multi_level_attention":
        return mcfg.n_blocks
    if mcfg.variant == "multi_attention":
        return mcfg.n_attention_heads
    return 1


# read_timeline moved to ops.attention_pool (flax-free, so the AOT-export
# edge path can import it with just jax; ADVICE r3) — re-exported here for
# the serving tiers that historically import it from this module.
read_timeline = ap.read_timeline
_pack_timeline = ap._pack_timeline


def stream_finalize_scores(model, variables, variant: str, states) -> jnp.ndarray:
    """Pooled accumulator states -> clip scores (the variant's streaming tail).
    Shared by the single-stream tagger, the batched server, and the
    time-sharded path so all three finalize identically."""
    pooled = [ap.stream_finalize(st) for st in states]
    if variant == "multi_level_attention":
        return model.apply(variables, pooled, method="finalize_multi_level")
    if variant == "multi_attention":
        return model.apply(variables, pooled, method="finalize_multi_head")
    return pooled[0]


class StreamingTagger:
    """Long-form audio tagger with O(1) device state.

    >>> tagger = StreamingTagger(cfg, variables)
    >>> for block in waveform_blocks:     # arbitrary sizes
    ...     tagger.feed(block)
    >>> scores = tagger.scores()          # may be called mid-stream too
    """

    def __init__(self, cfg: Config, variables: Dict, chunk_patches: int = 10,
                 timeline_cap: int = 0):
        """``timeline_cap`` > 0 additionally records the last timeline_cap
        patches' (gate logits, segment probs) in an on-device ring inside
        the same jitted chunk program (ops.attention_pool.TimelineState);
        read it with :meth:`timeline`. 0 (default) disables."""
        if cfg.model.variant not in STREAMING_VARIANTS:
            raise ValueError(f"unknown streaming variant {cfg.model.variant!r}; pick from {STREAMING_VARIANTS}")
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.variables = variables
        self.chunk_patches = chunk_patches
        self.chunk_samples = _samples_per_patches(cfg.frontend, chunk_patches)
        self.timeline_cap = int(timeline_cap)
        if self.timeline_cap and self.timeline_cap < chunk_patches:
            raise ValueError(
                f"timeline_cap {timeline_cap} must be >= chunk_patches "
                f"{chunk_patches}")
        self._buf = np.zeros(0, np.float32)
        self._n_levels = n_stream_levels(cfg.model)
        self.reset()

        att_act, cla_act = stream_activations(cfg.model)
        self._acts = (att_act, cla_act)

        def fold_timeline(tl, levels, n_valid: int):
            """Append one chunk's per-patch readout to the device ring
            (no-op when disabled). Shapes mirror the batched server's
            update with S=1."""
            if tl is None:
                return None
            g_stack = jnp.stack([g for g, _ in levels], axis=2)
            f_stack = jnp.stack(
                [ap.cla_activation(c, cla_act) for _, c in levels], axis=2)
            return ap.update_timeline_state(
                tl, g_stack, f_stack,
                jnp.ones(1, bool), jnp.full(1, n_valid, jnp.int32))

        self._fold_timeline = fold_timeline

        def chunk_step(states, tl, wav):
            patches = fe.apply_frontend(wav, cfg.frontend)  # [1, P, 96, 64]
            levels = self.model.apply(self.variables, patches, method="segment_logits")
            new_states = [
                ap.update_stream_state(st, g, c, att_act, cla_act)
                for st, (g, c) in zip(states, levels)
            ]
            return new_states, fold_timeline(tl, levels, patches.shape[1])

        def finalize(states):
            return stream_finalize_scores(
                self.model, self.variables, cfg.model.variant, states
            )

        self._chunk_step = jax.jit(chunk_step)
        self._finalize = jax.jit(finalize)

    def reset(self):
        self._buf = np.zeros(0, np.float32)
        self.states: List[ap.StreamState] = [
            ap.init_stream_state((1, self.cfg.model.n_classes))
            for _ in range(self._n_levels)
        ]
        self.tl = (ap.init_timeline_state(1, self.timeline_cap,
                                          self._n_levels,
                                          self.cfg.model.n_classes)
                   if self.timeline_cap else None)
        self._fed_any = False

    def feed(self, waveform: np.ndarray):
        """Append raw 16 kHz mono samples; device work happens per full chunk."""
        self._buf = np.concatenate([self._buf, np.asarray(waveform, np.float32)])
        # consume non-overlapping patch units; keep the inter-patch overlap
        # tail (window - hop samples at frame level) by re-slicing from the
        # exact sample offset of the next unconsumed patch.
        unit = self.chunk_samples
        hop_samples = self.cfg.frontend.example_hop_frames * self.cfg.frontend.hop_length
        while len(self._buf) >= unit:
            chunk = self._buf[:unit][None]
            self.states, self.tl = self._chunk_step(
                self.states, self.tl, jnp.asarray(chunk))
            self._fed_any = True
            consumed = self.chunk_patches * hop_samples
            self._buf = self._buf[consumed:]

    def flush(self):
        """Process the remaining WHOLE patches; the sub-patch remainder is
        dropped, matching the reference front-end (C3: waveform_to_examples
        discards partial patches, so one-shot and streamed scores agree).
        Exception: a stream too short for even one patch is zero-padded to
        one so it still yields scores."""
        fcfg = self.cfg.frontend
        n_patches = _whole_patches(fcfg, len(self._buf))
        if n_patches < 1:
            if self._fed_any or len(self._buf) == 0:
                self._buf = np.zeros(0, np.float32)
                return
            n_patches = 1  # lone sub-patch stream: zero-pad to one patch
        size = _samples_per_patches(fcfg, n_patches)
        padded = np.zeros(size, np.float32)
        padded[: min(len(self._buf), size)] = self._buf[:size]
        levels = self.model.apply(
            self.variables,
            fe.apply_frontend(jnp.asarray(padded[None]), self.cfg.frontend),
            method="segment_logits",
        )
        self.states = [
            ap.update_stream_state(st, g, c, *self._acts)
            for st, (g, c) in zip(self.states, levels)
        ]
        self.tl = self._fold_timeline(self.tl, levels, n_patches)
        self._fed_any = True
        self._buf = np.zeros(0, np.float32)

    def scores(self) -> np.ndarray:
        """Current clip-level scores [n_classes]."""
        if not self._fed_any:
            raise RuntimeError("no audio fed yet")
        return np.asarray(self._finalize(self.states))[0]

    def top_k(self, k: int = 5, labels: Optional[List[str]] = None):
        s = self.scores()
        order = np.argsort(-s)[:k]
        return [(labels[i] if labels else int(i), float(s[i])) for i in order]

    def timeline(self):
        """Localization window over the last ``timeline_cap`` patches:
        ``(start_patch, [(weights [T, C], probs [T, C]) per level])`` —
        the streaming counterpart of ``AudioTagger.timeline`` (requires
        ``timeline_cap`` > 0; exactly the one-shot readout when the ring
        covers the whole stream, tested)."""
        if not self._fed_any:
            raise RuntimeError("no audio fed yet")
        return read_timeline(self.states, self.tl, 0, self._acts[0])


def tag_clip(cfg: Config, variables: Dict, waveform: np.ndarray) -> np.ndarray:
    """One-shot inference (reference C15): whole waveform -> clip scores."""
    model = build_model(cfg.model)
    patches = fe.apply_frontend(jnp.asarray(waveform, jnp.float32)[None], cfg.frontend)
    return np.asarray(model.apply(variables, patches))[0]
