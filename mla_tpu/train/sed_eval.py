"""End-to-end scoring of the SED surface (round-3 VERDICT missing item 3).

The framework ships a sound-event-detection output chain — the per-patch
localization timeline (``model.timeline``) thresholded into discrete
events (``serve.events.detect_events``) — but until this module nothing
measured its QUALITY. This harness closes the loop the standard way:

  1. synthesize a corpus with known event boundaries
     (``data.synthetic.synth_event_waveforms`` — weak clip labels for
     training, strong boundaries held out for scoring),
  2. run the batched timeline readout (ONE jitted program over the whole
     eval set, level-mean weights/probs — identical math to
     ``infer --timeline``),
  3. detect events per clip with the production post-processing chain
     (threshold / gap-merge / min-duration, scalar or calibrated
     per-class thresholds), and
  4. score segment-based F1 / error-rate in the DCASE convention
     (``utils.metrics.segment_event_metrics``).

The reference family never scores localization (its C15 prints clip
top-k only — SURVEY.md §2.1/§3.4); the timeline surface is framework
extension, so its measurement harness is too.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np


def batched_timeline(cfg, variables, wavs: np.ndarray,
                     batch_size: int = 32) -> tuple:
    """Level-mean localization readout for a batch of equal-length clips:
    ``wavs [N, samples] -> (weights [N, T, C], probs [N, T, C])`` via one
    jitted program (the whole-clip counterpart of the streaming ring; a
    per-clip loop would pay N dispatches and N host fetches)."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import frontend as fe

    model = build_model(cfg.model)

    @jax.jit
    def _tl(wav_batch):
        patches = fe.apply_frontend(wav_batch, cfg.frontend)
        levels = model.apply(variables, patches, method="timeline")
        w = jnp.mean(jnp.stack([wl for wl, _ in levels]), axis=0)
        f = jnp.mean(jnp.stack([fl for _, fl in levels]), axis=0)
        return w.astype(jnp.float32), f.astype(jnp.float32)

    n = len(wavs)
    ws, fs = [], []
    for s in range(0, n, batch_size):
        b = wavs[s: s + batch_size]
        keep = len(b)
        if keep < batch_size:  # keep ONE compiled shape; slice repeats off
            b = np.concatenate([b, np.repeat(b[-1:], batch_size - keep, 0)])
        w, f = _tl(jnp.asarray(b))
        ws.append(np.asarray(w)[:keep])
        fs.append(np.asarray(f)[:keep])
    return np.concatenate(ws), np.concatenate(fs)


def evaluate_sed(
    cfg,
    variables,
    n_clips: Optional[int] = None,
    seed: int = 20_000,
    threshold: Union[float, np.ndarray] = 0.5,
    merge_gap_s: float = 0.0,
    min_dur_s: float = 0.0,
    segment_s: Optional[float] = None,
    batch_size: Optional[int] = None,
    max_events: int = 3,
) -> Dict:
    """Measure event-detection quality end-to-end on the synthetic
    event-boundary corpus. Returns the DCASE segment-based metric dict
    (micro precision/recall/F1, error rate with its S/D/I decomposition,
    macro F1 — see ``utils.metrics.segment_event_metrics``) plus the
    run's operating-point settings.

    ``threshold`` is a scalar or a per-class [C] array (e.g. from
    ``utils.metrics.calibrate_thresholds`` / ``eval --calibrate``).
    ``segment_s`` defaults to the timeline's native patch hop (0.96 s)
    so the scoring grid aligns with what the model can possibly resolve;
    pass 1.0 for the DCASE-standard grid. ``seed`` is disjoint from the
    train (0) and eval (10_000) synthetic seeds so calibrating on the
    eval split and scoring events here stays honest.
    """
    from mla_tpu.data.synthetic import synth_event_waveforms
    from mla_tpu.ops.frontend import patch_hop_seconds

    n_clips = n_clips if n_clips is not None else cfg.data.n_eval_clips
    if n_clips <= 0:
        raise ValueError(f"evaluate_sed needs at least one clip "
                         f"(n_clips={n_clips})")
    c = cfg.model.n_classes
    sr = cfg.frontend.sample_rate
    hop_s = patch_hop_seconds(cfg.frontend)
    seg_s = segment_s if segment_s is not None else hop_s
    x, _, ref_events = synth_event_waveforms(
        n_clips, c, cfg.data.clip_seconds, sr, seed=seed,
        max_events=max_events)
    w, f = batched_timeline(cfg, variables, x,
                            batch_size or cfg.train.batch_size)
    return _score_operating_point(
        w, f, ref_events, c, cfg.data.clip_seconds, hop_s, seg_s,
        threshold, merge_gap_s, min_dur_s)


def _score_operating_point(w, f, ref_events, n_classes, clip_seconds,
                           hop_s, seg_s, threshold, merge_gap_s,
                           min_dur_s) -> Dict:
    """Score ONE post-processing operating point from precomputed
    timelines — host-only, so sweeps re-use a single device pass."""
    from mla_tpu.serve.events import detect_events
    from mla_tpu.utils.metrics import (events_to_segment_grid,
                                       segment_event_metrics)

    ref_grids, est_grids = [], []
    n_est = 0
    for i in range(len(ref_events)):
        est = detect_events(f[i], w[i], hop_s=hop_s, threshold=threshold,
                            merge_gap_s=merge_gap_s, min_dur_s=min_dur_s)
        n_est += len(est)
        ref_grids.append(events_to_segment_grid(
            ref_events[i], n_classes, clip_seconds, seg_s))
        est_grids.append(events_to_segment_grid(
            est, n_classes, clip_seconds, seg_s))
    out = segment_event_metrics(ref_grids, est_grids)
    out.update({
        "n_clips": int(len(ref_events)),
        "n_ref_events": int(sum(len(e) for e in ref_events)),
        "n_est_events": int(n_est),
        "segment_s": float(seg_s),
        "threshold": ("per-class" if np.ndim(threshold) else
                      float(threshold)),
        "merge_gap_s": float(merge_gap_s),
        "min_dur_s": float(min_dur_s),
    })
    return out


def sweep_sed_threshold(
    cfg,
    variables,
    thresholds: Optional[np.ndarray] = None,
    n_clips: Optional[int] = None,
    seed: int = 20_000,
    merge_gap_s: float = 0.0,
    min_dur_s: float = 0.0,
    segment_s: Optional[float] = None,
    batch_size: Optional[int] = None,
    max_events: int = 3,
) -> Dict:
    """Sweep the scalar event threshold against segment F1 and return the
    best operating point (``eval --events --sweep``).

    The clip-level calibrator (``calibrate_thresholds``) optimizes
    recall-at-precision on CLIP labels — documented in RESULTS.md as not
    segment-optimal for SED. This sweep measures what IS: one device pass
    computes the timelines, then every candidate threshold is scored on
    host (detect_events + DCASE segment grid are cheap numpy). The
    returned ``best`` maximizes micro segment F1; ties go to the lower
    threshold (higher recall at equal F1).
    """
    from mla_tpu.data.synthetic import synth_event_waveforms
    from mla_tpu.ops.frontend import patch_hop_seconds

    if thresholds is None:
        thresholds = np.round(np.arange(0.05, 0.96, 0.05), 2)
    n_clips = n_clips if n_clips is not None else cfg.data.n_eval_clips
    if n_clips <= 0:
        raise ValueError(f"sweep needs at least one clip (n_clips={n_clips})")
    c = cfg.model.n_classes
    hop_s = patch_hop_seconds(cfg.frontend)
    seg_s = segment_s if segment_s is not None else hop_s
    x, _, ref_events = synth_event_waveforms(
        n_clips, c, cfg.data.clip_seconds, cfg.frontend.sample_rate,
        seed=seed, max_events=max_events)
    w, f = batched_timeline(cfg, variables, x,
                            batch_size or cfg.train.batch_size)
    rows = []
    for t in thresholds:
        r = _score_operating_point(
            w, f, ref_events, c, cfg.data.clip_seconds, hop_s, seg_s,
            float(t), merge_gap_s, min_dur_s)
        rows.append({"threshold": float(t), "f1": r["f1"],
                     "error_rate": r["error_rate"],
                     "precision": r["precision"], "recall": r["recall"]})
    best = max(rows, key=lambda r: (r["f1"], -r["threshold"]))
    return {"sweep": rows, "best": dict(best),
            "n_clips": int(n_clips), "segment_s": float(seg_s),
            "merge_gap_s": float(merge_gap_s),
            "min_dur_s": float(min_dur_s)}
