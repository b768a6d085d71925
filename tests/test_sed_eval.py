"""SED surface scoring (round-3 VERDICT item 2): DCASE segment-based
metrics (utils/metrics.py), the event-boundary synthetic corpus
(data/synthetic.py), and the end-to-end harness (train/sed_eval.py +
eval --events)."""

import json

import numpy as np
import pytest

from mla_tpu.utils.metrics import (events_to_segment_grid,
                                   segment_event_metrics)


# ---------- events_to_segment_grid ----------

def test_grid_basic_overlap_and_clipping():
    evs = [(0, 0.5, 1.5), (2, 2.0, 3.0), (1, -1.0, 0.4), (1, 9.5, 99.0)]
    g = events_to_segment_grid(evs, n_classes=3, duration_s=10.0,
                               segment_s=1.0)
    assert g.shape == (10, 3)
    assert g[0, 0] and g[1, 0] and not g[2, 0]  # 0.5-1.5 spans segs 0,1
    assert g[2, 2] and not g[3, 2]  # [2,3) is exactly segment 2
    assert g[0, 1]  # clipped to [0, 0.4)
    assert g[9, 1] and g[:9, 1].sum() == 1  # clipped to [9.5, 10)


def test_grid_dict_events_and_zero_overlap():
    g = events_to_segment_grid(
        [{"class_idx": 1, "t_start": 1.0, "t_end": 2.0}],
        n_classes=2, duration_s=4.0, segment_s=1.0)
    assert g[1, 1] and g.sum() == 1  # boundary touch doesn't activate 0 or 2
    # zero-length after clipping -> nothing
    g2 = events_to_segment_grid([(0, 5.0, 7.0)], 1, duration_s=4.0)
    assert g2.sum() == 0
    with pytest.raises(ValueError, match="out of range"):
        events_to_segment_grid([(5, 0, 1)], n_classes=2, duration_s=4.0)


def test_grid_fractional_segments():
    # 2.5 s at 1 s segments -> 3 segments; event in the final partial one
    g = events_to_segment_grid([(0, 2.1, 2.5)], 1, duration_s=2.5)
    assert g.shape == (3, 1) and g[2, 0] and g.sum() == 1


# ---------- segment_event_metrics ----------

def test_metrics_perfect_and_empty():
    ref = np.zeros((5, 3), bool)
    ref[1:3, 0] = True
    ref[4, 2] = True
    m = segment_event_metrics(ref, ref.copy())
    assert m["f1"] == 1.0 and m["error_rate"] == 0.0
    assert m["n_ref"] == 3 and m["macro_f1"] == 1.0
    # empty estimate: everything deleted -> ER 1.0, recall 0
    m2 = segment_event_metrics(ref, np.zeros_like(ref))
    assert m2["error_rate"] == 1.0 and m2["recall"] == 0.0
    assert m2["deletions"] == 3 and m2["insertions"] == 0


def test_metrics_substitution_decomposition():
    """A wrong-class activation in an active segment is one substitution
    (S=min(FN,FP) per segment), not a deletion plus an insertion."""
    ref = np.zeros((2, 2), bool)
    est = np.zeros((2, 2), bool)
    ref[0, 0] = True   # seg 0: class 0 active
    est[0, 1] = True   # detected as class 1 -> substitution
    ref[1, 1] = True   # seg 1: miss -> deletion
    m = segment_event_metrics(ref, est)
    assert m["substitutions"] == 1
    assert m["deletions"] == 1
    assert m["insertions"] == 0
    assert m["error_rate"] == 1.0  # (1 + 1 + 0) / 2
    assert m["f1"] == 0.0


def test_metrics_multi_clip_pooling_and_validation():
    r1 = np.zeros((3, 2), bool)
    r1[0, 0] = True
    e1 = r1.copy()
    r2 = np.zeros((5, 2), bool)  # different clip length: fine
    r2[2, 1] = True
    e2 = np.zeros((5, 2), bool)
    e2[2, 1] = True
    e2[4, 0] = True  # one insertion
    m = segment_event_metrics([r1, r2], [e1, e2])
    assert m["n_ref"] == 2 and m["insertions"] == 1
    assert m["f1"] == pytest.approx(2 * 2 / (2 * 2 + 1))
    assert m["error_rate"] == pytest.approx(0.5)  # I=1 over N=2
    with pytest.raises(ValueError, match="class count"):
        segment_event_metrics([r1, np.zeros((3, 4), bool)],
                              [e1, np.zeros((3, 4), bool)])
    with pytest.raises(ValueError, match="shapes"):
        segment_event_metrics(r1, r2)


def test_metrics_macro_f1_ignores_inactive_classes():
    ref = np.zeros((4, 3), bool)
    ref[0, 0] = True
    est = ref.copy()
    est[1, 2] = True  # insertion on a class with NO reference activity
    m = segment_event_metrics(ref, est)
    # macro over classes with ref activity only (class 0) -> 1.0
    assert m["macro_f1"] == 1.0
    assert m["f1"] < 1.0  # micro still counts the insertion


# ---------- synth_event_waveforms ----------

def test_synth_event_corpus_boundaries_and_labels():
    from mla_tpu.data.synthetic import synth_event_waveforms

    x, y, events = synth_event_waveforms(
        8, 6, clip_seconds=8.0, sample_rate=16000, seed=3, max_events=3)
    assert x.shape == (8, 8 * 16000) and y.shape == (8, 6)
    for i, clip_events in enumerate(events):
        assert 1 <= len(clip_events) <= 3
        ks = [k for k, _, _ in clip_events]
        assert len(set(ks)) == len(ks)  # distinct classes per clip
        assert set(np.nonzero(y[i])[0]) == set(ks)
        for k, t0, t1 in clip_events:
            assert 0.0 <= t0 < t1 <= 8.0
            assert t1 - t0 >= 1.5  # min_event_s default

    # energy is localized: inside an event span the RMS beats the gaps
    k, t0, t1 = events[0][0]
    sr = 16000
    inside = x[0][int(t0 * sr) + 200: int(t1 * sr) - 200]
    mask = np.ones(x.shape[1], bool)
    for _, a, b in events[0]:
        mask[int(a * sr): int(b * sr)] = False
    outside = x[0][mask]
    assert inside.std() > 3 * max(outside.std(), 1e-6)


def test_synth_event_corpus_deterministic():
    from mla_tpu.data.synthetic import synth_event_waveforms

    a = synth_event_waveforms(3, 4, 4.0, seed=9)
    b = synth_event_waveforms(3, 4, 4.0, seed=9)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[2] == b[2]


# ---------- end-to-end ----------

def _tiny_trained_ws(tmp_path, capsys):
    from mla_tpu.__main__ import main

    ws = str(tmp_path / "ws")
    main(["train", "--config=esc50_single_attention", "--workspace", ws,
          "--set", "train.num_steps=30", "train.batch_size=8",
          "train.eval_every=30", "model.conv_channels=4,8",
          "model.convs_per_stage=1", "model.hidden_units=16",
          "data.n_train_clips=32", "data.n_eval_clips=16",
          "data.clip_seconds=4.0", "model.n_classes=6"])
    capsys.readouterr()
    return ws


def test_eval_events_cli_end_to_end(tmp_path, capsys):
    """eval --events scores the timeline -> detect_events chain on the
    event-boundary corpus and reports well-formed DCASE numbers; an
    oracle detector (reference events fed back) scores perfectly on the
    same grids, pinning the scoring convention."""
    from mla_tpu.__main__ import main

    ws = _tiny_trained_ws(tmp_path, capsys)
    main(["eval", "--config=esc50_single_attention", "--workspace", ws,
          "--events", "--sed_clips=8", "--event_threshold=0.3",
          "--set", "train.batch_size=8", "model.conv_channels=4,8",
          "model.convs_per_stage=1", "model.hidden_units=16",
          "data.n_train_clips=32", "data.n_eval_clips=16",
          "data.clip_seconds=4.0", "model.n_classes=6"])
    out = capsys.readouterr().out
    stats = json.loads(out)
    ev = stats["events"]
    assert ev["n_clips"] == 8 and ev["n_ref_events"] >= 8
    assert 0.0 <= ev["f1"] <= 1.0
    assert ev["error_rate"] >= 0.0
    assert ev["threshold"] == 0.3
    assert (ev["substitutions"] + ev["deletions"]
            <= ev["n_ref"])  # S+D can't exceed reference activity


def test_evaluate_sed_oracle_scores_perfectly():
    """Feeding the ground-truth boundaries through the same grids yields
    F1=1/ER=0 — the corpus and the scorer agree on the convention."""
    from mla_tpu.data.synthetic import synth_event_waveforms

    _, _, events = synth_event_waveforms(6, 5, 6.0, seed=1)
    grids = [events_to_segment_grid(e, 5, 6.0, 0.96) for e in events]
    m = segment_event_metrics(grids, grids)
    assert m["f1"] == 1.0 and m["error_rate"] == 0.0


def test_evaluate_sed_with_per_class_thresholds(tmp_path, capsys):
    from mla_tpu.train.loop import resume
    from mla_tpu.train.sed_eval import evaluate_sed
    from mla_tpu.train.state import eval_params, variables_from_state
    from mla_tpu.__main__ import _load_cfg

    ws = _tiny_trained_ws(tmp_path, capsys)

    class A:
        config = "esc50_single_attention"
        workspace = ws
        set = ["train.batch_size=8", "model.conv_channels=4,8",
               "model.convs_per_stage=1", "model.hidden_units=16",
               "data.n_train_clips=32", "data.n_eval_clips=16",
               "data.clip_seconds=4.0", "model.n_classes=6"]

    cfg = _load_cfg(A())
    state, _ = resume(cfg, ws)
    variables = variables_from_state(state, eval_params(cfg, state))
    thr = np.full(6, 0.4, np.float32)
    out = evaluate_sed(cfg, variables, n_clips=6, threshold=thr,
                       merge_gap_s=1.0, min_dur_s=1.0)
    assert out["threshold"] == "per-class"
    assert out["merge_gap_s"] == 1.0 and out["min_dur_s"] == 1.0
    assert out["n_clips"] == 6


def test_synthetic_events_dataset_splits():
    """The weakly-supervised training corpus: boundaries held out, splits
    deterministic and disjoint from the SED-eval seed."""
    import dataclasses

    from mla_tpu.config import Config
    from mla_tpu.data.synthetic import make_dataset, synth_event_waveforms

    dcfg = dataclasses.replace(Config().data, dataset="synthetic_events",
                               n_train_clips=6, n_eval_clips=4,
                               clip_seconds=4.0)
    tr = make_dataset(dcfg, 5, "train")
    ev = make_dataset(dcfg, 5, "eval")
    assert tr.x.shape == (6, 64000) and ev.x.shape == (4, 64000)
    assert tr.y.shape == (6, 5) and (tr.y.sum(1) >= 1).all()
    assert not np.array_equal(tr.x[0], ev.x[0])
    # the train split is the boundary generator's seed-0 corpus
    x0, y0, _ = synth_event_waveforms(6, 5, 4.0, seed=0)
    np.testing.assert_array_equal(tr.x, x0)
    with pytest.raises(ValueError, match="waveform"):
        make_dataset(dcfg, 5, "train", kind="features")


def test_metrics_and_eval_reject_empty_input():
    """r4 review: zero clips used to crash deep inside np.concatenate /
    cls_tp=None arithmetic — both entry points now fail with a clear
    message instead."""
    from mla_tpu.config import Config
    from mla_tpu.train.sed_eval import evaluate_sed
    from mla_tpu.utils.metrics import segment_event_metrics

    with pytest.raises(ValueError, match="no clips"):
        segment_event_metrics([], [])
    with pytest.raises(ValueError, match="at least one clip"):
        evaluate_sed(Config(), None, n_clips=0)


def test_sweep_sed_threshold_and_cli(tmp_path, capsys):
    """--sweep scores every candidate from ONE timeline pass; the best row
    maximizes F1 and reproduces a fresh evaluate_sed at that threshold
    (same seed -> same corpus -> identical numbers)."""
    from mla_tpu.__main__ import _load_cfg, main
    from mla_tpu.train.loop import resume
    from mla_tpu.train.sed_eval import evaluate_sed, sweep_sed_threshold
    from mla_tpu.train.state import eval_params, variables_from_state

    ws = _tiny_trained_ws(tmp_path, capsys)
    sets = ["train.batch_size=8", "model.conv_channels=4,8",
            "model.convs_per_stage=1", "model.hidden_units=16",
            "data.n_train_clips=32", "data.n_eval_clips=16",
            "data.clip_seconds=4.0", "model.n_classes=6"]

    class A:
        config = "esc50_single_attention"
        workspace = ws
        set = sets

    cfg = _load_cfg(A())
    state, _ = resume(cfg, ws)
    variables = variables_from_state(state, eval_params(cfg, state))
    grid = np.array([0.2, 0.5, 0.8])
    sw = sweep_sed_threshold(cfg, variables, thresholds=grid, n_clips=6)
    assert [r["threshold"] for r in sw["sweep"]] == [0.2, 0.5, 0.8]
    assert sw["best"]["f1"] == max(r["f1"] for r in sw["sweep"])
    fresh = evaluate_sed(cfg, variables, n_clips=6,
                         threshold=sw["best"]["threshold"])
    assert fresh["f1"] == pytest.approx(sw["best"]["f1"])
    assert fresh["error_rate"] == pytest.approx(sw["best"]["error_rate"])

    main(["eval", "--config=esc50_single_attention", "--workspace", ws,
          "--events", "--sed_clips=6", "--sweep", "0.2,0.5,0.8",
          "--set", *sets])
    stats = json.loads(capsys.readouterr().out)
    assert stats["events_sweep"]["best"]["threshold"] in (0.2, 0.5, 0.8)
    assert len(stats["events_sweep"]["sweep"]) == 3
