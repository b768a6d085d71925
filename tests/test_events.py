"""Event detection over the localization timeline (serve/events.py):
threshold / gap-merge / min-duration post-processing with absolute
timestamps on the patch grid, plus the CLI and client-SDK surfaces."""

import json

import numpy as np
import pytest

from mla_tpu.serve.events import detect_events, events_from_timeline_payload


def _tracks():
    """One class with two separated bursts, one always-quiet class."""
    f = np.zeros((10, 2), np.float32)
    f[1:3, 0] = 0.9       # burst A: patches 1-2
    f[3, 0] = 0.2         # dip below threshold
    f[4:7, 0] = [0.6, 0.8, 0.55]  # burst B: patches 4-6
    f[:, 1] = 0.1
    w = np.full((10, 2), 0.1, np.float32)
    return f, w


def test_detect_events_thresholding_and_timestamps():
    f, w = _tracks()
    evs = detect_events(f, w, hop_s=0.96, threshold=0.5)
    assert [e["class_idx"] for e in evs] == [0, 0]
    a, b = evs
    assert a["t_start"] == pytest.approx(0.96) and a["t_end"] == pytest.approx(2.88)
    assert b["t_start"] == pytest.approx(4 * 0.96) and b["t_end"] == pytest.approx(7 * 0.96)
    assert a["score"] == pytest.approx(0.9) and b["score"] == pytest.approx(0.8)
    assert a["att_mass"] == pytest.approx(0.2) and b["att_mass"] == pytest.approx(0.3)


def test_detect_events_gap_merge_and_min_duration():
    f, w = _tracks()
    # the 1-patch dip (0.96 s) merges at merge_gap_s >= 0.96
    evs = detect_events(f, hop_s=0.96, threshold=0.5, merge_gap_s=0.96)
    assert len(evs) == 1
    assert evs[0]["t_start"] == pytest.approx(0.96)
    assert evs[0]["t_end"] == pytest.approx(7 * 0.96)
    # min duration drops the 2-patch burst but keeps the 3-patch one
    evs = detect_events(f, hop_s=0.96, threshold=0.5, min_dur_s=2.5)
    assert len(evs) == 1 and evs[0]["t_start"] == pytest.approx(4 * 0.96)


def test_detect_events_start_patch_offset_and_class_filter():
    f, _ = _tracks()
    evs = detect_events(f, hop_s=0.96, threshold=0.5, start_patch=100,
                        classes=[0], class_names=["dog", "rain"])
    assert all(e["label"] == "dog" for e in evs)
    assert evs[0]["t_start"] == pytest.approx(101 * 0.96)
    assert detect_events(f, hop_s=0.96, threshold=0.5, classes=[1]) == []


def test_detect_events_edge_runs_and_sorting():
    f = np.zeros((4, 2), np.float32)
    f[0, 1] = 0.9   # starts at patch 0
    f[3, 0] = 0.7   # ends at the last patch
    f[0, 0] = 0.6   # two classes active at t=0 -> sorted by -score
    evs = detect_events(f, hop_s=1.0, threshold=0.5)
    assert (evs[0]["class_idx"], evs[0]["t_start"]) == (1, 0.0)
    assert evs[1]["class_idx"] == 0 and evs[1]["t_start"] == 0.0
    assert evs[-1]["t_end"] == pytest.approx(4.0)


def test_events_from_timeline_payload():
    f, w = _tracks()
    payload = {
        "start_patch": 3, "hop_s": 0.96,
        "classes": [["dog", 0.8], ["rain", 0.1]],
        "weights": w.tolist(), "probs": f.tolist(),
    }
    evs = events_from_timeline_payload(payload, threshold=0.5)
    assert [e["label"] for e in evs] == ["dog", "dog"]
    assert evs[0]["t_start"] == pytest.approx((3 + 1) * 0.96)


def test_infer_events_cli(tmp_path, rng):
    import wave

    from mla_tpu.__main__ import main

    sr = 16000
    x = (0.3 * rng.standard_normal(sr * 3)).astype(np.float32)
    wav_path = tmp_path / "clip.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    out = tmp_path / "events.json"
    main(["infer", "--config=esc50_single_attention", "--wav", str(wav_path),
          "--checkpoint=random", "--top_k=3", "--events", str(out),
          "--event_threshold=0.0"])  # threshold 0: every patch active
    payload = json.loads(out.read_text())
    assert payload["hop_s"] == pytest.approx(0.96)
    evs = payload["events"]
    assert len(evs) == 3  # one full-span event per top-k class
    for e in evs:
        assert e["t_start"] == 0.0 and "label" in e and 0 <= e["score"] <= 1


def test_client_events_integration(rng):
    """TagStream.events(): timeline route -> client-side detection."""
    import threading

    from mla_tpu.serve.client import TagClient
    from mla_tpu.serve.http import create_server
    from tests.test_timeline import _http_cfg_and_wav

    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=3, transfer_dtype="float32",
                        timeline_cap=8)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    try:
        c = TagClient(base)
        with c.stream(wire="float32") as s:
            s.feed(wav)
            s.flush()
            tl = s.timeline(top_k=2)
            evs = s.events(top_k=2, threshold=0.0)
    finally:
        srv.shutdown()
        srv.server_close()
    # threshold 0 -> one event per column spanning the whole window
    assert len(evs) == 2
    n = len(tl["probs"])
    for e in evs:
        assert e["t_start"] == pytest.approx(tl["start_patch"] * tl["hop_s"])
        assert e["t_end"] == pytest.approx(
            (tl["start_patch"] + n) * tl["hop_s"])


def test_calibrate_thresholds_precision_target():
    """calibrate_thresholds: lowest cutoff still meeting the precision
    target (maximal recall); degenerate classes fall back to default."""
    from mla_tpu.utils.metrics import calibrate_thresholds

    # class 0: scores separate positives cleanly above 0.55
    s = np.array([[0.9], [0.8], [0.7], [0.6], [0.4], [0.3]], np.float64)
    t = np.array([[1], [1], [1], [1], [0], [0]], np.float64)
    thr = calibrate_thresholds(s, t, target_precision=1.0)
    assert 0.4 < thr[0] <= 0.6  # midway cut keeps all positives, no FPs
    picked = s[:, 0] >= thr[0]
    assert picked.sum() == 4 and (t[picked, 0] == 1).all()

    # interleaved: precision 1.0 only at the very top
    s2 = np.array([[0.9], [0.8], [0.7], [0.6]], np.float64)
    t2 = np.array([[1], [0], [1], [0]], np.float64)
    thr2 = calibrate_thresholds(s2, t2, target_precision=1.0)
    assert 0.8 < thr2[0] <= 0.9  # only the top score passes
    # at precision >= 0.5, the deepest cut (recall-max) includes row 3
    thr3 = calibrate_thresholds(s2, t2, target_precision=0.5)
    assert thr3[0] < 0.7

    # no positives -> default
    thr4 = calibrate_thresholds(s2, np.zeros_like(t2), 0.9, default=0.77)
    assert thr4[0] == np.float32(0.77)


def test_detect_events_per_class_thresholds():
    f, _ = _tracks()
    thr = np.array([0.85, 0.05], np.float32)  # class 0 strict, class 1 loose
    evs = detect_events(f, hop_s=1.0, threshold=thr)
    by_cls = {}
    for e in evs:
        by_cls.setdefault(e["class_idx"], []).append(e)
    assert len(by_cls[0]) == 1 and by_cls[0][0]["score"] == pytest.approx(0.9)
    assert len(by_cls[1]) == 1  # 0.1 track passes the 0.05 cutoff everywhere
    assert by_cls[1][0]["t_end"] - by_cls[1][0]["t_start"] == pytest.approx(10)
    with pytest.raises(ValueError, match="per-class"):
        detect_events(f, hop_s=1.0, threshold=np.zeros(3))


def test_eval_calibrate_and_infer_thresholds_cli(tmp_path, capsys, rng):
    """eval --calibrate writes the per-class JSON; infer --events
    --thresholds consumes it (end-to-end on a tiny trained workspace)."""
    import wave

    from mla_tpu.__main__ import main

    ws = str(tmp_path / "ws")
    main(["train", "--config=esc50_single_attention", "--workspace", ws,
          "--set", "train.num_steps=4", "train.batch_size=8",
          "train.eval_every=4", "model.conv_channels=4,8",
          "model.convs_per_stage=1", "model.hidden_units=16",
          "data.n_train_clips=16", "data.n_eval_clips=16"])
    capsys.readouterr()
    out = tmp_path / "thr.json"
    main(["eval", "--config=esc50_single_attention", "--workspace", ws,
          "--calibrate", str(out), "--target_precision=0.6",
          "--set", "train.batch_size=8", "model.conv_channels=4,8",
          "model.convs_per_stage=1", "model.hidden_units=16",
          "data.n_train_clips=16", "data.n_eval_clips=16"])
    capsys.readouterr()
    payload = json.loads(out.read_text())
    assert payload["target_precision"] == 0.6
    assert len(payload["thresholds"]) == 50

    sr = 16000
    x = (0.3 * rng.standard_normal(sr * 2)).astype(np.float32)
    wav_path = tmp_path / "clip.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    ev_path = tmp_path / "ev.json"
    main(["infer", "--config=esc50_single_attention", "--workspace", ws,
          "--wav", str(wav_path), "--events", str(ev_path),
          "--thresholds", str(out),
          "--set", "train.batch_size=8", "model.conv_channels=4,8",
          "model.convs_per_stage=1", "model.hidden_units=16",
          "data.n_train_clips=16", "data.n_eval_clips=16"])
    evj = json.loads(ev_path.read_text())
    assert "per-class" in evj["threshold"]
    assert isinstance(evj["events"], list)


def test_calibrate_thresholds_tied_scores_respect_precision():
    """Ties at the cut boundary: >= admits a tied group WHOLE, so only
    group-end cuts are realizable operating points. Regression: the
    midway threshold used to collapse onto the tied value and admit a
    false positive, violating the precision target it promised."""
    from mla_tpu.utils.metrics import calibrate_thresholds

    # a tied (1.0, 1.0) pair with one positive: NO threshold can realize
    # precision 1.0 (>= admits both) -> must fall back to default, not
    # return 1.0 (which would claim the target while achieving 0.5)
    s = np.array([[1.0], [1.0], [0.3]], np.float64)
    t = np.array([[1.0], [0.0], [0.0]], np.float64)
    thr = calibrate_thresholds(s, t, target_precision=1.0, default=0.123)
    assert thr[0] == np.float32(0.123)
    # at a reachable target (0.5) the tied group-end IS the cut
    thr_h = calibrate_thresholds(s, t, target_precision=0.5)
    picked = s[:, 0] >= thr_h[0]
    assert picked.sum() == 2
    assert t[picked, 0].sum() / picked.sum() >= 0.5

    # adjacent-f32 scores: the midpoint cannot split them; the threshold
    # must land on lo (admitting the group end), never below `below`
    lo = np.float32(0.7)
    below = np.nextafter(lo, np.float32(0)).astype(np.float64)
    s2 = np.array([[float(lo)], [float(below)]], np.float64)
    t2 = np.array([[1.0], [0.0]], np.float64)
    thr2 = calibrate_thresholds(s2, t2, target_precision=1.0)
    assert thr2[0] == lo
    assert (s2[:, 0] >= thr2[0]).sum() == 1


def test_tag_events_cli(tmp_path, rng):
    """tag --events: stream API + client-side detection -> JSON file."""
    import threading
    import wave

    from mla_tpu.__main__ import main
    from mla_tpu.serve.http import create_server
    from tests.test_timeline import _http_cfg_and_wav

    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=3, transfer_dtype="float32",
                        timeline_cap=8)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    wav_path = tmp_path / "clip.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(cfg.frontend.sample_rate)
        w.writeframes((wav * 32767).astype("<i2").tobytes())
    out = tmp_path / "ev.json"
    try:
        main(["tag", "--url", base, "--wav", str(wav_path), "--top_k=2",
              "--wire=float32", "--events", str(out),
              "--event_threshold=0.0"])
    finally:
        srv.shutdown()
        srv.server_close()
    payload = json.loads(out.read_text())
    assert len(payload["events"]) == 2  # threshold 0: one per top-k column
    assert all("label" in e for e in payload["events"])
    assert payload["threshold"] == 0.0  # scalar run records the scalar


def test_tag_events_cli_records_threshold_table(tmp_path, rng):
    """ADVICE r3: with a per-class --thresholds table, tag --events must
    record the table as its operating point (like infer's _write_events),
    not the unused scalar --event_threshold."""
    import threading
    import wave

    from mla_tpu.__main__ import main
    from mla_tpu.data.labels import labels_for
    from mla_tpu.serve.http import create_server
    from tests.test_timeline import _http_cfg_and_wav

    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=3, transfer_dtype="float32",
                        timeline_cap=8)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    wav_path = tmp_path / "clip.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(cfg.frontend.sample_rate)
        w.writeframes((wav * 32767).astype("<i2").tobytes())
    labels = labels_for(cfg.data.dataset, cfg.model.n_classes)
    thr_path = tmp_path / "thr.json"
    thr_path.write_text(json.dumps(
        {"thresholds": {name: 0.0 for name in labels}}))
    out = tmp_path / "ev.json"
    try:
        main(["tag", "--url", base, "--wav", str(wav_path), "--top_k=2",
              "--wire=float32", "--events", str(out),
              "--thresholds", str(thr_path)])
    finally:
        srv.shutdown()
        srv.server_close()
    payload = json.loads(out.read_text())
    assert payload["threshold"] == f"per-class ({thr_path})"
    assert len(payload["events"]) == 2


def test_events_from_payload_threshold_table():
    f, w = _tracks()
    payload = {
        "start_patch": 0, "hop_s": 1.0,
        "classes": [["dog", 0.8], ["rain", 0.1]],
        "weights": w.tolist(), "probs": f.tolist(),
    }
    evs = events_from_timeline_payload(
        payload, threshold={"dog": 0.85, "rain": 0.05, "extra": 0.9})
    got = {(e["label"], round(e["t_start"], 2)) for e in evs}
    assert ("dog", 1.0) in got and ("rain", 0.0) in got
    with pytest.raises(ValueError, match="lacks"):
        events_from_timeline_payload(payload, threshold={"dog": 0.5})
