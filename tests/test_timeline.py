"""Localization timeline (model.timeline / ops.attention_timeline): the
per-segment (attention weight, class prob) readout must be EXACTLY
consistent with the clip forward — for every level, sum_t w*f equals the
pooled vector, so the variant's finalize tail reproduces __call__.

The reference family visualizes this pair for weakly-supervised event
localization (arXiv:1803.02353 §2); the clip-only C15 script never exposed
it, so the contract here is internal consistency, not an external oracle.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import ModelConfig
from mla_tpu.models.zoo import AudioTagger


def _setup(variant, rng, **kw):
    base = dict(n_blocks=2, layers_per_block=1, hidden_units=32,
                compute_dtype="float32")
    base.update(kw)
    cfg = ModelConfig(variant=variant, trunk="none", n_classes=13, **base)
    cfg = dataclasses.replace(cfg)
    x = jnp.asarray(rng.standard_normal((3, 10, 128)).astype(np.float32))
    model = AudioTagger(cfg)
    params = model.init(jax.random.key(0), x)
    return cfg, model, params, x


def _pooled(tl):
    """Per-level sum_t w*f — what the finalize tails consume."""
    return [jnp.sum(w * f, axis=-2) for w, f in tl]


@pytest.mark.parametrize("variant", ["single_attention", "avg_pool", "max_pool"])
def test_timeline_reproduces_forward_single_level(variant, rng):
    cfg, model, params, x = _setup(variant, rng)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 1
    got = np.asarray(_pooled(tl)[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_timeline_reproduces_forward_multi_level(rng):
    cfg, model, params, x = _setup("multi_level_attention", rng, n_blocks=3)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 3
    got = np.asarray(model.apply(params, _pooled(tl),
                                 method="finalize_multi_level"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_timeline_reproduces_forward_multi_attention(rng):
    cfg, model, params, x = _setup("multi_attention", rng,
                                   n_attention_heads=3)
    want = np.asarray(model.apply(params, x))
    tl = model.apply(params, x, method="timeline")
    assert len(tl) == 3
    got = np.asarray(model.apply(params, _pooled(tl),
                                 method="finalize_multi_head"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("variant,expect_uniform", [
    ("single_attention", False), ("avg_pool", True)])
def test_timeline_weights_normalized(variant, expect_uniform, rng):
    _, model, params, x = _setup(variant, rng)
    w, f = model.apply(params, x, method="timeline")[0]
    w, f = np.asarray(w), np.asarray(f)
    np.testing.assert_allclose(w.sum(axis=-2), 1.0, rtol=1e-6)
    assert (w >= 0).all() and (f >= 0).all() and (f <= 1).all()
    if expect_uniform:  # avg_pool: zero gate -> every patch weighs 1/T
        np.testing.assert_allclose(w, 1.0 / x.shape[1], rtol=1e-6)


def test_timeline_max_mode_masks_invalid_segments(rng):
    """The max gate treats -inf gate logits as masked, mirroring
    update_stream_state: a masked segment never wins the argmax."""
    from mla_tpu.ops.attention_pool import attention_timeline

    cla = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    gate = jnp.zeros_like(cla).at[:, 3:].set(-jnp.inf)
    w, f = attention_timeline(gate, cla, "max", "sigmoid")
    w = np.asarray(w)
    assert (w[:, 3:] == 0).all()
    got = np.asarray((w * np.asarray(f)).sum(axis=-2))
    want = np.asarray(jax.nn.sigmoid(cla[:, :3]).max(axis=-2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_infer_timeline_cli(tmp_path, rng):
    """infer --timeline writes the per-patch CSV next to the top-k JSON."""
    import wave

    from mla_tpu.__main__ import main

    sr = 16000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    wav_path = tmp_path / "tone.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    out = tmp_path / "tl.csv"
    main(["infer", "--config=esc50_single_attention", "--wav", str(wav_path),
          "--checkpoint=random", "--top_k=3", "--timeline", str(out)])
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("patch,time_s,prob:")
    assert lines[0].count("prob:") == 3 and lines[0].count("att:") == 3
    assert len(lines) >= 2  # header + >=1 patch row
    first = lines[1].split(",")
    assert first[0] == "0" and float(first[1]) == 0.0


# ---------------------------------------------------------------------------
# Streaming timeline: the on-device TimelineState ring (serve component)
# must reproduce the one-shot readout whenever the ring covers the whole
# stream, and keep exactly the LAST cap patches (globally-normalized
# weights) once it wraps.
# ---------------------------------------------------------------------------


def test_update_timeline_state_ring_semantics(rng):
    """Pure ring unit: wraparound, per-patch valid masking, inactive rows."""
    from mla_tpu.ops.attention_pool import (init_timeline_state,
                                            update_timeline_state)

    S, cap, L, C, P = 2, 4, 1, 3, 3
    tl = init_timeline_state(S, cap, L, C)

    def chunk(v):
        g = np.full((S, P, L, C), v, np.float32)
        g += np.arange(P, dtype=np.float32)[None, :, None, None]
        return jnp.asarray(g)

    # tick 1: stream 0 active with 3 valid, stream 1 inactive
    tl = update_timeline_state(tl, chunk(10.0), chunk(100.0),
                               jnp.asarray([True, False]),
                               jnp.asarray([3, 3], np.int32))
    assert list(np.asarray(tl.count)) == [3, 0]
    assert list(np.asarray(tl.cursor)) == [3, 0]
    np.testing.assert_array_equal(np.asarray(tl.g)[1], 0.0)  # untouched
    np.testing.assert_allclose(np.asarray(tl.g)[0, :3, 0, 0], [10, 11, 12])

    # tick 2: stream 0 writes 2 valid of 3 (flush-style) -> wraps to slot 0;
    # the third (padded) patch must NOT clobber ring slot 1
    tl = update_timeline_state(tl, chunk(20.0), chunk(200.0),
                               jnp.asarray([True, True]),
                               jnp.asarray([2, 3], np.int32))
    g0 = np.asarray(tl.g)[0, :, 0, 0]
    # valid patches 20, 21 land in slots 3 and (wrap) 0 -> [21, 11, 12, 20]
    np.testing.assert_allclose(g0, [21, 11, 12, 20])
    assert list(np.asarray(tl.count)) == [5, 3]
    assert list(np.asarray(tl.cursor)) == [1, 3]


def _serve_setup(variant, rng, n_blocks=2, **kw):
    from mla_tpu.config import Config
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches

    cfg = Config(
        name="timeline_serve_test",
        model=ModelConfig(variant=variant, trunk="cnn", n_classes=9,
                          n_blocks=n_blocks, hidden_units=32,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32", **kw),
    )
    model = build_model(cfg.model)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)
    return cfg, model, variables


def _oneshot_timeline(cfg, model, variables, wav):
    from mla_tpu.ops.frontend import waveform_to_patches

    patches = waveform_to_patches(jnp.asarray(wav)[None], cfg.frontend)
    return [(np.asarray(w, np.float32)[0], np.asarray(f, np.float32)[0])
            for w, f in model.apply(variables, patches, method="timeline")]


@pytest.mark.parametrize("variant", ["multi_level_attention", "max_pool",
                                     "avg_pool"])
def test_server_timeline_matches_oneshot(variant, rng):
    """Ring covering the whole stream == the one-shot model.timeline."""
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables = _serve_setup(variant, rng)
    n_patches = 7
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, n_patches)) * 0.3).astype(np.float32)

    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=3, timeline_cap=16)
    sid = srv.open()
    for off in range(0, len(wav), 7000):  # odd block sizes
        srv.feed(sid, wav[off:off + 7000])
        srv.drain()
    srv.flush(sid)

    start, levels = srv.timeline(sid)
    assert start == 0
    want = _oneshot_timeline(cfg, model, variables, wav)
    assert len(levels) == len(want)
    for (w_s, f_s), (w_1, f_1) in zip(levels, want):
        assert w_s.shape == (n_patches, cfg.model.n_classes)
        np.testing.assert_allclose(w_s, w_1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f_s, f_1, rtol=1e-4, atol=1e-5)
    # the window readout reconstructs the clip scores for attention
    # variants via the finalize tail (sum_t w*f == pooled per level)
    pooled = [jnp.asarray((w * f).sum(axis=0))[None] for w, f in levels]
    if variant == "multi_level_attention":
        re = np.asarray(model.apply(variables, pooled,
                                    method="finalize_multi_level"))[0]
        np.testing.assert_allclose(re, srv.scores(sid), rtol=1e-4, atol=1e-5)


def test_timeline_with_scores_single_fetch_matches_separate(rng):
    """The one-fetch combined readout (scores ride the packed blob via
    read_timeline's ``extra`` lane) must equal the separate scores() +
    timeline() readouts exactly — it is the same device state, just one
    tunnel fetch instead of two."""
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables = _serve_setup("multi_level_attention", rng)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 6)) * 0.3).astype(np.float32)
    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=3, timeline_cap=8)
    sid = srv.open()
    srv.feed(sid, wav)
    srv.drain()
    srv.flush(sid)

    scores, start, levels = srv.timeline_with_scores_from(
        srv.variables, srv.states, srv.tl, sid)
    np.testing.assert_array_equal(scores, srv.scores(sid))
    want_start, want_levels = srv.timeline(sid)
    assert start == want_start
    for (w, f), (w1, f1) in zip(levels, want_levels):
        np.testing.assert_array_equal(w, w1)
        np.testing.assert_array_equal(f, f1)


def test_read_timeline_extra_lane_roundtrip(rng):
    """read_timeline(extra=...) returns the extra row bit-exactly and does
    not perturb the window decode (the extra rides the blob's head; the
    cursor/count int pair rides its tail as bitcast f32)."""
    import jax.numpy as jnp_

    from mla_tpu.ops.attention_pool import (StreamState, init_timeline_state,
                                            read_timeline,
                                            update_timeline_state)

    S, cap, L, C = 1, 4, 2, 3
    tl = init_timeline_state(S, cap, L, C)
    g = jnp_.asarray(rng.standard_normal((S, 2, L, C)).astype(np.float32))
    f = jax.nn.sigmoid(g)
    tl = update_timeline_state(tl, g, f, jnp_.ones(S, bool),
                               jnp_.full(S, 2, jnp_.int32))
    states = [StreamState(num=jnp_.ones((S, C)), den=jnp_.full((S, C), 2.0),
                          m=jnp_.zeros((S, C))) for _ in range(L)]
    extra = jnp_.asarray(np.float32([0.125, -3.5, 1e-7, 0.0, 42.0]))
    start, levels, got = read_timeline(states, tl, 0, "exp", extra=extra)
    np.testing.assert_array_equal(got, np.asarray(extra))
    start0, levels0 = read_timeline(states, tl, 0, "exp")
    assert start == start0
    for (w, fw), (w0, fw0) in zip(levels, levels0):
        np.testing.assert_array_equal(w, w0)
        np.testing.assert_array_equal(fw, fw0)


def test_server_timeline_ring_wraps_to_last_cap(rng):
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables = _serve_setup("single_attention", rng)
    n_patches, cap = 11, 4
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, n_patches)) * 0.3).astype(np.float32)

    srv = BatchedStreamingServer(cfg, variables, max_streams=1,
                                 chunk_patches=4, timeline_cap=cap)
    sid = srv.open()
    srv.feed(sid, wav)
    srv.drain()
    srv.flush(sid)

    start, levels = srv.timeline(sid)
    assert start == n_patches - cap
    w_1, f_1 = _oneshot_timeline(cfg, model, variables, wav)[0]
    w_s, f_s = levels[0]
    # globally-normalized weights: the window rows equal the one-shot
    # readout's LAST cap rows exactly (same m/den), and sum to < 1
    np.testing.assert_allclose(w_s, w_1[-cap:], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(f_s, f_1[-cap:], rtol=1e-4, atol=1e-5)
    assert (w_s.sum(axis=0) < 1.0 + 1e-5).all()


def test_server_timeline_slot_reset_on_reuse(rng):
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables = _serve_setup("single_attention", rng)
    srv = BatchedStreamingServer(cfg, variables, max_streams=1,
                                 chunk_patches=3, timeline_cap=8)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 6)) * 0.3).astype(np.float32)
    sid = srv.open()
    srv.feed(sid, wav)
    srv.drain()
    assert srv.timeline(sid)[1][0][0].shape[0] == 6
    srv.close(sid)

    sid2 = srv.open()
    assert sid2 == sid
    half = wav[: _samples_per_patches(cfg.frontend, 3)]
    srv.feed(sid2, half)
    srv.drain()
    start, levels = srv.timeline(sid2)
    assert start == 0 and levels[0][0].shape[0] == 3
    w_1, f_1 = _oneshot_timeline(cfg, model, variables, half)[0]
    np.testing.assert_allclose(levels[0][0], w_1, rtol=1e-4, atol=1e-5)


def test_server_timeline_disabled_raises(rng):
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables = _serve_setup("single_attention", rng)
    srv = BatchedStreamingServer(cfg, variables, max_streams=1,
                                 chunk_patches=3)
    sid = srv.open()
    srv.feed(sid, np.zeros(_samples_per_patches(cfg.frontend, 3), np.float32))
    srv.drain()
    with pytest.raises(RuntimeError, match="timeline disabled"):
        srv.timeline(sid)
    with pytest.raises(ValueError, match="timeline_cap"):
        BatchedStreamingServer(cfg, variables, max_streams=1,
                               chunk_patches=5, timeline_cap=3)


def test_tagger_timeline_matches_oneshot(rng):
    from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches

    cfg, model, variables = _serve_setup("multi_attention", rng,
                                         n_attention_heads=2)
    n_patches = 5
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, n_patches)) * 0.3).astype(np.float32)
    tagger = StreamingTagger(cfg, variables, chunk_patches=2, timeline_cap=8)
    for off in range(0, len(wav), 9000):
        tagger.feed(wav[off:off + 9000])
    tagger.flush()
    start, levels = tagger.timeline()
    assert start == 0 and len(levels) == 2
    want = _oneshot_timeline(cfg, model, variables, wav)
    for (w_s, f_s), (w_1, f_1) in zip(levels, want):
        np.testing.assert_allclose(w_s, w_1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f_s, f_1, rtol=1e-4, atol=1e-5)


def test_server_timeline_sharded_matches_unsharded(rng):
    """Mesh-sharded stream axis: the tl ring shards with the streams and
    reads back identical windows."""
    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    cfg, model, variables = _serve_setup("multi_level_attention", rng)
    wavs = [(rng.standard_normal(
        _samples_per_patches(cfg.frontend, 5)) * 0.3).astype(np.float32)
        for _ in range(4)]

    plain = BatchedStreamingServer(cfg, variables, max_streams=4,
                                   chunk_patches=3, timeline_cap=8)
    shard = BatchedStreamingServer(cfg, variables, max_streams=4,
                                   chunk_patches=3, timeline_cap=8,
                                   mesh=mesh)
    for srv in (plain, shard):
        sids = [srv.open() for _ in wavs]
        for sid, w in zip(sids, wavs):
            srv.feed(sid, w)
        srv.drain()
        for sid in sids:
            srv.flush(sid)
    for sid in range(4):
        s0, l0 = plain.timeline(sid)
        s1, l1 = shard.timeline(sid)
        assert s0 == s1
        for (w0, f0), (w1, f1) in zip(l0, l1):
            np.testing.assert_allclose(w1, w0, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# HTTP tiers: GET /v1/streams/<sid>/timeline on the stdlib and native fronts
# (both read through server.timeline_from, so one consistency check each).
# ---------------------------------------------------------------------------


def _http_timeline_roundtrip(base, cfg, model, variables, wav, rng):
    """Drive a stream via TagClient, fetch the timeline, and check it
    against the one-shot readout + the clip scores."""
    from mla_tpu.serve.client import TagClient

    c = TagClient(base)
    with c.stream(wire="float32") as s:
        s.feed(wav)
        s.flush()
        scores = dict(s.scores(top_k=3))
        tl = s.timeline(top_k=3)
    n_patches = len(tl["weights"])
    assert tl["start_patch"] == 0
    assert abs(tl["hop_s"] - 0.96) < 1e-6
    names = [n for n, _ in tl["classes"]]
    assert len(names) == 3 and set(names) == set(scores)
    # single_attention: clip score IS sum_t w*f per class (one level)
    w = np.asarray(tl["weights"], np.float32)
    f = np.asarray(tl["probs"], np.float32)
    for j, name in enumerate(names):
        got = float((w[:, j] * f[:, j]).sum())
        assert abs(got - scores[name]) < 1e-4, (name, got, scores[name])
    # and matches the one-shot readout column-for-column
    want_w, want_f = _oneshot_timeline(cfg, model, variables, wav)[0]
    from mla_tpu.data.labels import labels_for

    labels = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for j, name in enumerate(names):
        k = labels.index(name)
        np.testing.assert_allclose(w[:n_patches, j], want_w[:, k],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f[:n_patches, j], want_f[:, k],
                                   rtol=1e-4, atol=1e-5)


def _http_cfg_and_wav(rng):
    import dataclasses as _dc

    from mla_tpu.config import Config
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg = Config(
        name="timeline_http_test",
        model=ModelConfig(variant="single_attention", trunk="cnn",
                          n_classes=10, n_blocks=1, hidden_units=48,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
        data=_dc.replace(Config().data, dataset="synthetic_us8k"),
    )
    model = build_model(cfg.model)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 5)) * 0.3).astype(np.float32)
    probe = waveform_to_patches(jnp.asarray(wav[:32000])[None], cfg.frontend)
    variables = model.init(jax.random.key(0), probe)
    return cfg, model, variables, wav


def test_http_timeline_route(rng):
    import threading

    from mla_tpu.serve.http import create_server

    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=3, transfer_dtype="float32",
                        timeline_cap=8)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    try:
        _http_timeline_roundtrip(base, cfg, model, variables, wav, rng)
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_timeline_disabled_409(rng):
    import threading

    from mla_tpu.serve.client import TagClient, TagServiceError
    from mla_tpu.serve.http import create_server

    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=3, transfer_dtype="float32")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    try:
        c = TagClient(base)
        with c.stream(wire="float32") as s:
            s.feed(wav)
            s.flush()
            with pytest.raises(TagServiceError, match="timeline disabled") as e:
                s.timeline()
            assert e.value.status == 409
    finally:
        srv.shutdown()
        srv.server_close()


def test_native_front_timeline_route(rng):
    from mla_tpu.serve import native_front

    if not native_front.available():
        pytest.skip("native serving front unavailable")
    cfg, model, variables, wav = _http_cfg_and_wav(rng)
    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=2, chunk_patches=3,
        transfer_dtype="float32", timeline_cap=8)
    base = "http://%s:%d" % srv.server_address
    try:
        _http_timeline_roundtrip(base, cfg, model, variables, wav, rng)
    finally:
        srv.server_close()


def test_tag_timeline_cli(tmp_path, rng):
    """tag --timeline drives the stream API and writes the window CSV."""
    import threading
    import wave

    from mla_tpu.__main__ import main
    from mla_tpu.serve.http import create_server

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
    out = tmp_path / "tl.csv"
    try:
        main(["tag", "--url", base, "--wav", str(wav_path), "--top_k=2",
              "--wire=float32", "--timeline", str(out)])
    finally:
        srv.shutdown()
        srv.server_close()
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("patch,time_s,prob:")
    assert lines[0].count("att:") == 2
    assert len(lines) >= 4  # header + >= 3 patches of a 5-patch clip


def test_infer_stream_timeline_uses_ring(tmp_path, rng):
    """infer --stream --timeline reads the tagger's on-device ring (O(1)
    memory for long-form audio): a small --timeline_cap yields only the
    LAST cap patches, with absolute patch indices in the CSV."""
    import wave

    from mla_tpu.__main__ import main

    sr = 16000
    x = (0.3 * rng.standard_normal(sr * 8)).astype(np.float32)  # ~8 patches
    wav_path = tmp_path / "long.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    out = tmp_path / "tl.csv"
    main(["infer", "--config=esc50_single_attention", "--wav", str(wav_path),
          "--checkpoint=random", "--stream", "--top_k=2",
          "--timeline", str(out), "--timeline_cap=10",
          "--set", "model.compute_dtype=float32"])
    lines = out.read_text().strip().splitlines()
    n_rows = len(lines) - 1
    assert n_rows > 4  # whole 8 s clip fits cap=10 (chunk_patches=10)
    assert lines[1].split(",")[0] == "0"

    # cap smaller than the clip: only the last cap rows, absolute indices
    out2 = tmp_path / "tl2.csv"
    main(["infer", "--config=esc50_single_attention", "--wav", str(wav_path),
          "--checkpoint=random", "--stream", "--top_k=2",
          "--timeline", str(out2), "--timeline_cap=10",
          "--set", "model.compute_dtype=float32",
          "--events", str(tmp_path / "ev.json"), "--event_threshold=0.0"])
    import json as _json

    evs = _json.loads((tmp_path / "ev.json").read_text())["events"]
    assert len(evs) == 2  # threshold 0: one full-window event per class
    # event timestamps live on the absolute patch grid of the window
    rows2 = out2.read_text().strip().splitlines()[1:]
    first_t = float(rows2[0].split(",")[1])
    assert all(abs(e["t_start"] - first_t) < 1e-6 for e in evs)


def test_infer_wav_dir_composes_with_events_and_timeline(tmp_path, rng,
                                                         capsys):
    """VERDICT r3 item 4: batch event extraction over a corpus. Each
    JSONL line gains "events", --events writes one combined artifact,
    and --timeline DIR mirrors the corpus layout with per-clip CSVs."""
    import json as _json
    import wave

    from mla_tpu.__main__ import main

    sr = 16000
    for name, secs in [("a.wav", 2.0), ("sub/b.wav", 3.0)]:
        p = tmp_path / "clips" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        x = (0.3 * rng.standard_normal(int(sr * secs))).astype(np.float32)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((x * 32767).astype("<i2").tobytes())
    ev_path = tmp_path / "ev.json"
    tl_dir = tmp_path / "timelines"
    main(["infer", "--config=esc50_single_attention",
          "--wav_dir", str(tmp_path / "clips"), "--checkpoint=random",
          "--top_k=2", "--event_threshold=0.0",
          "--events", str(ev_path), "--timeline", str(tl_dir)])
    lines = [_json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    for ln in lines:
        # threshold 0: one full-window event per top-k class
        assert len(ln["events"]) == 2
        assert all("t_start" in e and "label" in e for e in ln["events"])
    combined = _json.loads(ev_path.read_text())
    assert set(combined["clips"]) == {"a.wav", os.path.join("sub", "b.wav")}
    assert combined["clips"]["a.wav"] == lines[0]["events"]
    assert combined["threshold"] == 0.0
    # per-clip CSVs mirror the corpus layout
    assert (tl_dir / "a.timeline.csv").exists()
    assert (tl_dir / "sub" / "b.timeline.csv").exists()
    header = (tl_dir / "a.timeline.csv").read_text().splitlines()[0]
    assert header.startswith("patch,time_s,prob:")

    # events-only mode with "-" skips the combined artifact
    main(["infer", "--config=esc50_single_attention",
          "--wav_dir", str(tmp_path / "clips"), "--checkpoint=random",
          "--top_k=1", "--event_threshold=0.0", "--events", "-"])
    lines2 = [_json.loads(ln) for ln in
              capsys.readouterr().out.strip().splitlines()]
    assert all(len(ln["events"]) == 1 for ln in lines2)


def test_timeline_consistent_under_concurrent_feeds(rng):
    """Regression for the torn-snapshot race: timeline readers must pair
    states and tl from the SAME tick (snapshot under the device lock).
    A reader pairing a pre-tick state with a post-tick ring would emit
    exp-gate weights > 1 (ring gate logit above the stale running max).
    Hammers timeline() on one stream while another stream feeds."""
    import threading as _th

    from mla_tpu.serve.server import BatchedStreamingServer
    from mla_tpu.serve.streaming import _samples_per_patches
    from mla_tpu.serve.ticker import TickLoop

    cfg, model, variables = _serve_setup("single_attention", rng)
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=2, chunk_patches=2, timeline_cap=4))
    try:
        a, b = loop.open(), loop.open()
        chunk = _samples_per_patches(cfg.frontend, 2)
        loop.feed(a, (rng.standard_normal(chunk) * 0.3).astype(np.float32))

        stop = _th.Event()
        errs = []

        def feeder():
            while not stop.is_set():
                loop.feed(b, (rng.standard_normal(chunk) * 0.5
                              ).astype(np.float32), sync=False)

        t = _th.Thread(target=feeder, daemon=True)
        t.start()
        try:
            for _ in range(40):
                _, levels = loop.timeline(a)
                w, f = levels[0]
                if not ((w >= 0).all() and (w <= 1.0 + 1e-5).all()
                        and np.isfinite(w).all()):
                    errs.append(w.copy())
        finally:
            stop.set()
            t.join(timeout=10)
        assert not errs, f"inconsistent weights observed: {errs[0]}"
    finally:
        loop.stop()
