"""HTTP streaming service (serve/http.py): full stream lifecycle over a
real socket, wav and raw-PCM bodies, parity with the in-process tagger."""

import dataclasses
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, ModelConfig
from mla_tpu.data.labels import labels_for
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve.http import create_server
from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches


def _req(base, method, path, body=None, ctype="application/octet-stream"):
    req = urllib.request.Request(base + path, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read().decode())


@pytest.fixture(scope="module")
def served():
    cfg = Config(
        name="http_test",
        model=ModelConfig(variant="single_attention", trunk="cnn", n_classes=10,
                          n_blocks=1, hidden_units=48, conv_channels=(8, 16),
                          convs_per_stage=1, compute_dtype="float32"),
        data=dataclasses.replace(Config().data, dataset="synthetic_us8k"),
    )
    model = build_model(cfg.model)
    wav = (np.random.default_rng(5).standard_normal(16000 * 12) * 0.1).astype(np.float32)
    patches = waveform_to_patches(jnp.asarray(wav[:32000])[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    # float32 transfer for exact parity with the in-process tagger; the
    # int16 production default is covered in test_server.py
    srv = create_server(cfg, variables, port=0, max_streams=3, chunk_patches=3,
                        transfer_dtype="float32")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield cfg, variables, wav, f"http://{host}:{port}"
    srv.shutdown()


def test_healthz(served):
    _, _, _, base = served
    h = _req(base, "GET", "/v1/healthz")
    assert h["ok"] is True and h["max_streams"] == 3


def test_stream_lifecycle_and_parity(served):
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 6)  # 2 chunks of 3 patches
    audio = wav[:n]

    sid = _req(base, "POST", "/v1/streams")["sid"]
    # feed raw f32 PCM in two odd-sized blocks
    cut = 50_000
    r1 = _req(base, "POST", f"/v1/streams/{sid}/audio", audio[:cut].tobytes())
    r2 = _req(base, "POST", f"/v1/streams/{sid}/audio", audio[cut:].tobytes())
    assert r1["fed_samples"] == cut and r2["advanced"] >= 1
    scores = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=3")
    assert len(scores["top_k"]) == 3

    # parity with the in-process tagger on the same audio
    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio)
    want = single.top_k(3)
    got = [(name, p) for name, p in scores["top_k"]]
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    assert [g[0] for g in got] == [names[i] for i, _ in want]
    np.testing.assert_allclose([g[1] for g in got], [p for _, p in want],
                               rtol=1e-4, atol=1e-5)
    assert _req(base, "DELETE", f"/v1/streams/{sid}")["closed"] is True


def test_wav_body_and_flush(served, tmp_path):
    cfg, _, wav, base = served
    from mla_tpu.data import audio_io

    p = tmp_path / "clip.wav"
    audio_io.write_wav(str(p), wav[: 16000 * 2], 16000)
    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", p.read_bytes(), "audio/wav")
    assert r["fed_samples"] == 16000 * 2
    assert _req(base, "POST", f"/v1/streams/{sid}/flush")["flushed"] is True
    scores = _req(base, "GET", f"/v1/streams/{sid}/scores")
    assert np.isfinite([p for _, p in scores["top_k"]]).all()
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_concurrent_clients(served):
    """Two client threads on separate streams interleave feeds through the
    ThreadingHTTPServer; the device-server lock must keep results identical
    to a serial run."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3)
    audios = [wav[:n], (wav[:n] * 0.5).astype(np.float32)]
    sids = [_req(base, "POST", "/v1/streams")["sid"] for _ in audios]
    errs = []

    def client(sid, audio):
        try:
            for s in range(0, len(audio), 9999):
                _req(base, "POST", f"/v1/streams/{sid}/audio",
                     audio[s : s + 9999].tobytes())
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ts = [threading.Thread(target=client, args=(sid, a))
          for sid, a in zip(sids, audios)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for sid, audio in zip(sids, audios):
        got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=10")
        single = StreamingTagger(cfg, variables, chunk_patches=3)
        single.feed(audio)
        want = dict(single.top_k(10))
        names = labels_for(cfg.data.dataset, cfg.model.n_classes)
        for name, p in got["top_k"]:
            np.testing.assert_allclose(p, want[names.index(name)], rtol=1e-4, atol=1e-5)
        _req(base, "DELETE", f"/v1/streams/{sid}")


def test_pcm16_body_and_querystring_routes(served):
    """audio/L16 bodies decode as int16 PCM (round-2 review finding: they
    used to be reinterpreted as float32 garbage), and POST/DELETE routes
    tolerate query strings like GET does."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3)
    audio = wav[:n]
    pcm16 = np.asarray(np.clip(audio, -1, 1) * 32767.0, "<i2")
    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio?src=mic", pcm16.tobytes(),
             "audio/L16; rate=16000")
    assert r["fed_samples"] == len(audio) and r["advanced"] == 1
    got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]
    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(pcm16.astype(np.float32) / 32768.0)
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, p in got:
        np.testing.assert_allclose(p, want[names.index(name)], rtol=1e-4, atol=1e-5)
    assert _req(base, "POST", f"/v1/streams/{sid}/flush?now=1")["flushed"] in (True, False)
    assert _req(base, "DELETE", f"/v1/streams/{sid}?reason=done")["closed"] is True


def test_mulaw_body_decodes(served):
    """audio/basic bodies are 8-bit mu-law: the wire format reaches the
    server as uint8 codes and scores track a float32 feed of the same
    audio within codec tolerance."""
    from mla_tpu.data.audio_io import mulaw_encode

    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3)
    audio = wav[:n]
    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio",
             mulaw_encode(audio).tobytes(), "audio/basic")
    assert r["fed_samples"] == len(audio) and r["advanced"] == 1
    got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]
    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio)
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, p in got:
        np.testing.assert_allclose(p, want[names.index(name)], atol=5e-2)
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_adpcm4_partial_block_x_samples(served):
    """An adpcm4 body whose final block is partial declares its true
    sample count via X-Samples, so the host decode slices off the edge
    padding instead of injecting up to 63 repeated samples mid-stream
    (advisor finding, round 2). Scores must match feeding the exact-n
    decoded waveform."""
    from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm4_decode, adpcm4_encode

    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3) + 17  # NOT a block multiple
    assert n % SERVE_BLOCK != 0
    audio = wav[:n]
    pad = (-n) % SERVE_BLOCK
    padded = np.concatenate([audio, np.repeat(audio[-1], pad)]).astype(np.float32)
    from mla_tpu.data.audio_io import pcm16_quantize

    wire = adpcm4_encode(pcm16_quantize(padded)[None], block=SERVE_BLOCK)[0]

    sid = _req(base, "POST", "/v1/streams")["sid"]
    req = urllib.request.Request(base + f"/v1/streams/{sid}/audio",
                                 data=wire.tobytes(), method="POST")
    req.add_header("Content-Type", "audio/adpcm4")
    req.add_header("X-Samples", str(n))
    with urllib.request.urlopen(req, timeout=30) as r:
        resp = json.loads(r.read().decode())
    assert resp["fed_samples"] == n  # header-trimmed, not block-rounded
    got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]

    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(adpcm4_decode(wire, n=n, block=SERVE_BLOCK))
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, p in got:
        np.testing.assert_allclose(p, want[names.index(name)], rtol=1e-4, atol=1e-5)
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_body_size_cap(served):
    """Oversized audio bodies get 413 (unbounded Content-Length reads would
    let one request OOM the serving host); the cap is per-request — long
    audio streams fine in chunks."""
    _, _, _, base = served
    sid = _req(base, "POST", "/v1/streams")["sid"]
    req = urllib.request.Request(base + f"/v1/streams/{sid}/audio",
                                 data=b"\0\0\0\0", method="POST")
    req.add_header("Content-Type", "application/octet-stream")
    req.add_header("Content-Length", str(100 * 1024 * 1024 * 1024))
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_shard_streams_http_matches_unsharded(served):
    """create_server(mesh=...) — the `serve --shard_streams` path (round-2
    VERDICT next item 8) — serves identical scores with the tick's stream
    axis sharded over the 8-device mesh."""
    from mla_tpu.parallel import mesh as pmesh

    cfg, variables, wav, base = served
    mesh = pmesh.make_mesh()
    srv = create_server(cfg, variables, port=0, max_streams=8,
                        chunk_patches=3, transfer_dtype="float32", mesh=mesh)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    sbase = "http://%s:%d" % srv.server_address[:2]
    try:
        n = _samples_per_patches(cfg.frontend, 3)
        audio = wav[:n]
        sid = _req(sbase, "POST", "/v1/streams")["sid"]
        r = _req(sbase, "POST", f"/v1/streams/{sid}/audio", audio.tobytes())
        assert r["advanced"] == 1
        got = _req(sbase, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]
        want = _req(base, "POST", "/v1/tag?top_k=4", audio.tobytes())["top_k"]
        # same audio, same weights: sharded streams == unsharded one-shot
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                                   rtol=1e-4, atol=1e-5)
    finally:
        srv.shutdown()


def test_error_paths(served):
    _, _, _, base = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/v1/streams/99/scores")
    assert e.value.code == 404
    sid = _req(base, "POST", "/v1/streams")["sid"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", f"/v1/streams/{sid}/scores")  # nothing processed yet
    assert e.value.code == 409
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", f"/v1/streams/{sid}/audio", b"abc")  # not mult of 4
    assert e.value.code == 400
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_one_shot_tag_endpoint(served, tmp_path):
    """POST /v1/tag: whole clip -> top-k in one call (reference C15's
    inference as HTTP), matching the stream lifecycle's scores; the
    transient slot is released afterwards."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 6)
    audio = wav[:n]
    got = _req(base, "POST", "/v1/tag?top_k=4", audio.tobytes())["top_k"]

    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio)
    single.flush()
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, p in got:
        np.testing.assert_allclose(p, want[names.index(name)], rtol=1e-4, atol=1e-5)

    # wav-file bodies work too, and slots are not leaked (3 slots, many calls)
    from mla_tpu.data import audio_io

    p = tmp_path / "t.wav"
    audio_io.write_wav(str(p), audio, cfg.frontend.sample_rate)
    for _ in range(4):
        r = _req(base, "POST", "/v1/tag", p.read_bytes(), "audio/wav")
        assert len(r["top_k"]) == 5
    h = _req(base, "GET", "/v1/healthz")
    assert h["open_streams"] == 0


def test_async_feed_stream_matches_sync(served):
    """?sync=0 feeds (pipelined uploads) produce the same final scores as
    the default fold-synchronous stream; the healthz backlog gauge drains
    to 0."""
    from mla_tpu.serve.client import TagClient

    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 6)
    audio = wav[:n]
    c = TagClient(base)
    try:
        with c.stream(wire="float32", sync=False) as s:
            for off in range(0, len(audio), 30000):
                s.feed(audio[off: off + 30000])
            got = s.scores(top_k=4)
        assert c.health()["backlog"] == 0
        with c.stream(wire="float32") as s2:
            s2.feed(audio)
            want = s2.scores(top_k=4)
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                                   rtol=1e-6, atol=1e-7)
    finally:
        c.close()


def test_unread_body_closes_keepalive_cleanly(served):
    """ADVICE r3: a raw client POSTing a body to a route that never reads
    it (unknown route, flush with an unexpected body) must not leave the
    bytes in the socket — on HTTP/1.1 keep-alive they would desync the
    NEXT request on the connection. The server now announces and performs
    a connection close on any reply whose request body went unconsumed."""
    import http.client

    _, _, _, base = served
    host, port = base.replace("http://", "").split(":")

    # unknown POST route with a body -> 404 + Connection: close
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request("POST", "/v1/nosuchroute", body=b"x" * 4096,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        r.read()
        assert r.status == 404
        assert r.will_close, "server must close after an unread body"
    finally:
        conn.close()

    # flush with an unexpected body: same hygiene, even on a 200
    sid = _req(base, "POST", "/v1/streams")["sid"]
    try:
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            conn.request("POST", f"/v1/streams/{sid}/flush", body=b"junk",
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            r.read()
            assert r.will_close
        finally:
            conn.close()
    finally:
        _req(base, "DELETE", f"/v1/streams/{sid}")

    # bodyless requests keep the connection alive (the SDK's hot path)
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        for _ in range(2):
            conn.request("GET", "/v1/healthz")
            r = conn.getresponse()
            assert json.loads(r.read())["ok"] is True
            assert not r.will_close
    finally:
        conn.close()

    # a GET carrying a body (legal, never read by any GET route) gets the
    # same hygiene — r4 review: do_GET used to skip the consumed guard,
    # leaving the bytes to desync the next keep-alive request
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request("GET", "/v1/healthz", body=b"y" * 2048,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        assert json.loads(r.read())["ok"] is True
        assert r.will_close, "server must close after an unread GET body"
    finally:
        conn.close()
