"""Native C++ serving front (native/serve_front.cpp + serve/native_front.py):
same HTTP API as the stdlib tier (serve/http.py), with the hot audio-feed
path — keep-alive parsing, wire validation, per-stream byte buffers,
backpressure — in GIL-free C++ threads. These tests mirror
test_http_serve.py's contract so the two tiers stay interchangeable, and
add native-specific coverage: the wire fast path per format, the slow-path
handoff (WAV sniffing, mismatched wires, adpcm sub-block remainders), and
keep-alive connection reuse."""

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
from mla_tpu.serve import native_front
from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches

pytestmark = pytest.mark.skipif(
    not native_front.available(), reason="native serving front not built")


def _req(base, method, path, body=None, ctype="application/octet-stream",
         headers=None):
    req = urllib.request.Request(base + path, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", ctype)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read().decode())


def _small_cfg():
    return Config(
        name="native_front_test",
        model=ModelConfig(variant="single_attention", trunk="cnn",
                          n_classes=10, n_blocks=1, hidden_units=48,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
        data=dataclasses.replace(Config().data, dataset="synthetic_us8k"),
    )


def _init(cfg, wav):
    model = build_model(cfg.model)
    patches = waveform_to_patches(jnp.asarray(wav[:32000])[None], cfg.frontend)
    return model.init(jax.random.key(0), patches)


@pytest.fixture(scope="module")
def served():
    """f32-wire native server (exact parity with the in-process tagger)."""
    cfg = _small_cfg()
    wav = (np.random.default_rng(5).standard_normal(16000 * 12) * 0.1
           ).astype(np.float32)
    variables = _init(cfg, wav)
    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=3, chunk_patches=3,
        transfer_dtype="float32")
    yield cfg, variables, wav, "http://%s:%d" % srv.server_address
    srv.server_close()


@pytest.fixture(scope="module")
def served_adpcm():
    """adpcm4-wire native server (the production serving format: the C++
    fast path buffers 4-bit wire blocks, the device decodes in-tick)."""
    cfg = _small_cfg()
    wav = (np.random.default_rng(7).standard_normal(16000 * 12) * 0.1
           ).astype(np.float32)
    variables = _init(cfg, wav)
    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=3, chunk_patches=3,
        transfer_dtype="adpcm4")
    yield cfg, variables, wav, "http://%s:%d" % srv.server_address
    srv.server_close()


def test_healthz_native(served):
    _, _, _, base = served
    h = _req(base, "GET", "/v1/healthz")
    assert h["ok"] is True and h["max_streams"] == 3
    assert h["native_front"] is True  # distinguishes the tiers


def test_lifecycle_and_parity(served):
    """Raw-f32 bodies ride the C++ fast path end-to-end; scores match the
    in-process tagger exactly (f32 wire, f32 compute)."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 6)
    audio = wav[:n]

    sid = _req(base, "POST", "/v1/streams")["sid"]
    cut = 50_000
    r1 = _req(base, "POST", f"/v1/streams/{sid}/audio", audio[:cut].tobytes())
    r2 = _req(base, "POST", f"/v1/streams/{sid}/audio", audio[cut:].tobytes())
    assert r1["fed_samples"] == cut and r2["advanced"] >= 1
    scores = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=3")

    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio)
    want = single.top_k(3)
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    assert [g[0] for g in scores["top_k"]] == [names[i] for i, _ in want]
    np.testing.assert_allclose([g[1] for g in scores["top_k"]],
                               [p for _, p in want], rtol=1e-4, atol=1e-5)
    assert _req(base, "DELETE", f"/v1/streams/{sid}")["closed"] is True


def test_wav_body_sniffed_to_slow_path(served, tmp_path):
    """A WAV body with NO Content-Type starts with RIFF magic: the C++
    fast path must defer it to Python for container decoding instead of
    buffering the header bytes as raw f32 PCM."""
    cfg, variables, wav, base = served
    from mla_tpu.data import audio_io

    n = _samples_per_patches(cfg.frontend, 3)
    p = tmp_path / "clip.wav"
    audio_io.write_wav(str(p), wav[:n], cfg.frontend.sample_rate)
    body = p.read_bytes()
    assert body[:4] == b"RIFF"

    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", body)  # octet-stream
    assert r["fed_samples"] == n and r["advanced"] == 1
    got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]

    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio_io.read_wav_bytes(body)[0])
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, prob in got:
        np.testing.assert_allclose(prob, want[names.index(name)],
                                   rtol=1e-4, atol=1e-5)
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_flush_subchunk_tail(served):
    """flush() drains whole chunks through the tick thread, then hands the
    sub-chunk byte tail back to srv.flush's masking logic."""
    cfg, _, wav, base = served
    sid = _req(base, "POST", "/v1/streams")["sid"]
    m = _samples_per_patches(cfg.frontend, 4)  # 1 chunk + 1-patch tail
    _req(base, "POST", f"/v1/streams/{sid}/audio", wav[:m].tobytes())
    assert _req(base, "POST", f"/v1/streams/{sid}/flush")["flushed"] is True
    s = _req(base, "GET", f"/v1/streams/{sid}/scores")
    assert np.isfinite([p for _, p in s["top_k"]]).all()
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_one_shot_tag(served):
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 6)
    audio = wav[:n]
    got = _req(base, "POST", "/v1/tag?top_k=4", audio.tobytes())["top_k"]
    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(audio)
    single.flush()
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, prob in got:
        np.testing.assert_allclose(prob, want[names.index(name)],
                                   rtol=1e-4, atol=1e-5)
    assert _req(base, "GET", "/v1/healthz")["open_streams"] == 0  # slot freed


def test_concurrent_clients(served):
    """Two keep-alive clients on separate streams interleave fast-path
    feeds; per-stream buffering in C++ must keep results identical to a
    serial run."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3)
    audios = [wav[:n], (wav[:n] * 0.5).astype(np.float32)]
    sids = [_req(base, "POST", "/v1/streams")["sid"] for _ in audios]
    errs = []

    def client(sid, audio):
        try:
            for s in range(0, len(audio), 9999):
                _req(base, "POST", f"/v1/streams/{sid}/audio",
                     audio[s: s + 9999].tobytes())
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ts = [threading.Thread(target=client, args=(sid, a))
          for sid, a in zip(sids, audios)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for sid, audio in zip(sids, audios):
        got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=10")
        single = StreamingTagger(cfg, variables, chunk_patches=3)
        single.feed(audio)
        want = dict(single.top_k(10))
        for name, prob in got["top_k"]:
            np.testing.assert_allclose(prob, want[names.index(name)],
                                       rtol=1e-4, atol=1e-5)
        _req(base, "DELETE", f"/v1/streams/{sid}")


def test_keep_alive_reuse_and_pipelined_async(served):
    """TagClient's persistent HTTP/1.1 connection reuses one socket for
    many fast-path requests; ?sync=0 pipelined feeds match the synchronous
    stream and the backlog gauge drains to 0."""
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
        np.testing.assert_allclose([g[1] for g in got],
                                   [w[1] for w in want],
                                   rtol=1e-6, atol=1e-7)
    finally:
        c.close()


def test_error_paths(served):
    _, _, _, base = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", "/v1/streams/99/scores")
    assert e.value.code == 404
    sid = _req(base, "POST", "/v1/streams")["sid"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "GET", f"/v1/streams/{sid}/scores")  # nothing processed
    assert e.value.code == 409
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", f"/v1/streams/{sid}/audio", b"abc")  # not mult of 4
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", "/v1/streams/not_a_number/audio", b"\0" * 4)
    assert e.value.code == 404
    _req(base, "DELETE", f"/v1/streams/{sid}")
    # feeding a closed stream: fast path answers 404 from C++
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", f"/v1/streams/{sid}/audio", b"\0" * 8)
    assert e.value.code == 404


def test_unknown_method_501(served):
    """HEAD/PUT/... must 501 in C++, not reach the Python queue where the
    3-way method code would alias them to DELETE (a monitoring probe must
    never close a live stream)."""
    _, _, _, base = served
    sid = _req(base, "POST", "/v1/streams")["sid"]
    for method in ("PUT", "HEAD", "PATCH"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, method, f"/v1/streams/{sid}")
        assert e.value.code == 501, method
    # the stream survived the probes
    assert _req(base, "POST", f"/v1/streams/{sid}/audio", b"\0" * 4)
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_unknown_method_with_body_closes_keepalive(served):
    """r4 review follow-up: the 501 path never reads the request body, so
    a PUT carrying one on a keep-alive connection must get Connection:
    close — otherwise the unread bytes desync the NEXT request on the
    socket (same hygiene as the Python tier's _reply guard)."""
    import http.client

    _, _, _, base = served
    host, port = base.replace("http://", "").split(":")

    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request("PUT", "/v1/streams/0", body=b"x" * 1024,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        r.read()
        assert r.status == 501
        assert r.will_close, "must close after an unread 501 body"
    finally:
        conn.close()

    # bodyless unsupported methods keep the connection alive
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        for _ in range(2):
            conn.request("PATCH", "/v1/streams/0")
            r = conn.getresponse()
            r.read()
            assert r.status == 501
            assert not r.will_close
    finally:
        conn.close()


def test_sid_digit_overflow_404(served):
    """A >9-digit sid must 404, not wrap (atoi overflow) into a live slot."""
    _, _, _, base = served
    sid = _req(base, "POST", "/v1/streams")["sid"]
    overflowed = str(4294967296 + sid)  # would alias sid if atoi wrapped
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", f"/v1/streams/{overflowed}/audio", b"\0" * 4)
    assert e.value.code == 404
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_unresolvable_host_raises(served):
    """sf_start must fail on a non-IPv4 host, not silently bind loopback
    while the CLI prints the requested name."""
    cfg, variables, _, _ = served
    with pytest.raises(OSError):
        native_front.NativeTagServer(
            cfg, variables, port=0, host="no.such.host.example",
            max_streams=1)


def test_cpp_load_client(served):
    """native/bench_client (the C++ load generator behind bench_serving
    --cpp-client) speaks the full stream protocol against the native
    front: open, sync wire feeds, scores, delete, timed JSON out."""
    import os
    import subprocess
    import tempfile

    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, _, wav, base = served
    src_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    exe = os.path.join(src_dir, "bench_client")
    src = exe + ".cpp"
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-pthread", src, "-o", exe],
                check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            pytest.skip("cannot build native/bench_client")
    host, port = base.replace("http://", "").rsplit(":", 1)
    sps = _samples_per_patches(cfg.frontend, 3)  # one full chunk per feed
    body = np.ascontiguousarray(wav[:sps]).tobytes()
    with tempfile.NamedTemporaryFile(suffix=".wire") as bf:
        bf.write(body)
        bf.flush()
        out = subprocess.run(
            [exe, host, port, "2", bf.name, "application/octet-stream",
             "2", "2", "1"],
            capture_output=True, timeout=120)
    assert out.returncode == 0, out.stderr.decode()
    res = json.loads(out.stdout.decode())
    assert len(res["times"]) == 2 and all(t > 0 for t in res["times"])
    assert res["n_streams"] == 2
    # the client's streams were deleted: all slots free again
    sids = [_req(base, "POST", "/v1/streams")["sid"] for _ in range(3)]
    for sid in sids:
        _req(base, "DELETE", f"/v1/streams/{sid}")


def test_body_size_cap(served):
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


def test_adpcm_wire_fast_path_parity(served_adpcm):
    """Pre-encoded adpcm4 wire blocks take the C++ fast path (zero Python
    per request); device-side decode scores match a float feed of the same
    decoded audio."""
    from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm4_decode, adpcm4_encode
    from mla_tpu.data.audio_io import pcm16_quantize

    cfg, variables, wav, base = served_adpcm
    n = _samples_per_patches(cfg.frontend, 6)
    n -= n % SERVE_BLOCK
    audio = wav[:n]
    wire = adpcm4_encode(pcm16_quantize(audio), block=SERVE_BLOCK)

    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", wire.tobytes(),
             "audio/adpcm4")
    assert r["fed_samples"] == n and r["advanced"] >= 1
    got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]

    # oracle: the tagger on the codec-roundtripped audio (same decode the
    # device performs in-tick)
    single = StreamingTagger(cfg, variables, chunk_patches=3)
    single.feed(adpcm4_decode(wire, block=SERVE_BLOCK))
    want = dict(single.top_k(4))
    names = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, prob in got:
        np.testing.assert_allclose(prob, want[names.index(name)],
                                   rtol=1e-3, atol=1e-4)
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_adpcm_float_slow_path_and_remainder_ordering(served_adpcm):
    """Float bodies on the adpcm4 wire are host-encoded by the Python slow
    path. A feed that leaves a sub-block remainder arms slow_rem: a
    subsequent pre-encoded wire feed must be REJECTED (400, the server's
    canonical reorder message) rather than silently placed after the
    unencoded samples."""
    from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm4_encode
    from mla_tpu.data.audio_io import pcm16_quantize

    cfg, variables, wav, base = served_adpcm
    n = _samples_per_patches(cfg.frontend, 3)
    sid = _req(base, "POST", "/v1/streams")["sid"]

    odd = n + 17  # leaves a sub-block remainder
    assert odd % SERVE_BLOCK != 0
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", wav[:odd].tobytes())
    assert r["fed_samples"] == odd and r["advanced"] >= 1

    wire = adpcm4_encode(pcm16_quantize(wav[:SERVE_BLOCK * 4]),
                         block=SERVE_BLOCK)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "POST", f"/v1/streams/{sid}/audio", wire.tobytes(),
             "audio/adpcm4")
    assert e.value.code == 400
    assert "not-yet-encoded" in json.loads(e.value.read().decode())["error"]

    # flush consumes the remainder and clears slow_rem: wire feeds work again
    _req(base, "POST", f"/v1/streams/{sid}/flush")
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", wire.tobytes(),
             "audio/adpcm4")
    assert r["fed_samples"] == SERVE_BLOCK * 4
    _req(base, "DELETE", f"/v1/streams/{sid}")


def test_adpcm_x_samples_partial_block(served_adpcm):
    """X-Samples on an adpcm4 body posted to the adpcm4 wire: accepted and
    block-rounded (same as the stdlib tier — the padding is decoded on
    device; X-Samples trimming only applies on host-decode paths)."""
    from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm4_encode
    from mla_tpu.data.audio_io import pcm16_quantize

    cfg, _, wav, base = served_adpcm
    n = _samples_per_patches(cfg.frontend, 3) + 17
    pad = (-n) % SERVE_BLOCK
    padded = np.concatenate([wav[:n], np.repeat(wav[n - 1], pad)]
                            ).astype(np.float32)
    wire = adpcm4_encode(pcm16_quantize(padded), block=SERVE_BLOCK)
    sid = _req(base, "POST", "/v1/streams")["sid"]
    r = _req(base, "POST", f"/v1/streams/{sid}/audio", wire.tobytes(),
             "audio/adpcm4", headers={"X-Samples": str(n)})
    assert r["advanced"] >= 1
    s = _req(base, "GET", f"/v1/streams/{sid}/scores")
    assert np.isfinite([p for _, p in s["top_k"]]).all()
    _req(base, "DELETE", f"/v1/streams/{sid}")


@pytest.mark.parametrize("transfer_dtype,wire",
                         [("int16", "int16"), ("uint8", "mulaw"),
                          ("adpcm2", "adpcm2")])
def test_compressed_wire_fast_paths(transfer_dtype, wire):
    """int16, mu-law, and 2-bit ADPCM wire bodies ride the C++ fast path
    on matching servers (audio/L16, audio/basic, audio/adpcm2); scores
    track the tagger on the codec-roundtripped audio."""
    from mla_tpu.serve.client import TagClient, _WireEncoder
    from mla_tpu.data.audio_io import mulaw_decode, mulaw_encode

    cfg = _small_cfg()
    wav = (np.random.default_rng(3).standard_normal(16000 * 8) * 0.1
           ).astype(np.float32)
    variables = _init(cfg, wav)
    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=2, chunk_patches=3,
        transfer_dtype=transfer_dtype)
    base = "http://%s:%d" % srv.server_address
    try:
        n = _samples_per_patches(cfg.frontend, 6)
        audio = wav[:n]
        c = TagClient(base)
        with c.stream(wire=wire) as s:
            s.feed(audio)
            got = dict(s.scores(top_k=4))
        c.close()

        single = StreamingTagger(cfg, variables, chunk_patches=3)
        if wire == "mulaw":
            single.feed(mulaw_decode(mulaw_encode(audio)))
            tol = dict(atol=5e-3, rtol=5e-3)
        elif wire == "adpcm2":
            from mla_tpu.data import adpcm
            from mla_tpu.data.audio_io import pcm16_quantize

            single.feed(adpcm.adpcm2_decode(
                adpcm.adpcm2_encode(pcm16_quantize(audio),
                                    block=adpcm.SERVE_BLOCK),
                n=len(audio), block=adpcm.SERVE_BLOCK))
            tol = dict(atol=5e-3, rtol=5e-3)
        else:
            pcm = np.round(np.clip(audio, -1, 1) * 32767.0)
            single.feed((pcm / 32768.0).astype(np.float32))
            tol = dict(atol=1e-4, rtol=1e-3)
        names = labels_for(cfg.data.dataset, cfg.model.n_classes)
        want = {names[i]: p for i, p in single.top_k(4)}
        for name, prob in got.items():
            np.testing.assert_allclose(prob, want[name], **tol)
    finally:
        srv.server_close()


def test_shard_streams_native_matches_unsharded(served):
    """create_native_server(mesh=...) — `serve --native --shard_streams` —
    serves identical scores with the tick's stream axis sharded over the
    8-device CPU mesh."""
    from mla_tpu.parallel import mesh as pmesh

    cfg, variables, wav, base = served
    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=8, chunk_patches=3,
        transfer_dtype="float32", mesh=pmesh.make_mesh())
    sbase = "http://%s:%d" % srv.server_address
    try:
        n = _samples_per_patches(cfg.frontend, 3)
        audio = wav[:n]
        sid = _req(sbase, "POST", "/v1/streams")["sid"]
        r = _req(sbase, "POST", f"/v1/streams/{sid}/audio", audio.tobytes())
        assert r["advanced"] == 1
        got = _req(sbase, "GET", f"/v1/streams/{sid}/scores?top_k=4")["top_k"]
        want = _req(base, "POST", "/v1/tag?top_k=4", audio.tobytes())["top_k"]
        assert [g[0] for g in got] == [w[0] for w in want]
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                                   rtol=1e-4, atol=1e-5)
    finally:
        srv.server_close()


def test_slot_reuse_cycles(served):
    """Open/feed/close cycles reuse slots without leaking C++ buffer state:
    a reopened slot starts clean (no stale bytes shift the new stream's
    audio)."""
    cfg, variables, wav, base = served
    n = _samples_per_patches(cfg.frontend, 3)
    tail = 4444  # leave a partial buffer behind on close
    ref = None
    for cycle in range(3):
        sid = _req(base, "POST", "/v1/streams")["sid"]
        _req(base, "POST", f"/v1/streams/{sid}/audio",
             wav[: n + tail].tobytes())
        got = _req(base, "GET", f"/v1/streams/{sid}/scores?top_k=5")["top_k"]
        _req(base, "DELETE", f"/v1/streams/{sid}")
        if ref is None:
            ref = got
        else:
            assert [g[0] for g in got] == [r[0] for r in ref]
            np.testing.assert_allclose([g[1] for g in got],
                                       [r[1] for r in ref],
                                       rtol=1e-6, atol=1e-7)
