"""Client SDK (serve/client.py) against a real HTTP service: one-shot and
streaming, every wire encoding, error mapping. The adpcm4 wire path is
the production shape — client-side encode, byte-routing host, on-device
decode."""

import dataclasses
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, ModelConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve.client import TagClient, TagServiceError
from mla_tpu.serve.http import create_server


def _spawn(cfg, variables, transfer_dtype):
    srv = create_server(cfg, variables, port=0, max_streams=3,
                        chunk_patches=2, transfer_dtype=transfer_dtype)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    return srv, TagClient(f"http://{host}:{port}")


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        name="client_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                          n_classes=8, n_blocks=2, hidden_units=32,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
        data=dataclasses.replace(Config().data, dataset="synthetic_esc50"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(7)
    patches = waveform_to_patches(
        jnp.asarray(rng.standard_normal(32000).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    n = 16000 * 7
    t = np.arange(n) / cfg.frontend.sample_rate
    wav = np.clip(0.4 * np.sin(2 * np.pi * 440 * t)
                  + 0.1 * rng.standard_normal(n), -1, 1).astype(np.float32)
    return cfg, variables, wav


def test_one_shot_every_wire_against_adpcm_server(setup):
    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "adpcm4")
    try:
        assert c.health()["ok"] is True
        ref = c.tag(wav, wire="float32")
        for wire in ("int16", "mulaw", "adpcm4"):
            got = c.tag(wav, wire=wire)
            assert got[0][0] == ref[0][0], wire  # top-1 stable per wire
    finally:
        srv.shutdown()


def test_stream_adpcm4_matches_one_shot(setup):
    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "adpcm4")
    try:
        ref = c.tag(wav, wire="adpcm4", top_k=3)
        with c.stream(wire="adpcm4") as s:
            # odd block sizes exercise the client-side sub-block remainder
            for lo in range(0, len(wav), 7001):
                s.feed(wav[lo: lo + 7001])
            s.flush()
            got = s.scores(top_k=3)
        assert got[0][0] == ref[0][0]
        # both paths carved identical 64-sample blocks from sample 0, so
        # scores agree to float noise, not just top-1
        np.testing.assert_allclose([p for _, p in got],
                                   [p for _, p in ref], atol=1e-4)
    finally:
        srv.shutdown()


def test_stream_int16_default_server(setup):
    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "int16")
    try:
        with c.stream(wire="int16") as s:
            s.feed(wav)
            s.flush()
            top = s.scores()
        assert len(top) == 5 and all(0 <= p <= 1 for _, p in top)
    finally:
        srv.shutdown()


def test_tag_cli_verb(setup, tmp_path, capsys):
    """`python -m mla_tpu tag --url ... --wav ... --wire adpcm4` drives a
    running service through the client SDK."""
    import json

    from mla_tpu.__main__ import main
    from mla_tpu.data.audio_io import write_wav

    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "adpcm4")
    try:
        p = str(tmp_path / "clip.wav")
        write_wav(p, wav, cfg.frontend.sample_rate)
        url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
        main(["tag", "--url", url, "--wav", p, "--wire", "adpcm4",
              "--top_k", "3"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert len(out["top_k"]) == 3
        assert out["top_k"][0][0] == c.tag(wav, wire="adpcm4")[0][0]
    finally:
        srv.shutdown()


def test_int16_waveform_input_every_wire(setup):
    """tag() advertises int16 waveform input; the float32 and mulaw wires
    must dequantize it (raw int16 magnitudes would clip to full scale and
    tag garbage — found by review, reproduced)."""
    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "float32")
    try:
        from mla_tpu.data.audio_io import pcm16_quantize

        wav_i16 = pcm16_quantize(wav)
        ref = c.tag(wav, wire="float32")
        for wire in ("float32", "int16", "mulaw"):
            got = c.tag(wav_i16, wire=wire)
            assert got[0][0] == ref[0][0], wire
    finally:
        srv.shutdown()


def test_base_url_forms():
    from mla_tpu.serve.client import TagClient

    c = TagClient("127.0.0.1:9123")  # scheme-less form
    assert (c.host, c.port) == ("127.0.0.1", 9123)
    with pytest.raises(ValueError, match="path"):
        TagClient("http://gw:80/tagger")  # prefix would be dropped


def test_error_mapping(setup):
    cfg, variables, wav = setup
    srv, c = _spawn(cfg, variables, "adpcm4")
    try:
        with c.stream(wire="adpcm4") as s:
            with pytest.raises(TagServiceError) as ei:
                s.scores()  # nothing processed yet
            assert ei.value.status == 409
        with pytest.raises(TagServiceError) as ei:
            c._request("GET", "/v1/streams/99/scores")
        assert ei.value.status == 404
        with pytest.raises(ValueError):
            c.tag(wav, wire="int8")
    finally:
        srv.shutdown()


def test_reset_retry_phase_policy(monkeypatch):
    """ADVICE r3 + r4 review: the retry policy is PHASE-based. A reset
    raised while SENDING (conn.request) means the body never fully
    reached the server (Content-Length framing — a handler reads the
    whole body before acting), so ANY method retries once: this is the
    common idle-reap case (native front reaps keep-alive connections).
    A reset raised while READING THE REPLY (getresponse/read) can arrive
    after the server processed the request — only idempotent GETs retry.
    RemoteDisconnected (reply-phase, request provably unprocessed)
    retries for any method."""
    import http.client as hc

    from mla_tpu.serve import client as clmod

    attempts = []

    def make_fake(send_exc=None, resp_exc=None):
        class FakeConn:
            def __init__(self, *a, **k):
                pass

            def request(self, method, path, body=None, headers=None):
                attempts.append((method, path))
                if send_exc is not None:
                    raise send_exc

            def getresponse(self):
                raise resp_exc

            def close(self):
                pass

        return FakeConn

    c = clmod.TagClient("http://127.0.0.1:1")

    # SEND-phase reset on POST: retried once (request never delivered)
    monkeypatch.setattr(hc, "HTTPConnection",
                        make_fake(send_exc=ConnectionResetError()))
    with pytest.raises(ConnectionResetError):
        c._request("POST", "/v1/streams/0/audio", b"x")
    assert len(attempts) == 2

    # SEND-phase broken pipe on POST: same
    attempts.clear()
    c.close()
    monkeypatch.setattr(hc, "HTTPConnection",
                        make_fake(send_exc=BrokenPipeError()))
    with pytest.raises(BrokenPipeError):
        c._request("POST", "/v1/streams/0/audio", b"x")
    assert len(attempts) == 2

    # RESPONSE-phase reset on GET: retried once, then surfaces
    attempts.clear()
    c.close()
    monkeypatch.setattr(hc, "HTTPConnection",
                        make_fake(resp_exc=ConnectionResetError()))
    with pytest.raises(ConnectionResetError):
        c._request("GET", "/v1/healthz")
    assert len(attempts) == 2

    # RESPONSE-phase reset on POST: NOT retried (may have been processed)
    attempts.clear()
    c.close()
    with pytest.raises(ConnectionResetError):
        c._request("POST", "/v1/streams/0/audio", b"x")
    assert len(attempts) == 1

    # RESPONSE-phase broken pipe on POST: same
    attempts.clear()
    c.close()
    monkeypatch.setattr(hc, "HTTPConnection",
                        make_fake(resp_exc=BrokenPipeError()))
    with pytest.raises(BrokenPipeError):
        c._request("POST", "/v1/streams/0/audio", b"x")
    assert len(attempts) == 1

    # stale keep-alive (RemoteDisconnected at reply) on POST: retried once
    attempts.clear()
    c.close()
    monkeypatch.setattr(hc, "HTTPConnection",
                        make_fake(resp_exc=hc.RemoteDisconnected()))
    with pytest.raises(hc.RemoteDisconnected):
        c._request("POST", "/v1/streams/0/audio", b"x")
    assert len(attempts) == 2
