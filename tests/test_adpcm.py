"""4-bit block ADPCM wire codec (data/adpcm.py): reconstruction quality,
numpy<->jnp decode bit-parity, C++<->numpy encode bit-parity, and the
serving integration (transfer_dtype="adpcm4" scores vs float32).

The codec is serving infrastructure with no reference counterpart (the
reference's C15 is a one-shot script — SURVEY.md §2.1); the contract is
self-consistency plus score stability against the uncompressed path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mla_tpu.data import adpcm


def _program(seconds=2.0, sr=16000, seed=0):
    """Mixed tones + noise, the same kind of material the serving bench
    uses — exercises both large and small sample-to-sample diffs."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 2818 * t)
         + 0.05 * rng.standard_normal(t.size))
    return np.clip(x, -1, 1).astype(np.float32)


def _snr_db(x, y):
    return 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))


def test_roundtrip_snr():
    x = _program()
    wire = adpcm.adpcm4_encode(x)
    y = adpcm.adpcm4_decode(wire, n=x.size)
    assert y.shape == x.shape and y.dtype == np.float32
    assert _snr_db(x, y) > 20.0  # 4-bit ADPCM lands ~24 dB on this program


def test_wire_is_half_of_mulaw():
    x = _program(seconds=1.0)
    wire = adpcm.adpcm4_encode(x)
    assert wire.nbytes < 0.55 * x.size  # mu-law is 1 byte/sample
    assert wire.nbytes == adpcm.wire_length(x.size)


def test_numpy_jnp_decode_bit_identical():
    x = _program(seconds=0.5)
    wire = adpcm.adpcm4_encode(x)
    y_np = adpcm.adpcm4_decode(wire, n=x.size)
    y_jnp = np.asarray(adpcm.adpcm4_decode(wire, n=x.size, xp=jnp))
    assert np.array_equal(y_np, y_jnp)


def test_cpp_numpy_encoders_bit_identical():
    from mla_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    x = np.stack([_program(0.7, seed=3 + i) for i in range(5)])
    got = adpcm.adpcm4_encode(x)  # routes to C++ (threaded across rows)
    native._LIB = False  # force the numpy path
    try:
        want = adpcm.adpcm4_encode(x)
    finally:
        native._LIB = None
    assert np.array_equal(got, want)


def test_batched_rows_and_padding():
    x = np.stack([_program(0.33, seed=1), -_program(0.33, seed=2)])
    assert x.shape[-1] % adpcm.DEFAULT_BLOCK  # exercises edge padding
    wire = adpcm.adpcm4_encode(x)
    y = adpcm.adpcm4_decode(wire, n=x.shape[-1])
    assert y.shape == x.shape
    assert _snr_db(x, y) > 20.0


def test_int16_input_matches_float_input():
    x = _program(seconds=0.4)
    xi = np.asarray(np.clip(x, -1, 1) * 32767.0, np.int16)
    assert np.array_equal(adpcm.adpcm4_encode(x), adpcm.adpcm4_encode(xi))


def test_silence_is_exact():
    x = np.zeros(1024, np.float32)
    y = adpcm.adpcm4_decode(adpcm.adpcm4_encode(x), n=x.size)
    # pred starts at 0; each step moves by at most step>>3 of the minimum
    # step (7>>3 = 0) — silence reconstructs to exactly 0
    assert np.all(y == 0.0)


def test_server_adpcm4_matches_float32_scores():
    """transfer_dtype='adpcm4' end-to-end: scores close to the float32
    path, identical top-1 — the serving contract for every wire format.
    Exercises tick (full chunks) AND flush (sub-chunk tail) through the
    on-device decode."""
    import jax

    from mla_tpu.config import Config, ModelConfig
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.server import BatchedStreamingServer

    cfg = Config(
        name="adpcm_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                          n_classes=7, n_blocks=2, hidden_units=32,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2, ).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)

    chunk = BatchedStreamingServer(cfg, variables, max_streams=2,
                                   chunk_patches=2).chunk_samples
    n = 2 * chunk + chunk // 3  # two ticks + a flush tail
    t = np.arange(n) / cfg.frontend.sample_rate
    x = np.clip(0.4 * np.sin(2 * np.pi * 440 * t)
                + 0.1 * rng.standard_normal(n), -1, 1).astype(np.float32)

    def run(td):
        srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                     chunk_patches=2, transfer_dtype=td)
        sid = srv.open()
        srv.feed(sid, x)
        srv.drain()
        srv.flush(sid)
        return srv.scores(sid)

    ref = run("float32")
    got = run("adpcm4")
    assert int(np.argmax(ref)) == int(np.argmax(got))
    assert np.max(np.abs(ref - got)) < 0.05

    # wire-native client feed (the production path: client encodes, host
    # routes bytes, device decodes) must equal the server-side incremental
    # encode of the same samples BIT-EXACTLY: both carve the same
    # 64-sample blocks from sample 0
    whole = len(x) // adpcm.SERVE_BLOCK * adpcm.SERVE_BLOCK
    wire_bytes = adpcm.adpcm4_encode(
        np.asarray(np.clip(x[:whole], -1, 1) * 32767.0, np.int16),
        block=adpcm.SERVE_BLOCK)
    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=2, transfer_dtype="adpcm4")
    sid = srv.open()
    srv.feed(sid, wire_bytes, wire=True)
    srv.feed(sid, x[whole:])  # sub-block tail via the incremental path
    srv.drain()
    srv.flush(sid)
    wire_scores = srv.scores(sid)
    np.testing.assert_array_equal(wire_scores, got)


def test_server_uint8_wire_false_is_mulaw():
    """feed(uint8, wire=False) on an adpcm4 server means mu-law codes by
    the server convention — quantizing the raw 0..255 codes would clip
    every nonzero sample to full scale (found by review, reproduced)."""
    import jax

    from mla_tpu.config import Config, ModelConfig
    from mla_tpu.data.audio_io import mulaw_encode
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.server import BatchedStreamingServer

    cfg = Config(
        name="adpcm_mulaw_feed",
        model=ModelConfig(variant="single_attention", trunk="cnn",
                          n_classes=5, n_blocks=1, hidden_units=24,
                          conv_channels=(4, 8), convs_per_stage=1,
                          compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(2)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(32000).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)

    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=2, transfer_dtype="adpcm4")
    n = srv.chunk_samples
    x = np.clip(0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000),
                -1, 1).astype(np.float32)
    a = srv.open()
    srv.feed(a, x)
    b = srv.open()
    srv.feed(b, mulaw_encode(x), wire=False)
    srv.drain()
    sa, sb = srv.scores(a), srv.scores(b)
    assert int(np.argmax(sa)) == int(np.argmax(sb))
    assert np.max(np.abs(sa - sb)) < 0.05  # mu-law quantization noise only


def test_wire_format_golden_frozen():
    """The wire layout is a cross-version CLIENT/SERVER contract (clients
    encode, servers route bytes, devices decode): the frozen golden pins
    both the encoder's exact bytes and the decoder's exact reconstruction
    for the storage (256) and serving (64) block sizes. If this test
    fails after an intentional codec change, the wire format is no longer
    compatible with deployed clients — version it, don't refreeze."""
    import os

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "adpcm_wire.npz"))
    x = g["x"]
    np.testing.assert_array_equal(adpcm.adpcm4_encode(x), g["wire256"])
    np.testing.assert_array_equal(
        adpcm.adpcm4_encode(x, block=adpcm.SERVE_BLOCK), g["wire64"])
    np.testing.assert_array_equal(
        adpcm.adpcm4_decode(g["wire256"], n=x.size), g["dec256"])
    np.testing.assert_array_equal(
        adpcm.adpcm4_decode(g["wire64"], n=x.size, block=adpcm.SERVE_BLOCK),
        g["dec64"])


def test_http_adpcm4_wire_roundtrip():
    """POST audio/adpcm4 wire blocks to an adpcm4 server over real HTTP:
    end-to-end compressed path, scores equal the f32-body path's top-1."""
    import http.client
    import threading

    import jax

    from mla_tpu.config import Config, ModelConfig
    from mla_tpu.data import adpcm as _ad
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.http import create_server

    cfg = Config(
        name="adpcm_http",
        model=ModelConfig(variant="single_attention", trunk="cnn",
                          n_classes=5, n_blocks=1, hidden_units=24,
                          conv_channels=(4, 8), convs_per_stage=1,
                          compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(1)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(32000).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)
    srv = create_server(cfg, variables, port=0, max_streams=2,
                        chunk_patches=2, transfer_dtype="adpcm4")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address[:2]
        n = 16000 * 4
        tt = np.arange(n) / cfg.frontend.sample_rate
        x = np.clip(0.4 * np.sin(2 * np.pi * 440 * tt)
                    + 0.1 * rng.standard_normal(n), -1, 1).astype(np.float32)
        whole = n // _ad.SERVE_BLOCK * _ad.SERVE_BLOCK
        wire = _ad.adpcm4_encode(
            np.asarray(x[:whole] * 32767.0, np.int16), block=_ad.SERVE_BLOCK)

        def tag(body, ctype):
            c = http.client.HTTPConnection(host, port)
            c.request("POST", "/v1/tag?top_k=3", body=body,
                      headers={"Content-Type": ctype})
            r = c.getresponse()
            assert r.status == 200, r.read()
            import json
            return json.loads(r.read())["top_k"]

        top_wire = tag(wire.tobytes(), "audio/adpcm4")
        top_f32 = tag(x.tobytes(), "application/octet-stream")
        assert top_wire[0][0] == top_f32[0][0]
    finally:
        srv.shutdown()


# ------------------------------------------------------------- adpcm2
# The 2-bit rung (0.297 B/sample, 1.84x thinner than adpcm4) for
# maximally transfer-starved links. Same block wire, 2-bit codes;
# quality was probed BEFORE building (scripts/probe_adpcm_bits.py):
# ~14 dB SNR on program material, flagship top-1 and top-5 stable.


def test_adpcm2_roundtrip_snr_and_wire_size():
    x = _program()
    wire = adpcm.adpcm2_encode(x)
    y = adpcm.adpcm2_decode(wire, n=x.size)
    assert y.shape == x.shape and y.dtype == np.float32
    assert _snr_db(x, y) > 10.0  # lands ~14 dB on this program
    assert wire.nbytes == adpcm.wire_length(x.size, bits=2)
    assert wire.nbytes < 0.6 * adpcm.wire_length(x.size)  # vs adpcm4


def test_adpcm2_numpy_jnp_decode_bit_identical():
    x = _program(seconds=0.5)
    for blk in (adpcm.DEFAULT_BLOCK, adpcm.SERVE_BLOCK):
        wire = adpcm.adpcm2_encode(x, block=blk)
        y_np = adpcm.adpcm2_decode(wire, n=x.size, block=blk)
        y_jnp = np.asarray(adpcm.adpcm2_decode(wire, n=x.size, block=blk,
                                               xp=jnp))
        assert np.array_equal(y_np, y_jnp), blk


def test_adpcm2_cpp_numpy_encoders_bit_identical():
    from mla_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    x = np.stack([_program(0.7, seed=11 + i) for i in range(5)])
    got = adpcm.adpcm2_encode(x)  # routes to C++
    native._LIB = False  # force the numpy path
    try:
        want = adpcm.adpcm2_encode(x)
    finally:
        native._LIB = None
    assert np.array_equal(got, want)


def test_adpcm2_silence_is_bounded_dither():
    """2-bit silence is NOT exact (min delta = 7>>1 = 3): it dithers
    within +/-3 LSB around zero and stays bounded — it is only ever fed
    to masked rows (inactive ticks / flush padding), never a fold."""
    x = np.zeros(4096, np.float32)
    y = adpcm.adpcm2_decode(adpcm.adpcm2_encode(x), n=x.size)
    assert np.max(np.abs(y)) <= 4 / 32768.0


def test_server_adpcm2_matches_float32_scores():
    """transfer_dtype='adpcm2' end-to-end (on-device 2-bit decode in the
    tick program): top-1 matches the float32 path; scores within the
    codec's (coarser) noise budget. Wire-native feed == incremental
    server-side encode, bit-exact."""
    import jax

    from mla_tpu.config import Config, ModelConfig
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.server import BatchedStreamingServer

    cfg = Config(
        name="adpcm2_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                          n_classes=7, n_blocks=2, hidden_units=32,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)

    chunk = BatchedStreamingServer(cfg, variables, max_streams=2,
                                   chunk_patches=2).chunk_samples
    n = 2 * chunk + chunk // 3
    t = np.arange(n) / cfg.frontend.sample_rate
    x = np.clip(0.4 * np.sin(2 * np.pi * 440 * t)
                + 0.1 * rng.standard_normal(n), -1, 1).astype(np.float32)

    def run(td):
        srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                     chunk_patches=2, transfer_dtype=td)
        sid = srv.open()
        srv.feed(sid, x)
        srv.drain()
        srv.flush(sid)
        return srv.scores(sid)

    ref = run("float32")
    got = run("adpcm2")
    assert int(np.argmax(ref)) == int(np.argmax(got))
    assert np.max(np.abs(ref - got)) < 0.1  # 2-bit noise budget

    whole = len(x) // adpcm.SERVE_BLOCK * adpcm.SERVE_BLOCK
    wire_bytes = adpcm.adpcm2_encode(
        np.asarray(np.clip(x[:whole], -1, 1) * 32767.0, np.int16),
        block=adpcm.SERVE_BLOCK)
    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=2, transfer_dtype="adpcm2")
    sid = srv.open()
    srv.feed(sid, wire_bytes, wire=True)
    srv.feed(sid, x[whole:])
    srv.drain()
    srv.flush(sid)
    np.testing.assert_array_equal(srv.scores(sid), got)


def test_server_adpcm2_flush_remainder_uses_2bit_encode():
    """flush() folds a sub-block sample remainder with the SERVER's codec.

    Regression: it called adpcm4_encode unconditionally, so an adpcm2
    server's flush appended 4-bit wire bytes (36/block) into the 2-bit
    buffer (20/block) — the tail decoded as byte salad. Hidden from the
    score tests because both compared runs shared the path. Here we
    capture the wire row flush dispatches and require it to decode
    bit-exactly as the direct 2-bit encode of the same samples."""
    import jax

    from mla_tpu.config import Config, ModelConfig
    from mla_tpu.data.audio_io import pcm16_quantize
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.serve.server import BatchedStreamingServer

    cfg = Config(
        name="adpcm2_flush_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                          n_classes=7, n_blocks=2, hidden_units=32,
                          conv_channels=(8, 16), convs_per_stage=1,
                          compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    rng = np.random.default_rng(5)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))[None],
        cfg.frontend)
    variables = model.init(jax.random.key(0), probe)

    srv = BatchedStreamingServer(cfg, variables, max_streams=1,
                                 chunk_patches=2, transfer_dtype="adpcm2")
    sid = srv.open()
    n = adpcm.SERVE_BLOCK // 2 + 5  # sub-block: all of it lands in _rem
    x = _program(seconds=1.0, seed=7)[:n]
    srv.feed(sid, x)
    assert len(srv._rem[sid]) == n and len(srv._bufs[sid]) == 0

    captured = {}
    orig = srv._dispatch

    def spy(wav, active, n_valid):
        captured["row"] = np.asarray(wav)[sid].copy()
        return orig(wav, active, n_valid)

    srv._dispatch = spy
    assert srv.flush(sid) is True
    wb = adpcm.wire_block_bytes(adpcm.SERVE_BLOCK, bits=2)
    got = adpcm.adpcm2_decode(captured["row"][:wb], n=adpcm.SERVE_BLOCK,
                              block=adpcm.SERVE_BLOCK)
    want = adpcm.adpcm2_decode(
        adpcm.adpcm2_encode(pcm16_quantize(x), block=adpcm.SERVE_BLOCK),
        n=adpcm.SERVE_BLOCK, block=adpcm.SERVE_BLOCK)
    np.testing.assert_array_equal(got[:n], want[:n])


def test_adpcm2_wire_format_golden_frozen():
    """Same cross-version wire contract as adpcm4's golden: encoder bytes
    and decoder reconstruction pinned for both block sizes. Version, do
    not refreeze, on intentional change."""
    import os

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "adpcm2_wire.npz"))
    x = g["x"]
    np.testing.assert_array_equal(adpcm.adpcm2_encode(x), g["wire256"])
    np.testing.assert_array_equal(
        adpcm.adpcm2_encode(x, block=adpcm.SERVE_BLOCK), g["wire64"])
    np.testing.assert_array_equal(
        adpcm.adpcm2_decode(g["wire256"], n=x.size), g["dec256"])
    np.testing.assert_array_equal(
        adpcm.adpcm2_decode(g["wire64"], n=x.size, block=adpcm.SERVE_BLOCK),
        g["dec64"])
