"""AOT export (serve/export.py): the serialized StableHLO artifact must
reproduce the live forward exactly, round-trip through disk, and enforce
its static shape contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, ModelConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.ops import frontend as fe
from mla_tpu.serve.export import export_forward, load_exported


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        name="export_test",
        model=ModelConfig(variant="multi_level_attention", trunk="cnn", n_classes=11,
                          n_blocks=2, hidden_units=48, conv_channels=(8, 16),
                          convs_per_stage=1, compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    wav = (np.random.default_rng(0).standard_normal((2, 32000)) * 0.1).astype(np.float32)
    patches = fe.waveform_to_patches(jnp.asarray(wav), cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    return cfg, model, variables, wav


def test_export_roundtrip_matches_live_forward(setup, tmp_path):
    cfg, model, variables, wav = setup
    path = str(tmp_path / "model.mlax")
    meta = export_forward(cfg, variables, path, batch=2, seconds=2.0,
                          platforms=("cpu",))
    assert meta["n_classes"] == 11 and meta["batch"] == 2
    fn = load_exported(path)
    assert fn.meta["format"] == "mla_tpu.export.v1"
    got = fn(wav)
    want = np.asarray(
        model.apply(variables, fe.waveform_to_patches(jnp.asarray(wav), cfg.frontend))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_rejects_wrong_shape(setup, tmp_path):
    cfg, _, variables, wav = setup
    path = str(tmp_path / "model.mlax")
    export_forward(cfg, variables, path, batch=2, seconds=2.0, platforms=("cpu",))
    fn = load_exported(path)
    with pytest.raises(ValueError, match="static-shaped"):
        fn(wav[:1])


def test_load_rejects_non_export(tmp_path):
    p = tmp_path / "junk.mlax"
    p.write_bytes(b"not an export")
    with pytest.raises(ValueError, match="magic"):
        load_exported(str(p))


def test_export_cli(setup, tmp_path, monkeypatch):
    from mla_tpu.__main__ import main

    out = str(tmp_path / "cli.mlax")
    main(["export", "--config=esc50_single_attention", "--checkpoint=random",
          f"--out={out}", "--batch=1", "--seconds=2",
          "--set", "model.conv_channels=8,16", "model.hidden_units=32"])
    fn = load_exported(out)
    wav = np.zeros((1, fn.meta["n_samples"]), np.float32)
    probs = fn(wav)
    assert probs.shape == (1, 50) and np.isfinite(probs).all()


def test_export_wire_format_inputs(setup, tmp_path):
    """input_dtype bakes the serving wire format into the artifact: PCM16
    and mu-law uint8 inputs expand INSIDE the compiled program and track
    the float32 artifact within quantization tolerance."""
    from mla_tpu.data.audio_io import mulaw_encode

    cfg, model, variables, wav = setup
    f32_path = str(tmp_path / "f32.mlax")
    export_forward(cfg, variables, f32_path, batch=2, seconds=2.0, platforms=("cpu",))
    want = load_exported(f32_path)(wav)

    p16 = str(tmp_path / "i16.mlax")
    meta = export_forward(cfg, variables, p16, batch=2, seconds=2.0,
                          platforms=("cpu",), input_dtype="int16")
    assert meta["input_dtype"] == "int16"
    fn16 = load_exported(p16)
    got16 = fn16(np.asarray(np.clip(wav, -1, 1) * 32767.0, np.int16))
    np.testing.assert_allclose(got16, want, atol=5e-3)

    pu8 = str(tmp_path / "u8.mlax")
    export_forward(cfg, variables, pu8, batch=2, seconds=2.0,
                   platforms=("cpu",), input_dtype="uint8")
    fnu8 = load_exported(pu8)
    got8 = fnu8(mulaw_encode(wav))
    np.testing.assert_allclose(got8, want, atol=5e-2)
    assert np.argmax(got8, 1).tolist() == np.argmax(want, 1).tolist()

    pa = str(tmp_path / "a4.mlax")
    from mla_tpu.data import adpcm as _ad

    meta_a = export_forward(cfg, variables, pa, batch=2, seconds=2.0,
                            platforms=("cpu",), input_dtype="adpcm4")
    assert meta_a["wire_length"] == _ad.wire_length(meta_a["n_samples"],
                                                    _ad.SERVE_BLOCK)
    fna = load_exported(pa)
    wire = _ad.adpcm4_encode(
        np.asarray(np.clip(wav, -1, 1) * 32767.0, np.int16),
        block=_ad.SERVE_BLOCK)
    gota = fna(wire)
    assert np.argmax(gota, 1).tolist() == np.argmax(want, 1).tolist()

    with pytest.raises(ValueError, match="input_dtype"):
        export_forward(cfg, variables, str(tmp_path / "x.mlax"),
                       platforms=("cpu",), input_dtype="int8")


def test_export_streaming_matches_live_tagger(setup, tmp_path):
    """The exported chunk-fold + finalize pair reproduces the in-process
    StreamingTagger (same chunking) through pure jax.export.call —
    including the final padded chunk masked via n_valid."""
    from mla_tpu.serve.export import export_streaming, load_exported_streaming
    from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches

    cfg, model, variables, _ = setup
    path = str(tmp_path / "stream.mlax")
    meta = export_streaming(cfg, variables, path, streams=1,
                            chunk_patches=2, platforms=("cpu",))
    art = load_exported_streaming(path)
    assert art.meta["chunk_samples"] == meta["chunk_samples"]

    rng = np.random.default_rng(3)
    n = _samples_per_patches(cfg.frontend, 5)  # 2 full chunks + 1 patch
    wav = (rng.standard_normal(n) * 0.3).astype(np.float32)

    ref = StreamingTagger(cfg, variables, chunk_patches=2)
    ref.feed(wav)
    ref.flush()

    states = art.init_state()
    cs, hop = meta["chunk_samples"], meta["hop_samples"]
    off = 0
    while off + cs <= len(wav):
        states = art.chunk(states, wav[off: off + cs][None])
        off += hop
    # final partial chunk: pad, mask to its whole-patch count (here 1)
    tail = np.zeros(cs, np.float32)
    rem = wav[off:]
    tail[: len(rem)] = rem
    states = art.chunk(states, tail[None], n_valid=np.array([1], np.int32))
    got = art.finalize(states)[0]
    np.testing.assert_allclose(got, ref.scores(), rtol=1e-4, atol=1e-5)


def test_export_streaming_adpcm4_wire(setup, tmp_path):
    """adpcm4 wire-input streaming export: wire blocks in, decode baked
    into the chunk program; matches a live adpcm4 server on the same
    bytes."""
    from mla_tpu.data import adpcm
    from mla_tpu.data.audio_io import pcm16_quantize
    from mla_tpu.serve.export import export_streaming, load_exported_streaming
    from mla_tpu.serve.server import BatchedStreamingServer

    cfg, model, variables, _ = setup
    path = str(tmp_path / "stream_a4.mlax")
    meta = export_streaming(cfg, variables, path, streams=1,
                            chunk_patches=5, platforms=("cpu",),
                            input_dtype="adpcm4")
    art = load_exported_streaming(path)
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(meta["chunk_samples"]) * 0.3).astype(np.float32)
    wire = adpcm.adpcm4_encode(pcm16_quantize(wav), block=adpcm.SERVE_BLOCK)
    assert len(wire) == meta["wire_length"]

    states = art.chunk(art.init_state(), wire[None])
    got = art.finalize(states)[0]

    srv = BatchedStreamingServer(cfg, variables, max_streams=1,
                                 chunk_patches=5, transfer_dtype="adpcm4")
    sid = srv.open()
    srv.feed(sid, wire, wire=True)
    srv.tick()
    np.testing.assert_allclose(got, srv.scores(sid), rtol=1e-5, atol=1e-6)


def test_export_streaming_cli_and_loader_dispatch(setup, tmp_path, monkeypatch):
    from mla_tpu.__main__ import main
    from mla_tpu.serve.export import load_exported, load_exported_streaming

    cfg, model, variables, _ = setup
    import mla_tpu.__main__ as cli

    monkeypatch.setattr(cli, "_load_variables",
                        lambda args, cfg2, **kw: variables)
    monkeypatch.setattr(cli, "_load_cfg", lambda args: cfg)
    out = str(tmp_path / "s.mlax")
    main(["export", "--out", out, "--streaming", "--batch=1",
          "--chunk_patches=2"])
    art = load_exported_streaming(out)
    assert art.meta["variant"] == "multi_level_attention"
    with pytest.raises(ValueError, match="streaming artifact"):
        load_exported(out)


def test_export_streaming_timeline_at_edge(setup, tmp_path):
    """timeline_cap exports: the ring folds inside the portable chunk
    program and the loader's timeline() matches the live tagger's."""
    from mla_tpu.serve.export import export_streaming, load_exported_streaming
    from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches

    cfg, model, variables, _ = setup
    path = str(tmp_path / "stream_tl.mlax")
    meta = export_streaming(cfg, variables, path, streams=1,
                            chunk_patches=2, platforms=("cpu",),
                            timeline_cap=8)
    assert meta["timeline_cap"] == 8
    art = load_exported_streaming(path)

    rng = np.random.default_rng(11)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 4)) * 0.3).astype(np.float32)
    ref = StreamingTagger(cfg, variables, chunk_patches=2, timeline_cap=8)
    ref.feed(wav)
    ref.flush()
    want_start, want_levels = ref.timeline()

    state = art.init_state()
    cs, hop = meta["chunk_samples"], meta["hop_samples"]
    off = 0
    while off + cs <= len(wav):
        state = art.chunk(state, wav[off: off + cs][None])
        off += hop
    start, levels = art.timeline(state)
    assert start == want_start and len(levels) == len(want_levels)
    for (w, f), (ww, wf) in zip(levels, want_levels):
        np.testing.assert_allclose(w, ww, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f, wf, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(art.finalize(state)[0], ref.scores(),
                               rtol=1e-4, atol=1e-5)


def test_edge_surface_is_flax_free(setup, tmp_path):
    """The export docstring's deployment claim — the edge needs 'only jax
    installed' — holds for the WHOLE artifact surface: loading, chunk,
    finalize, AND the timeline readout must not pull flax (ADVICE r3:
    timeline used to route through serve.streaming -> models.zoo -> flax,
    and serve/__init__ imported streaming eagerly)."""
    import subprocess
    import sys

    from mla_tpu.serve.export import export_streaming
    from mla_tpu.serve.streaming import _samples_per_patches

    cfg, model, variables, _ = setup
    path = str(tmp_path / "edge.mlax")
    meta = export_streaming(cfg, variables, path, streams=1, chunk_patches=2,
                            platforms=("cpu",), timeline_cap=8)
    n = _samples_per_patches(cfg.frontend, 2)
    code = f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mla_tpu.serve.export import load_exported_streaming
art = load_exported_streaming({path!r})
state = art.init_state()
wav = np.zeros((1, {n}), np.float32)
state = art.chunk(state, wav)
scores = art.finalize(state)
start, levels = art.timeline(state)
evs = art.events(state, threshold=0.0)
assert scores.shape == (1, {meta["n_classes"]}), scores.shape
assert len(evs) == {meta["n_classes"]}, len(evs)  # thr 0: one per class
assert all(e["t_start"] == 0.0 for e in evs)
assert "flax" not in sys.modules, "edge path imported flax"
print("EDGE_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "EDGE_OK" in r.stdout
