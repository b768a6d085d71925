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
