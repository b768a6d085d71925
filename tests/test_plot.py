"""Timeline figure rendering (utils/plot.py + infer --plot): the paper's
attention-curve qualitative analysis as a product surface. Rendering is
checked structurally (a real PNG of plausible size, panel math, input
validation) — pixel content is not asserted."""

import dataclasses
import os

import numpy as np
import pytest

from mla_tpu.utils import plot as uplot


def _fake_tl(t=20, c=3, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.random((t, c)).astype(np.float32)
    w = rng.random((t, c)).astype(np.float32)
    w /= w.sum(axis=0, keepdims=True)  # gates sum to 1 over patches
    return f, w


def _assert_png(path, min_bytes=10_000):
    assert os.path.exists(path)
    with open(path, "rb") as fh:
        head = fh.read(8)
    assert head == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > min_bytes


def test_plot_timeline_writes_png(tmp_path):
    f, w = _fake_tl()
    out = str(tmp_path / "tl.png")
    got = uplot.plot_timeline(out, 0.96, ["a", "b", "c"], f, w)
    assert got == out
    _assert_png(out)


def test_plot_with_mel_panel_and_series_cap(tmp_path):
    t, c = 10, 8  # more series than the fixed palette: must cap, not cycle
    f, w = _fake_tl(t, c)
    mel = np.random.default_rng(1).random((t * 96, 64)).astype(np.float32)
    out = str(tmp_path / "tl_mel.png")
    uplot.plot_timeline(out, 0.96, [f"c{i}" for i in range(c)], f, w,
                        mel=mel, mel_hop_s=0.010)
    _assert_png(out)


def test_plot_shape_and_mel_validation(tmp_path):
    f, w = _fake_tl()
    with pytest.raises(ValueError, match="T, C"):
        uplot.plot_timeline(str(tmp_path / "x.png"), 0.96, ["a"],
                            f, w[:-1])
    with pytest.raises(ValueError, match="mel_hop_s"):
        uplot.plot_timeline(str(tmp_path / "x.png"), 0.96,
                            ["a", "b", "c"], f, w,
                            mel=np.zeros((96, 64)))


def test_continuous_mel_requires_non_overlapping_patches():
    from mla_tpu.config import FrontendConfig

    patches = np.arange(2 * 96 * 64, dtype=np.float32).reshape(2, 96, 64)
    cfg = FrontendConfig()
    mel = uplot.continuous_mel(patches, cfg)
    assert mel.shape == (192, 64)
    # tiling must preserve time order exactly
    np.testing.assert_array_equal(mel[:96], patches[0])
    np.testing.assert_array_equal(mel[96:], patches[1])
    overlapped = dataclasses.replace(cfg, example_hop_seconds=0.48)
    assert uplot.continuous_mel(patches, overlapped) is None


def test_cli_infer_plot(tmp_path, capsys):
    """End-to-end: random-weight infer over a generated wav writes the
    figure (and the usual top-k JSON)."""
    import wave as wavemod

    from mla_tpu.__main__ import main

    sr = 16000
    t = np.arange(sr * 2) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.3 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "tone.wav")
    with wavemod.open(wav_path, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(pcm.tobytes())
    png = str(tmp_path / "fig.png")
    rc = main(["infer", "--config=streaming_inference", "--wav", wav_path,
               "--checkpoint=random", "--plot", png,
               "--workspace", str(tmp_path)])
    assert not rc
    _assert_png(png)
    assert "top_k" in capsys.readouterr().out


def test_cli_plot_rejected_in_batch_mode(tmp_path):
    from mla_tpu.__main__ import main

    with pytest.raises(SystemExit, match="single-clip"):
        main(["infer", "--config=streaming_inference",
              "--wav_dir", str(tmp_path), "--plot", "x.png"])
