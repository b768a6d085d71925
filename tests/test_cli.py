"""CLI tests (C17): the reference's public verbs through python -m mla_tpu."""

import json
import os

import numpy as np
import pytest

from mla_tpu.__main__ import main
from mla_tpu.data import audio_io


def test_configs_lists(capsys):
    main(["configs"])
    out = capsys.readouterr().out
    assert "esc50_single_attention" in out and "audioset_full_dp" in out


def test_prep_packs_hdf5(tmp_path, capsys):
    out = str(tmp_path / "pack.h5")
    main(["prep", "--config", "audioset_multi_level", "--out", out,
          "--set", "data.n_train_clips=6"])
    assert os.path.exists(out)
    from mla_tpu.data.hdf5 import load_data

    x, y, ids = load_data(out)
    assert x.shape[0] == 6 and y.shape == (6, 527)


def test_extract_wav_to_patches(tmp_path, capsys):
    wav = (np.random.default_rng(0).standard_normal(16000 * 2) * 0.1).astype(np.float32)
    wp = str(tmp_path / "a.wav")
    audio_io.write_wav(wp, wav)
    out = str(tmp_path / "patches.npy")
    main(["extract", "--wav", wp, "--out", out])
    patches = np.load(out)
    assert patches.shape[1:] == (96, 64) and patches.shape[0] == 2


def test_train_then_eval_cli(tmp_path, capsys):
    args = ["--config", "esc50_single_attention",
            "--workspace", str(tmp_path),
            "--set", "train.num_steps=6", "train.batch_size=8", "train.eval_every=6",
            "train.checkpoint_every=6", "data.n_train_clips=16", "data.n_eval_clips=8",
            "data.clip_seconds=1.5", "model.conv_channels=8", "model.convs_per_stage=1",
            "model.hidden_units=32", "train.data_parallel=1"]
    main(["train"] + args)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "final_loss" in out and np.isfinite(out["final_loss"])
    main(["eval"] + args)
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mAP" in stats


def test_infer_cli(tmp_path, capsys):
    wav = (np.random.default_rng(1).standard_normal(16000 * 12) * 0.1).astype(np.float32)
    wp = str(tmp_path / "b.wav")
    audio_io.write_wav(wp, wav)
    common = ["--config", "streaming_inference", "--wav", wp,
              "--set", "model.conv_channels=8", "model.convs_per_stage=1",
              "model.hidden_units=32", "model.n_classes=20", "model.n_blocks=2"]
    main(["infer"] + common)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["top_k"]) == 5
    main(["infer", "--stream"] + common)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out2["top_k"]) == 5


def test_profile_cli(tmp_path, capsys):
    import json
    import os

    from mla_tpu.__main__ import main

    out = str(tmp_path / "trace")
    main(["profile", "--config=esc50_single_attention", f"--out={out}",
          "--steps=2", "--batch=2",
          "--set", "model.conv_channels=8", "model.hidden_units=16",
          "data.n_train_clips=4", "data.clip_seconds=2.0"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["steps"] == 2 and rep["mean_step_ms"] > 0
    # the trace dump actually landed on disk
    found = [f for _, _, fs in os.walk(out) for f in fs]
    assert found, "profiler trace produced no files"


def test_weights_export_import_roundtrip(tmp_path, capsys):
    """weights --out / --load: bare-weight interchange reproduces scores."""
    import jax
    import numpy as np

    from mla_tpu.__main__ import main

    common = ["--config=esc50_single_attention", "--set",
              "model.conv_channels=8", "model.hidden_units=16",
              "data.n_train_clips=8", "data.n_eval_clips=4",
              "data.clip_seconds=2.0", "train.batch_size=8", "train.data_parallel=1",
              "train.num_steps=4", "train.eval_every=4",
              "train.checkpoint_every=4", "train.log_every=2"]
    ws_a, ws_b = str(tmp_path / "a"), str(tmp_path / "b")
    main(["train", f"--workspace={ws_a}"] + common)
    npz = str(tmp_path / "w.npz")
    main(["weights", f"--workspace={ws_a}", f"--out={npz}"] + common)
    assert "weight arrays" in capsys.readouterr().out
    main(["weights", f"--workspace={ws_b}", f"--load={npz}"] + common)
    # the imported checkpoint must reproduce the trained params exactly
    from mla_tpu.config import get_config
    from mla_tpu.train.loop import resume

    def overrides(args):
        return {p.split("=")[0]: p.split("=", 1)[1] for p in args}

    cfg = get_config("esc50_single_attention", overrides(common[2:]))
    sa, _ = resume(cfg, ws_a)
    sb, _ = resume(cfg, ws_b)
    same = jax.tree.map(lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
                        sa.params, sb.params)
    assert all(jax.tree.leaves(same))
    # BatchNorm running stats ride along too (weights alone predict garbage)
    same_bn = jax.tree.map(lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
                           sa.batch_stats, sb.batch_stats)
    assert all(jax.tree.leaves(same_bn)) and jax.tree.leaves(sa.batch_stats)


def test_weights_partial_warm_start(tmp_path, capsys):
    """weights --load --allow_partial: transfer learning — the pretrained
    trunk imports, shape-mismatched heads (different class count) keep
    their fresh init instead of erroring."""
    import jax
    import numpy as np

    from mla_tpu.__main__ import main

    base = ["--set", "model.conv_channels=8", "model.hidden_units=16",
            "data.n_train_clips=8", "data.n_eval_clips=4",
            "data.clip_seconds=2.0", "train.batch_size=8", "train.data_parallel=1",
            "train.num_steps=4", "train.eval_every=4",
            "train.checkpoint_every=4", "train.log_every=2"]
    src = ["--config=esc50_single_attention"] + base
    ws_a, ws_b = str(tmp_path / "a"), str(tmp_path / "b")
    main(["train", f"--workspace={ws_a}"] + src)
    npz = str(tmp_path / "w.npz")
    main(["weights", f"--workspace={ws_a}", f"--out={npz}"] + src)
    capsys.readouterr()

    # import into a DIFFERENT class count: head shapes mismatch, trunk matches
    dst = ["--config=esc50_single_attention"] + base[:1] + [
        "model.n_classes=7"] + base[1:]
    import pytest as _pytest

    with _pytest.raises(SystemExit):  # strict mode still refuses
        main(["weights", f"--workspace={ws_b}", f"--load={npz}"] + dst)
    main(["weights", f"--workspace={ws_b}", f"--load={npz}", "--allow_partial"] + dst)
    out = capsys.readouterr().out
    assert "imported" in out

    from mla_tpu.config import get_config
    from mla_tpu.train.loop import resume

    def overrides(args):
        return {p.split("=")[0]: p.split("=", 1)[1] for p in args}

    cfg_a = get_config("esc50_single_attention", overrides(src[2:]))
    cfg_b = get_config("esc50_single_attention", overrides(dst[2:]))
    sa, _ = resume(cfg_a, ws_a)
    sb, _ = resume(cfg_b, ws_b)
    # trunk transferred exactly
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(sa.params["trunk_module"])[0]),
        np.asarray(jax.tree.leaves(sb.params["trunk_module"])[0]),
    )
    # head shapes follow the NEW config (fresh init, 7 classes)
    head_shapes = {tuple(np.shape(l)) for l in jax.tree.leaves(sb.params)}
    assert any(s[-1] == 7 for s in head_shapes if s)


def test_summary_verb(capsys):
    """summary: the reference family's Keras model.summary() role —
    per-module table with a correct total (shape-only, no weights)."""
    from mla_tpu.__main__ import main

    main(["summary", "--config=esc50_single_attention",
          "--set", "model.conv_channels=8,16", "model.hidden_units=32"])
    out = capsys.readouterr().out
    assert "TOTAL params" in out and "trunk_module" in out
    total = int(next(l for l in out.splitlines() if "TOTAL" in l)
                .split()[-1].replace(",", ""))
    import jax

    from mla_tpu.config import get_config
    from mla_tpu.models.zoo import build_model, example_input
    from mla_tpu.train.state import create_train_state

    cfg = get_config("esc50_single_attention",
                     {"model.conv_channels": "8,16", "model.hidden_units": "32"})
    st = jax.eval_shape(lambda: create_train_state(
        cfg, build_model(cfg.model), example_input(cfg.model)))
    want = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(dict(st.params)))
    assert total == want


def test_infer_wav_dir_batch(tmp_path, capsys):
    """infer --wav_dir: one JSONL line per clip, any lengths, shared
    streaming program; matches single-clip infer on the same file."""
    import wave

    import numpy as np

    from mla_tpu.__main__ import main

    sr = 16000
    rng = np.random.default_rng(3)
    for name, secs in [("a.wav", 1.5), ("sub/b.wav", 3.0)]:
        p = tmp_path / "clips" / name
        p.parent.mkdir(parents=True, exist_ok=True)
        x = (0.3 * rng.standard_normal(int(sr * secs))).astype(np.float32)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((x * 32767).astype("<i2").tobytes())
    main(["infer", "--config=esc50_single_attention",
          "--wav_dir", str(tmp_path / "clips"), "--checkpoint=random",
          "--top_k=2"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert lines[0]["wav"].endswith("a.wav") and lines[0]["seconds"] == 1.5
    assert lines[1]["wav"].endswith("sub/b.wav")
    assert all(len(ln["top_k"]) == 2 for ln in lines)

    # single-clip streaming infer on the same file gives the same top-k
    main(["infer", "--config=esc50_single_attention", "--stream",
          "--wav", str(tmp_path / "clips" / "a.wav"), "--checkpoint=random",
          "--top_k=2"])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [n for n, _ in single["top_k"]] == [n for n, _ in lines[0]["top_k"]]
    for (_, p1), (_, p2) in zip(single["top_k"], lines[0]["top_k"]):
        assert abs(p1 - p2) < 1e-4
