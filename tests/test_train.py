"""Integration: config-1-style end-to-end training on CPU (SURVEY.md §4
"Integration" row) — loss decreases, mAP above chance, checkpoint
round-trips, resume is deterministic."""

import dataclasses
import os

import numpy as np
import pytest

from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, get_config
from mla_tpu.train.loop import fit, resume


def _tiny_cfg(tmp_path, variant="single_attention", trunk="none", steps=60) -> Config:
    return Config(
        name=f"test_{variant}_{trunk}",
        workspace=str(tmp_path),
        model=ModelConfig(
            variant=variant,
            trunk=trunk,
            n_classes=8,
            n_blocks=2,
            hidden_units=64,
            conv_channels=(8, 16),
            convs_per_stage=1,
            dropout_rate=0.2,
            compute_dtype="float32",
        ),
        data=DataConfig(dataset="synthetic_audioset", n_train_clips=64, n_eval_clips=32,
                        clip_seconds=2.0),
        train=TrainConfig(batch_size=16, num_steps=steps, eval_every=steps,
                          checkpoint_every=steps, log_every=10, learning_rate=3e-3,
                          data_parallel=1),
    )


def test_fit_features_loss_decreases_and_beats_chance(tmp_path):
    cfg = _tiny_cfg(tmp_path, variant="multi_level_attention", trunk="none")
    res = fit(cfg, log=False)
    losses = [h["loss"] for h in res.history]
    assert losses[-1] < losses[0] * 0.8, losses
    stats = res.eval_stats[-1]
    # 8 classes, ~2 active/clip -> chance mAP ~ 0.25; trained should clear it
    assert stats["mAP"] > 0.4, stats
    assert np.isfinite(stats["d_prime"])


def test_fit_waveform_cnn_runs(tmp_path):
    cfg = _tiny_cfg(tmp_path, variant="single_attention", trunk="cnn", steps=12)
    res = fit(cfg, log=False)
    assert len(res.history) >= 1
    assert np.isfinite(res.history[-1]["loss"])


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path, variant="single_attention", trunk="none", steps=30)
    res = fit(cfg, log=False)
    state, sampler_state = resume(cfg)
    assert int(state.step) == 30
    assert sampler_state is not None and sampler_state["step"] == 30
    # params equal the in-memory final state
    import jax

    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), res.state.params, state.params
    )
    assert all(jax.tree.leaves(same))


def test_fit_dp8_matches_dp1_losses(tmp_path):
    """DP gradient equivalence (SURVEY.md §4): same seeds, 1 vs 8 devices,
    same loss trajectory."""
    cfg1 = dataclasses.replace(
        _tiny_cfg(tmp_path / "a", steps=10),
        train=TrainConfig(batch_size=16, num_steps=10, eval_every=100, log_every=1,
                          checkpoint_every=100, data_parallel=1),
    )
    cfg8 = dataclasses.replace(cfg1, workspace=str(tmp_path / "b"),
                               train=dataclasses.replace(cfg1.train, data_parallel=-1))
    l1 = [h["loss"] for h in fit(cfg1, log=False).history]
    l8 = [h["loss"] for h in fit(cfg8, log=False).history]
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=1e-5)


def test_fit_waveform_pallas_frontend(tmp_path):
    """us8k-config path: fused Pallas front-end (interpret mode on CPU)
    inside the jitted train step."""
    cfg = _tiny_cfg(tmp_path, variant="single_attention", trunk="cnn", steps=4)
    cfg = dataclasses.replace(
        cfg,
        frontend=dataclasses.replace(cfg.frontend, impl="pallas"),
        data=dataclasses.replace(cfg.data, n_train_clips=16, n_eval_clips=8,
                                 clip_seconds=2.0),
        train=dataclasses.replace(cfg.train, batch_size=4, num_steps=4, eval_every=4,
                                  checkpoint_every=4, log_every=2),
    )
    res = fit(cfg, log=False)
    assert np.isfinite(res.history[-1]["loss"])


def test_fit_with_grain_pipeline(tmp_path):
    """T9 as the training input path: grain stream drives fit; resume is
    deterministic (stateless stream restarts at the step index)."""
    cfg = _tiny_cfg(tmp_path, variant="single_attention", trunk="none", steps=20)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, pipeline="grain"))
    res = fit(cfg, log=False)
    losses = [h["loss"] for h in res.history]
    assert losses[-1] < losses[0]
    # interrupted at 10 + resumed == uninterrupted 20
    cfg10 = dataclasses.replace(
        cfg, workspace=str(tmp_path / "g10"),
        train=dataclasses.replace(cfg.train, num_steps=10, checkpoint_every=10),
    )
    fit(cfg10, log=False)
    cfg20 = dataclasses.replace(cfg10, train=dataclasses.replace(cfg10.train, num_steps=20))
    resumed = fit(cfg20, log=False, auto_resume=True)
    import jax

    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        resumed.state.params, res.state.params,
    )
    assert all(jax.tree.leaves(same))


def test_restore_checkpoint_without_sampler_item(tmp_path):
    """A checkpoint saved with sampler_state=None must still restore
    (ADVICE.md round 1, medium: Orbax raised KeyError for the absent item)."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.models.zoo import build_model
    from mla_tpu.train.checkpoint import CheckpointManager
    from mla_tpu.train.state import create_train_state

    cfg = _tiny_cfg(tmp_path, trunk="none", steps=1)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model, jnp.zeros((2, 10, 128), jnp.float32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(1, state, sampler_state=None)
    mgr.wait()
    abstract = jax.eval_shape(lambda: state)
    restored, sampler_st = mgr.restore(abstract)
    assert sampler_st is None
    assert int(restored.step) == int(state.step)
    mgr.close()


def test_fit_random_sampling_resume_matches_uninterrupted(tmp_path):
    """balanced_sampling=False path: the host rng's bit-generator state is
    checkpointed, so interrupted+resumed == uninterrupted (ADVICE.md r1)."""
    import jax

    base = _tiny_cfg(tmp_path / "full", variant="single_attention", trunk="none", steps=20)
    base = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, balanced_sampling=False),
        train=dataclasses.replace(base.train, checkpoint_every=10, eval_every=100),
    )
    full = fit(base, log=False)
    cfg10 = dataclasses.replace(
        base, workspace=str(tmp_path / "resumed"),
        train=dataclasses.replace(base.train, num_steps=10),
    )
    fit(cfg10, log=False)
    cfg20 = dataclasses.replace(cfg10, train=dataclasses.replace(cfg10.train, num_steps=20))
    resumed = fit(cfg20, log=False, auto_resume=True)
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        resumed.state.params, full.state.params,
    )
    assert all(jax.tree.leaves(same))


def test_device_resident_matches_host_feed(tmp_path):
    """HBM-resident dataset + on-device batch gather must reproduce the
    host-feed loss trajectory exactly (same sampler indices, same math)."""
    base = _tiny_cfg(tmp_path / "host", steps=8)
    base = dataclasses.replace(
        base, train=dataclasses.replace(base.train, log_every=1, eval_every=100,
                                        checkpoint_every=100),
    )
    host_cfg = dataclasses.replace(
        base, data=dataclasses.replace(base.data, device_resident=False))
    dev_cfg = dataclasses.replace(base, workspace=str(tmp_path / "dev"))
    assert dev_cfg.data.device_resident  # the default
    l_host = [h["loss"] for h in fit(host_cfg, log=False).history]
    l_dev = [h["loss"] for h in fit(dev_cfg, log=False).history]
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-6, atol=1e-7)


def test_device_resident_eval_matches_host_eval(tmp_path):
    """Device-resident eval slices must give identical metrics, including
    the shifted last partial window."""
    cfg = _tiny_cfg(tmp_path, steps=4)
    # eval set of 18 with batch 16 -> one full window + a shifted partial
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, n_eval_clips=18),
        train=dataclasses.replace(cfg.train, eval_every=4, checkpoint_every=100),
    )
    host = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, device_resident=False))
    s_dev = fit(cfg, log=False).eval_stats[-1]
    s_host = fit(dataclasses.replace(host, workspace=str(tmp_path / "h")),
                 log=False).eval_stats[-1]
    for k in ("mAP", "mAUC"):
        np.testing.assert_allclose(s_dev[k], s_host[k], rtol=1e-6)


def test_device_resident_skipped_over_budget(tmp_path):
    """Datasets over the byte budget fall back to host feeding."""
    cfg = _tiny_cfg(tmp_path, steps=4)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, device_resident_max_bytes=1),
        train=dataclasses.replace(cfg.train, eval_every=100, checkpoint_every=100),
    )
    res = fit(cfg, log=False)  # must still train, just via host feed
    assert np.isfinite(res.history[-1]["loss"])


def test_batch_size_must_divide_dp(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, batch_size=9,
                                                             data_parallel=-1))
    with pytest.raises(ValueError, match="divisible"):
        fit(cfg, log=False)


def test_scalar_log_written(tmp_path):
    cfg = _tiny_cfg(tmp_path, steps=10)
    fit(cfg, log=False)
    assert os.path.exists(os.path.join(str(tmp_path), "scalars.csv"))


def test_request_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """Graceful preemption (SURVEY.md §5 failure-recovery row): a preempt
    request makes fit() finish the in-flight step, checkpoint, and return
    interrupted=True; auto_resume then reproduces an uninterrupted run.
    The request fires deterministically from inside step 5's scalar write
    (a probe thread racing the loop flaked on fast machines)."""
    from mla_tpu.train import loop as tl

    cfg = _tiny_cfg(tmp_path / "pre", steps=40)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, log_every=1, eval_every=40,
                                       checkpoint_every=0),
    )
    orig_write = tl.ScalarWriter.write

    def write_then_preempt(self, step, scalars):
        orig_write(self, step, scalars)
        if step == 5:
            tl.request_preemption()

    monkeypatch.setattr(tl.ScalarWriter, "write", write_then_preempt)
    res = fit(cfg, log=False)
    monkeypatch.setattr(tl.ScalarWriter, "write", orig_write)
    assert res.interrupted is True
    s = res.history[-1]["step"]
    assert s == 5  # flag set during step 5's write, checked at step end

    # resumed run continues from s and matches an uninterrupted run
    total = s + 3
    cfg_resume = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_steps=total, log_every=1,
                                       eval_every=total, checkpoint_every=0),
    )
    res2 = fit(cfg_resume, log=False, auto_resume=True)
    assert res2.interrupted is False
    assert [h["step"] for h in res2.history] == [s + 1, s + 2, s + 3]

    cfg_ref = dataclasses.replace(
        cfg_resume, workspace=str(tmp_path / "ref"),
    )
    ref = fit(cfg_ref, log=False)
    ref_tail = [h["loss"] for h in ref.history if h["step"] > s]
    np.testing.assert_allclose([h["loss"] for h in res2.history], ref_tail,
                               rtol=1e-5, atol=1e-6)


def test_sigterm_preempts_subprocess(tmp_path):
    """A REAL SIGTERM to a training process triggers the checkpoint-and-exit
    path (exit 0, interrupted flag, checkpoint on disk at the last step)."""
    import json
    import signal as _signal
    import subprocess
    import sys
    import time as _t

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ws = str(tmp_path / "ws")
    child = (
        "import json, sys\n"
        "from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig\n"
        "from mla_tpu.train.loop import fit\n"
        "cfg = Config(name='sigterm_test', workspace=sys.argv[1],\n"
        "    model=ModelConfig(variant='single_attention', trunk='none', n_classes=8,\n"
        "                      n_blocks=1, hidden_units=32, compute_dtype='float32'),\n"
        "    data=DataConfig(dataset='synthetic_audioset', n_train_clips=64,\n"
        "                    n_eval_clips=16, clip_seconds=2.0),\n"
        "    train=TrainConfig(batch_size=16, num_steps=10**7, log_every=1,\n"
        "                      eval_every=10**7, checkpoint_every=0, data_parallel=1))\n"
        "res = fit(cfg, log=False)\n"
        "print(json.dumps({'interrupted': res.interrupted,\n"
        "                  'last_step': res.history[-1]['step']}))\n"
    )
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
    }
    p = subprocess.Popen([sys.executable, "-u", "-c", child, ws], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    scalars = os.path.join(ws, "scalars.csv")
    deadline = _t.time() + 180
    while _t.time() < deadline:
        if os.path.exists(scalars) and sum(1 for _ in open(scalars)) > 4:
            break
        if p.poll() is not None:
            raise AssertionError(f"child died early: {p.communicate()[1][-800:]}")
        _t.sleep(0.05)
    else:
        p.kill()
        raise AssertionError("child made no progress before deadline")
    p.send_signal(_signal.SIGTERM)
    out, err = p.communicate(timeout=180)
    assert p.returncode == 0, err[-800:]
    rec = json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1])
    assert rec["interrupted"] is True

    from mla_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(ws, "checkpoints", "sigterm_test"))
    assert mgr.latest_step() == rec["last_step"]


def test_tensorboard_scalar_sink(tmp_path):
    """train.tensorboard=True writes TensorBoard event files next to the
    CSV (optional sink; SURVEY.md §5 observability row)."""
    pytest.importorskip("tensorflow")
    cfg = _tiny_cfg(tmp_path, steps=10)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, tensorboard=True))
    fit(cfg, log=False)
    tb_dir = os.path.join(str(tmp_path), "tensorboard", cfg.name)
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, os.listdir(tb_dir)
    assert os.path.getsize(os.path.join(tb_dir, events[0])) > 0
