"""Fused Pallas front-end kernel (T1) parity tests — interpret mode on the
CPU harness (SURVEY.md §7 risk (e): every kernel stays CPU-fallback-capable);
the same kernel is exercised compiled on the real TPU by bench_frontend.py
and the us8k_fused_frontend config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import FrontendConfig
from mla_tpu.ops.frontend import apply_frontend, waveform_to_patches
from mla_tpu.ops.pallas_frontend import (
    frontend_bytes_moved,
    fused_log_mel_patches,
)
from tests.oracle import frontend_oracle as oracle

CFG = FrontendConfig()


def test_kernel_matches_oracle(rng):
    wav = (rng.standard_normal((2, 160000)) * 0.1).astype(np.float32)
    out = np.asarray(fused_log_mel_patches(jnp.asarray(wav), CFG, interpret=True))
    ref = np.stack([oracle.waveform_to_examples(w) for w in wav])
    assert out.shape == ref.shape == (2, 10, 96, 64)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_kernel_matches_xla_path(rng):
    wav = (rng.standard_normal((3, 16000 * 3)) * 0.1).astype(np.float32)
    a = np.asarray(fused_log_mel_patches(jnp.asarray(wav), CFG, interpret=True))
    b = np.asarray(waveform_to_patches(jnp.asarray(wav), CFG))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_kernel_1d_input(rng):
    wav = (rng.standard_normal(160000) * 0.1).astype(np.float32)
    out = np.asarray(fused_log_mel_patches(jnp.asarray(wav), CFG, interpret=True))
    assert out.shape == (10, 96, 64)


def test_kernel_too_short_raises():
    with pytest.raises(ValueError, match="short"):
        fused_log_mel_patches(jnp.zeros((1, 1000)), CFG, interpret=True)


def test_apply_frontend_dispatch(rng):
    wav = jnp.asarray((rng.standard_normal((2, 16000 * 2)) * 0.1).astype(np.float32))
    pall = dataclasses.replace(CFG, impl="pallas")
    a = np.asarray(apply_frontend(wav, pall))  # interpret fallback on CPU
    b = np.asarray(apply_frontend(wav, CFG))
    np.testing.assert_allclose(a, b, atol=2e-4)
    with pytest.raises(ValueError, match="impl"):
        apply_frontend(wav, dataclasses.replace(CFG, impl="nope"))


def test_kernel_inside_jit_grad_program(rng):
    """The kernel must compose with jit (it's called inside the train step).
    No custom VJP is needed: gradients flow to model params only — the
    front-end is a data transform; check jit composition here."""
    wav = jnp.asarray((rng.standard_normal((2, 16000 * 2)) * 0.1).astype(np.float32))

    @jax.jit
    def f(w):
        return jnp.sum(fused_log_mel_patches(w, CFG, interpret=True))

    assert np.isfinite(float(f(wav)))


def test_bytes_moved_accounting():
    # g=3 residue-class views of 960 frames x 160-sample hop blocks in,
    # 960x64 log-mel rows out
    b = frontend_bytes_moved(4, 160000, CFG)
    assert b == 4 * (3 * 960 * 160 * 4 + 960 * 64 * 4)


def test_kernel_bf16x3_precision(rng):
    """The split-GEMM mode stays inside a 5e-4 budget (worst case observed
    ~3e-4 on log-mel values near the log floor; the full-parity mode is
    "highest" at ~1e-4)."""
    wav = (rng.standard_normal((2, 160000)) * 0.1).astype(np.float32)
    out = np.asarray(
        fused_log_mel_patches(jnp.asarray(wav), CFG, precision="bf16x3", interpret=True)
    )
    ref = np.stack([oracle.waveform_to_examples(w) for w in wav])
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_xla_path_bf16x3_precision(rng):
    import dataclasses as dc

    wav = (rng.standard_normal((2, 160000)) * 0.1).astype(np.float32)
    cfg3 = dc.replace(CFG, precision="bf16x3")
    out = np.asarray(waveform_to_patches(jnp.asarray(wav), cfg3))
    ref = np.stack([oracle.waveform_to_examples(w) for w in wav])
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_kernel_non_default_geometry(rng):
    """used_frames not divisible by g exercises the frame-padding path
    (0.5 s patches -> 50-frame windows; 7 patches -> 350 frames, 350 % 3 != 0)."""
    import dataclasses as dc

    cfg = dc.replace(CFG, example_window_seconds=0.50, example_hop_seconds=0.50)
    wav = (rng.standard_normal((2, 16000 * 4)) * 0.1).astype(np.float32)
    a = np.asarray(fused_log_mel_patches(jnp.asarray(wav), cfg, interpret=True))
    b = np.asarray(waveform_to_patches(jnp.asarray(wav), cfg))
    np.testing.assert_allclose(a, b, atol=2e-4)
