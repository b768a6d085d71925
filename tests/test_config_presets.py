"""Preset-consistency guards (round 5).

The flagship + serving presets run the INFERENCE front-end at the same
matmul precision the training step uses in-step ("default") — inferring
at HIGHEST while training at default was a train/serve numerics mismatch
(and a 2-pass GEMM penalty on the probed chip). The parity harness is
exempt: it builds its own FrontendConfig(), which stays "highest".
"""

from mla_tpu.config import FrontendConfig, get_config


def test_flagship_infer_matches_train_frontend_precision():
    cfg = get_config("audioset_full_dp")
    assert cfg.train.frontend_precision == "default"
    assert cfg.frontend.precision == "default"


def test_streaming_preset_uses_default_frontend_precision():
    assert get_config("streaming_inference").frontend.precision == "default"


def test_parity_default_frontendconfig_stays_highest():
    # the parity contract: a bare FrontendConfig pins HIGHEST so golden
    # comparisons are insensitive to TPU's reduced-precision default matmul
    assert FrontendConfig().precision == "highest"
