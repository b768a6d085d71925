"""Test harness: run everything on a virtual 8-device CPU mesh (SURVEY.md §4
"distributed-without-a-cluster").

Gotcha (see .claude/skills/verify/SKILL.md): this environment loads the TPU
("axon") PJRT plugin from sitecustomize.py at interpreter startup, which
imports jax before conftest runs — so JAX_PLATFORMS set here via os.environ
is ignored. ``jax.config.update("jax_platforms", ...)`` works pre-backend-
init; XLA_FLAGS is read when the CPU client is created, which is still later.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This JAX build's default matmul precision is bf16 even for f32 operands;
# parity tests compare math, so pin full f32 here. Production code picks its
# own precision (bf16 compute_dtype in configs; HIGHEST in the front-end).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# --- quick lane (round-4 VERDICT weak item 6) -------------------------------
# The full suite is ~25 min on this 1-core host; `pytest -m quick` is the
# <5-min core-correctness lane (numerics, codecs, model oracles' unit peers,
# serving logic without subprocess/multiprocess integration). The FULL suite
# stays the merge gate. Membership is by module: integration modules that
# spawn processes, train for many steps, or drive HTTP end-to-end are slow.
QUICK_MODULES = {
    "test_adpcm", "test_attention_pool", "test_audioset", "test_augment",
    "test_config_presets", "test_convert", "test_data", "test_distributed",
    "test_doctor",
    "test_driver_contract", "test_ema", "test_events", "test_frontend",
    "test_golden", "test_metrics", "test_pallas_frontend", "test_parallel",
    "test_pipeline", "test_plot", "test_schedules_remat", "test_streaming",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.quick if name in QUICK_MODULES else pytest.mark.slow)
