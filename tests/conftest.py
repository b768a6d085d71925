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
