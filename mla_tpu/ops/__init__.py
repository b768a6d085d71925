"""TPU-native ops: log-mel front-end (jnp + fused Pallas), attention pooling.

Submodules (import them directly; functions are intentionally not hoisted so
module names like ``ops.attention_pool`` stay importable):
  - ``mla_tpu.ops.frontend``: VGGish log-mel semantics in jax.numpy (C3).
  - ``mla_tpu.ops.pallas_frontend``: fused Pallas TPU kernel (T1).
  - ``mla_tpu.ops.attention_pool``: attention pooling + streaming state (C6, T6).
"""

from mla_tpu.ops import attention_pool, frontend  # noqa: F401
