"""Mesh / sharding runtime (T2-T8, SURVEY.md §2.2): device mesh construction,
batch sharding (DP), parameter partition rules (TP), streaming-accumulator
psum (the CP story lives in ops.attention_pool.psum_stream_state)."""

from mla_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
