"""Inference services (C15/T11): whole-clip and streaming long-form."""

from mla_tpu.serve.events import detect_events  # noqa: F401
from mla_tpu.serve.streaming import StreamingTagger, tag_clip  # noqa: F401

# Heavier tiers (lazy imports keep jax deps minimal at package load):
#   serve.http.create_server        — the HTTP service (stdlib tier)
#   serve.native_front.create_native_server — the C++-front service
#   serve.client.TagClient          — the wire-encoding client SDK
#   serve.export.export_forward / export_streaming / load_exported*
#                                   — AOT StableHLO artifacts
#   serve.server.BatchedStreamingServer — the batched device tier
