"""Inference services (C15/T11): whole-clip and streaming long-form."""

from mla_tpu.serve.streaming import StreamingTagger, tag_clip  # noqa: F401

# HTTP tier (lazy imports inside keep jax/np deps minimal at package load):
#   serve.http.create_server  — the service
#   serve.client.TagClient    — the wire-encoding client SDK
