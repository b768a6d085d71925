"""Inference services (C15/T11): whole-clip and streaming long-form."""

from mla_tpu.serve.streaming import StreamingTagger, tag_clip  # noqa: F401
