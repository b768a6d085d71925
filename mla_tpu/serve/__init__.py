"""Inference services (C15/T11): whole-clip and streaming long-form.

Everything is imported LAZILY (PEP 562) so that the AOT-export edge path
(``serve.export.load_exported_streaming`` + ``StreamingArtifact``) can run
with only jax installed — eagerly importing streaming here would pull
models.zoo -> flax into every ``import mla_tpu.serve.export`` (ADVICE r3).

Tiers:
  serve.streaming.StreamingTagger / tag_clip — in-process taggers
  serve.events.detect_events      — discrete event extraction
  serve.http.create_server        — the HTTP service (stdlib tier)
  serve.native_front.create_native_server — the C++-front service
  serve.client.TagClient          — the wire-encoding client SDK
  serve.export.export_forward / export_streaming / load_exported*
                                  — AOT StableHLO artifacts
  serve.server.BatchedStreamingServer — the batched device tier
"""

_LAZY = {
    "detect_events": ("mla_tpu.serve.events", "detect_events"),
    "StreamingTagger": ("mla_tpu.serve.streaming", "StreamingTagger"),
    "tag_clip": ("mla_tpu.serve.streaming", "tag_clip"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
