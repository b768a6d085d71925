"""AOT model export (deployment tier of C15/T11): the full waveform ->
clip-probs program — device front-end + trunk + attention head, with the
trained weights baked in as constants — serialized to a single portable
StableHLO artifact via ``jax.export``.

Why this shape: the reference ships checkpoints that require its Python
stack to run (SURVEY.md C14/C15); a TPU-native serving story wants a
self-contained compiled artifact that any JAX runtime (or XLA-compatible
loader) can execute without the model code, configs, or flax. The export
is multi-platform (cpu + tpu) so the same artifact serves on a TPU host
and in CPU CI.

    info = export_forward(cfg, variables, "model.mlax", batch=8, seconds=10)
    fn = load_exported("model.mlax")
    probs = fn(wav_batch)          # [batch, n_classes]

The artifact is static-shaped (batch x seconds are baked at export time —
XLA semantics: one compiled program per shape), mirroring how serving
fleets pin shapes per traffic class.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import numpy as np

MAGIC = b"MLAX1\n"

_INPUT_DTYPES = ("float32", "int16", "uint8", "adpcm4", "adpcm2")


def _wire_geometry(input_dtype: str, n_samples: int):
    """Validate input_dtype and return (adpcm_bits, wire_len) — the wire
    geometry both exporters bake into their programs and metadata."""
    if input_dtype not in _INPUT_DTYPES:
        raise ValueError(
            f"input_dtype must be {'|'.join(_INPUT_DTYPES)}, "
            f"got {input_dtype!r}")
    adpcm_bits = (int(input_dtype[-1])
                  if input_dtype.startswith("adpcm") else None)
    wire_len = None
    if adpcm_bits is not None:
        from mla_tpu.data import adpcm as _ad

        if n_samples % _ad.SERVE_BLOCK:
            raise ValueError(
                f"{input_dtype} export needs sample counts divisible by "
                f"{_ad.SERVE_BLOCK}, got {n_samples}")
        wire_len = _ad.wire_length(n_samples, _ad.SERVE_BLOCK,
                                   bits=adpcm_bits)
    return adpcm_bits, wire_len


def _wire_decode(wav, adpcm_bits, n_samples):
    """Device-side wire -> float32 samples prologue (the same decode the
    live server runs in-tick), shared by both exporters so a wire-format
    change cannot fork them."""
    import jax.numpy as jnp

    if adpcm_bits is not None:
        from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm2_decode, adpcm4_decode

        dec = adpcm4_decode if adpcm_bits == 4 else adpcm2_decode
        return dec(wav, n=n_samples, block=SERVE_BLOCK, xp=jnp)
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) / 32768.0
    if wav.dtype == jnp.uint8:
        from mla_tpu.data.audio_io import mulaw_decode

        return mulaw_decode(wav, xp=jnp)
    return wav


def _write_artifact(path: str, meta: Dict, *payloads: bytes):
    """MAGIC + length-prefixed JSON header + payloads (all but the last
    length-prefixed, so readers of both formats stay simple)."""
    header = json.dumps(meta).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        for p in payloads[:-1]:
            f.write(len(p).to_bytes(8, "little"))
            f.write(p)
        f.write(payloads[-1])



def export_forward(
    cfg,
    variables: Dict,
    path: str,
    batch: int = 8,
    seconds: float = 10.0,
    platforms=("cpu", "tpu"),
    input_dtype: str = "float32",
) -> Dict:
    """Serialize the one-shot forward (waveform [batch, n] -> probs
    [batch, C]) with weights baked in; returns the metadata dict that is
    also stored in the artifact header. ``input_dtype`` bakes the serving
    wire format into the artifact: "int16" (PCM16), "uint8" (8-bit
    mu-law), or "adpcm4" (4-bit block ADPCM wire, data/adpcm.py) prepend
    the device-side expansion/decode, so an edge deployment feeds raw
    wire bytes straight to the compiled program."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import frontend as fe

    model = build_model(cfg.model)
    n_samples = int(round(seconds * cfg.frontend.sample_rate))
    adpcm_bits, wire_len = _wire_geometry(input_dtype, n_samples)

    def forward(wav):
        wav = _wire_decode(wav, adpcm_bits, n_samples)
        patches = fe.waveform_to_patches(wav, cfg.frontend)
        return model.apply(variables, patches, train=False).astype(jnp.float32)

    in_shape = (batch, wire_len) if wire_len else (batch, n_samples)
    in_dtype = (jnp.uint8 if adpcm_bits is not None
                else jnp.dtype(input_dtype))
    exp = jexport.export(jax.jit(forward), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct(in_shape, in_dtype)
    )
    payload = exp.serialize()
    meta = {
        "format": "mla_tpu.export.v1",
        "batch": batch,
        "n_samples": n_samples,
        "sample_rate": cfg.frontend.sample_rate,
        "n_classes": cfg.model.n_classes,
        "variant": cfg.model.variant,
        "platforms": list(exp.platforms),
        "input_dtype": input_dtype,
    }
    if wire_len:
        meta["wire_length"] = wire_len
    _write_artifact(path, meta, payload)
    return meta


def export_streaming(
    cfg,
    variables: Dict,
    path: str,
    streams: int = 1,
    chunk_patches: int = 5,
    platforms=("cpu", "tpu"),
    input_dtype: str = "float32",
    timeline_cap: int = 0,
) -> Dict:
    """Serialize the STREAMING tagger as a two-program artifact: a chunk
    fold ``(states, wav [S, chunk], n_valid [S]) -> states`` and a
    ``finalize(states) -> probs [S, C]`` — the O(1)-state long-form path
    (T6/T11) as portable StableHLO, weights baked in. An edge deployment
    loops the chunk program over unbounded audio and reads scores at any
    time, with only jax installed — no model code, flax, or configs: the
    whole edge surface (``load_exported_streaming``, ``chunk``/``finalize``
    and the ``timeline`` readout via the flax-free
    ``ops.attention_pool.read_timeline``) imports nothing that pulls flax;
    ``n_valid`` masks a padded final chunk exactly like the live server's
    flush. States cross the API as plain nested tuples (one
    ``(num, den, m)`` triple per level) so the loader needs no NamedTuple
    class; ``load_exported_streaming`` provides ``init_state()``.
    ``input_dtype`` bakes the wire decode in, as in :func:`export_forward`.
    ``timeline_cap`` > 0 additionally folds the localization ring
    (ops.attention_pool.TimelineState) inside the exported chunk program,
    exactly like the live server — ``StreamingArtifact.timeline`` reads
    the window at the edge.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops import attention_pool as ap
    from mla_tpu.ops import frontend as fe
    from mla_tpu.serve.streaming import (STREAMING_VARIANTS,
                                         _samples_per_patches,
                                         n_stream_levels, stream_activations,
                                         stream_finalize_scores)

    if cfg.model.variant not in STREAMING_VARIANTS:
        raise ValueError(f"unknown streaming variant {cfg.model.variant!r}; "
                         f"pick from {STREAMING_VARIANTS}")
    model = build_model(cfg.model)
    n_levels = n_stream_levels(cfg.model)
    att_act, cla_act = stream_activations(cfg.model)
    chunk_samples = _samples_per_patches(cfg.frontend, chunk_patches)
    c = cfg.model.n_classes
    adpcm_bits, wire_len = _wire_geometry(input_dtype, chunk_samples)
    if timeline_cap and timeline_cap < chunk_patches:
        raise ValueError(
            f"timeline_cap {timeline_cap} must be >= chunk_patches "
            f"{chunk_patches}")

    def chunk(state, wav, n_valid):
        states, tl = state
        wav = _wire_decode(wav, adpcm_bits, chunk_samples)
        patches = fe.waveform_to_patches(wav, cfg.frontend)
        levels = model.apply(variables, patches, method="segment_logits")
        tmask = jnp.arange(patches.shape[1])[None, :] < n_valid[:, None]
        out = []
        for (num, den, m), (g, cl) in zip(states, levels):
            g = jnp.where(tmask[..., None], g, -jnp.inf)
            st = ap.update_stream_state(
                ap.StreamState(num, den, m), g, cl, att_act, cla_act)
            out.append((st.num, st.den, st.m))
        if tl is not None:
            g_stack = jnp.stack([g for g, _ in levels], axis=2)
            f_stack = jnp.stack(
                [ap.cla_activation(cl, cla_act) for _, cl in levels], axis=2)
            new_tl = ap.update_timeline_state(
                ap.TimelineState(*tl), g_stack, f_stack,
                jnp.ones(wav.shape[0], bool), n_valid)
            tl = tuple(new_tl)
        return tuple(out), tl

    def finalize(states):
        sts = [ap.StreamState(*t) for t in states]
        return stream_finalize_scores(
            model, variables, cfg.model.variant, sts
        ).astype(jnp.float32)

    st_aval = tuple(
        tuple(jax.ShapeDtypeStruct((streams, c), jnp.float32)
              for _ in range(3))
        for _ in range(n_levels))
    tl_aval = None
    if timeline_cap:
        ring = jax.ShapeDtypeStruct((streams, timeline_cap, n_levels, c),
                                    jnp.float32)
        vec = jax.ShapeDtypeStruct((streams,), jnp.int32)
        tl_aval = (ring, ring, vec, vec)
    in_shape = (streams, wire_len) if wire_len else (streams, chunk_samples)
    in_dtype = (jnp.uint8 if adpcm_bits is not None
                else jnp.dtype(input_dtype))
    exp_chunk = jexport.export(jax.jit(chunk), platforms=tuple(platforms))(
        (st_aval, tl_aval), jax.ShapeDtypeStruct(in_shape, in_dtype),
        jax.ShapeDtypeStruct((streams,), jnp.int32))
    exp_fin = jexport.export(jax.jit(finalize), platforms=tuple(platforms))(
        st_aval)
    meta = {
        "format": "mla_tpu.export.stream.v1",
        "streams": streams,
        "chunk_patches": chunk_patches,
        "chunk_samples": chunk_samples,
        "hop_samples": (cfg.frontend.example_hop_frames
                        * cfg.frontend.hop_length * chunk_patches),
        "sample_rate": cfg.frontend.sample_rate,
        "n_classes": c,
        "n_levels": n_levels,
        "variant": cfg.model.variant,
        "platforms": list(exp_chunk.platforms),
        "input_dtype": input_dtype,
        "timeline_cap": timeline_cap,
        "att_activation": att_act,
    }
    if wire_len:
        meta["wire_length"] = wire_len
    _write_artifact(path, meta, exp_chunk.serialize(), exp_fin.serialize())
    return meta


class StreamingArtifact:
    """Loaded streaming export: ``init_state() -> states``,
    ``chunk(states, wav, n_valid=None) -> states``,
    ``finalize(states) -> probs [S, C]``. Pure jax — no model code.

    CHUNK OVERLAP CONTRACT: each chunk call consumes
    ``meta["chunk_samples"]`` samples but the stream only ADVANCES by
    ``meta["hop_samples"]`` (< chunk_samples by the STFT window tail) —
    consecutive chunks must overlap: slice ``wav[off : off+chunk_samples]``
    and step ``off += hop_samples``, exactly like the live server's
    buffers. Advancing by chunk_samples silently drops frame context at
    every boundary and diverges from the in-process tagger."""

    def __init__(self, meta: Dict, exp_chunk, exp_fin):
        self.meta = meta
        self._chunk = exp_chunk
        self._fin = exp_fin

    def init_state(self):
        import jax.numpy as jnp

        s, c = self.meta["streams"], self.meta["n_classes"]
        n_levels = self.meta["n_levels"]
        levels = tuple(
            (jnp.zeros((s, c), jnp.float32), jnp.zeros((s, c), jnp.float32),
             jnp.full((s, c), -jnp.inf, jnp.float32))
            for _ in range(n_levels))
        tl = None
        cap = self.meta.get("timeline_cap", 0)
        if cap:
            ring = jnp.zeros((s, cap, n_levels, c), jnp.float32)
            vec = jnp.zeros(s, jnp.int32)
            tl = (ring, ring, vec, vec)
        return (levels, tl)

    def chunk(self, state, wav, n_valid=None):
        import jax.numpy as jnp

        idt = self.meta["input_dtype"]
        wav = jnp.asarray(wav, jnp.uint8 if idt.startswith("adpcm")
                          else jnp.dtype(idt))
        want = (self.meta["streams"],
                self.meta.get("wire_length") or self.meta["chunk_samples"])
        if tuple(wav.shape) != want:
            raise ValueError(
                f"chunk program is static-shaped {want}, got {tuple(wav.shape)}")
        if n_valid is None:
            n_valid = np.full(self.meta["streams"],
                              self.meta["chunk_patches"], np.int32)
        return self._chunk.call(state, wav,
                                jnp.asarray(n_valid, jnp.int32))

    def finalize(self, state) -> np.ndarray:
        levels, _ = state
        return np.asarray(self._fin.call(levels))

    def timeline(self, state, sid: int = 0):
        """Localization window for stream ``sid`` — the live server's
        timeline readout at the edge (export with timeline_cap > 0):
        ``(start_patch, [(weights [T, C], probs [T, C]) per level])``."""
        from mla_tpu.ops.attention_pool import (StreamState, TimelineState,
                                                read_timeline)

        levels, tl = state
        if tl is None:
            raise RuntimeError(
                "timeline disabled; export with timeline_cap > 0")
        return read_timeline([StreamState(*t) for t in levels],
                             TimelineState(*tl), sid,
                             self.meta["att_activation"])

    def events(self, state, sid: int = 0, threshold=0.5,
               merge_gap_s: float = 0.0, min_dur_s: float = 0.0,
               class_names=None):
        """Discrete events from the ring window at the edge — the same
        threshold / gap-merge / min-duration chain as the live service
        (``serve.events.detect_events``, numpy-only, so this stays within
        the artifact's jax-only dependency claim). Timestamps are on the
        stream's absolute patch grid; a window that has outgrown
        ``timeline_cap`` covers only the last cap patches (see the ring
        semantics note in docs/TUTORIAL.md)."""
        from mla_tpu.serve.events import detect_events

        start_patch, levels = self.timeline(state, sid)
        w = np.mean([wl for wl, _ in levels], axis=0)
        f = np.mean([fl for _, fl in levels], axis=0)
        sr = self.meta["sample_rate"]
        hop_s = (self.meta["hop_samples"] / self.meta["chunk_patches"]) / sr
        return detect_events(f, w, hop_s=hop_s, start_patch=start_patch,
                             threshold=threshold, merge_gap_s=merge_gap_s,
                             min_dur_s=min_dur_s, class_names=class_names)


def load_exported_streaming(path: str) -> StreamingArtifact:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an mla_tpu export (bad magic {magic!r})")
        hlen = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(hlen).decode())
        if meta.get("format") != "mla_tpu.export.stream.v1":
            raise ValueError(
                f"{path} is a {meta.get('format')} artifact; use "
                "load_exported for one-shot exports")
        l1 = int.from_bytes(f.read(8), "little")
        p1 = f.read(l1)
        p2 = f.read()
    return StreamingArtifact(meta, jexport.deserialize(p1),
                             jexport.deserialize(p2))


def load_exported(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load an exported artifact; returns ``fn(wav [batch, n_samples]) ->
    probs [batch, n_classes]`` with ``fn.meta`` holding the header dict.
    Needs only jax — no model code, flax, or configs."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an mla_tpu export (bad magic {magic!r})")
        hlen = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(hlen).decode())
        if meta.get("format") == "mla_tpu.export.stream.v1":
            raise ValueError(
                f"{path} is a streaming artifact; use load_exported_streaming")
        payload = f.read()
    exp = jexport.deserialize(payload)

    def fn(wav: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        idt = meta.get("input_dtype", "float32")
        wav = jnp.asarray(wav, jnp.uint8 if idt.startswith("adpcm")
                          else jnp.dtype(idt))
        want = (meta["batch"], meta.get("wire_length") or meta["n_samples"])
        if tuple(wav.shape) != want:
            raise ValueError(f"exported program is static-shaped {want}, got {tuple(wav.shape)}")
        return np.asarray(exp.call(wav))

    fn.meta = meta
    return fn
