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

    if input_dtype not in ("float32", "int16", "uint8", "adpcm4", "adpcm2"):
        raise ValueError(
            "input_dtype must be float32|int16|uint8|adpcm4|adpcm2, "
            f"got {input_dtype!r}")
    model = build_model(cfg.model)
    n_samples = int(round(seconds * cfg.frontend.sample_rate))
    adpcm_bits = (int(input_dtype[-1])
                  if input_dtype.startswith("adpcm") else None)
    wire_len = None
    if adpcm_bits is not None:
        from mla_tpu.data import adpcm as _ad

        if n_samples % _ad.SERVE_BLOCK:
            raise ValueError(
                f"{input_dtype} export needs n_samples divisible by "
                f"{_ad.SERVE_BLOCK}, got {n_samples}")
        wire_len = _ad.wire_length(n_samples, _ad.SERVE_BLOCK,
                                   bits=adpcm_bits)

    def forward(wav):
        if adpcm_bits is not None:
            from mla_tpu.data.adpcm import (SERVE_BLOCK, adpcm2_decode,
                                            adpcm4_decode)

            dec = adpcm4_decode if adpcm_bits == 4 else adpcm2_decode
            wav = dec(wav, n=n_samples, block=SERVE_BLOCK, xp=jnp)
        elif wav.dtype == jnp.int16:
            wav = wav.astype(jnp.float32) / 32768.0
        elif wav.dtype == jnp.uint8:
            from mla_tpu.data.audio_io import mulaw_decode

            wav = mulaw_decode(wav, xp=jnp)
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
    header = json.dumps(meta).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(payload)
    return meta


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
