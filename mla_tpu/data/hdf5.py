"""HDF5 packing / loading (reference C2: ``utilities.load_data``,
``uint8_to_float32``, ``bool_to_float32`` — SURVEY.md §2.1, reconstructed).

Layout matches the upstream AudioSet packing convention:
  x          [clips, T, 128] uint8-quantized embeddings (or f32 patches
              [clips, T, 96, 64] when packing raw log-mel)
  y          [clips, n_classes] bool multi-hot labels
  video_id_list  [clips] bytes
Dequantization of Google's 8-bit bottleneck features: (q - 128) / 128,
the upstream ``uint8_to_float32`` convention (SURVEY.md §2.1 C2) — values
in [-1, 1). ``scale`` parametrizes both directions for non-reference packs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover - h5py is baked into this image
    HAVE_H5PY = False

# The documented reference convention (SURVEY.md C2): (q - 128) / 128 in
# [-1, 1). Round 1 shipped 2.0 here, which would have loaded real
# upstream-packed AudioSet HDF5 at twice the reference feature scale
# (ADVICE.md round 1); re-verify against real files if the mount populates.
DEQUANT_SCALE = 1.0


def uint8_to_float32(x: np.ndarray, scale: float = DEQUANT_SCALE) -> np.ndarray:
    """De-quantize 8-bit packed embeddings: (q - 128) / 128 * scale."""
    return ((np.asarray(x, dtype=np.float32) - 128.0) / 128.0) * scale


def float32_to_uint8(x: np.ndarray, scale: float = DEQUANT_SCALE) -> np.ndarray:
    """Quantize to the reference's 8-bit convention. Values outside
    [-scale, scale) saturate; warn when that's more than a sliver, since a
    silently clipped pack flattens whatever signal lived in the tails
    (pass a larger ``scale`` to both pack and load for wide features)."""
    import warnings

    x = np.asarray(x, dtype=np.float32)
    clipped = float(np.mean((x < -scale) | (x >= scale)))
    if clipped > 0.01:
        warnings.warn(
            f"float32_to_uint8: {clipped:.1%} of values fall outside "
            f"[-{scale}, {scale}) and will saturate; pass scale= to widen "
            "the quantization range (load with the same scale)",
            stacklevel=2,
        )
    q = np.round(x / scale * 128.0 + 128.0)
    return np.clip(q, 0, 255).astype(np.uint8)


def bool_to_float32(y: np.ndarray) -> np.ndarray:
    return np.asarray(y, dtype=np.float32)


def pack_hdf5(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    video_ids: Optional[np.ndarray] = None,
    quantize: bool = False,
) -> None:
    """Pack (features, labels[, ids]) into the reference HDF5 layout."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable; cannot pack HDF5")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if video_ids is None:
        video_ids = np.array([f"clip{i:08d}".encode() for i in range(len(x))])
    with h5py.File(path, "w") as f:
        if quantize:
            f.create_dataset("x", data=float32_to_uint8(x), compression="gzip")
        else:
            f.create_dataset("x", data=np.asarray(x, np.float32), compression="gzip")
        f.create_dataset("y", data=np.asarray(y, bool), compression="gzip")
        f.create_dataset("video_id_list", data=np.asarray(video_ids, dtype="S"))


def load_data(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference ``load_data``: HDF5 -> (x f32, y f32, video_ids).
    uint8-packed features are de-quantized on load."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable; cannot load HDF5")
    with h5py.File(path, "r") as f:
        x = f["x"][...]
        y = bool_to_float32(f["y"][...])
        ids = f["video_id_list"][...] if "video_id_list" in f else None
    if x.dtype == np.uint8:
        x = uint8_to_float32(x)
    else:
        x = np.asarray(x, np.float32)
    return x, y, ids


def load_many(paths) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate several packs (e.g. bal_train.h5 + unbal_train.h5)."""
    xs, ys, ids = [], [], []
    for p in paths:
        x, y, i = load_data(p)
        xs.append(x)
        ys.append(y)
        ids.append(i)
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(ids)
