"""Checkpoint conversion: torch VGGish weights -> flax params (C4's
embedding-parity path: the reference family consumes VGGish embeddings or
finetunes the VGGish trunk; users bring ``torchvggish``-layout state dicts).

Layout mapping (torchvggish ``features``/``embeddings`` Sequential indices
-> mla_tpu.models.trunk.VGGish names):

  features.0  conv1_1   features.3  conv2_1   features.6  conv3_1
  features.8  conv3_2   features.11 conv4_1   features.13 conv4_2
  embeddings.0 fc1_1    embeddings.2 fc1_2    embeddings.4 fc2

Conv kernels transpose OIHW -> HWIO. The first FC's input ordering depends
on the flatten convention: torch NCHW-flatten is (C,H,W); our NHWC flatten
is (H,W,C). ``flatten_order`` handles both ("nchw" for plain torch models,
"nhwc" for torchvggish, which permutes to NHWC before flattening to match
the original TF weights).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_CONV_MAP = {
    "features.0": "conv1_1",
    "features.3": "conv2_1",
    "features.6": "conv3_1",
    "features.8": "conv3_2",
    "features.11": "conv4_1",
    "features.13": "conv4_2",
}
_FC_MAP = {
    "embeddings.0": "fc1_1",
    "embeddings.2": "fc1_2",
    "embeddings.4": "fc2",
}

# VGGish final feature map before flatten: 6 x 4 spatial, 512 channels
_H, _W, _C = 6, 4, 512


def params_to_flat(params: Dict, prefix: str = "") -> Dict[str, "np.ndarray"]:
    """Nested flax param tree -> flat {'a/b/kernel': array} dict (the
    framework-agnostic weight-interchange format; reference users swap
    .h5/.pth weight files — ours is a flat .npz of these keys)."""
    import numpy as np

    flat: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) or hasattr(v, "items"):
            flat.update(params_to_flat(dict(v), f"{key}/"))
        else:
            flat[key] = np.asarray(v, np.float32)
    return flat


def flat_to_params(flat: Dict) -> Dict:
    """Inverse of :func:`params_to_flat`."""
    params: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def torch_vggish_to_flax(state_dict: Dict, flatten_order: str = "nhwc") -> Dict:
    """torchvggish-layout state dict -> flax params for models.trunk.VGGish."""
    params: Dict = {}
    for tname, fname in _CONV_MAP.items():
        w = _to_np(state_dict[f"{tname}.weight"])  # [out, in, kh, kw]
        b = _to_np(state_dict[f"{tname}.bias"])
        params[fname] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                         "bias": b.astype(np.float32)}
    for tname, fname in _FC_MAP.items():
        w = _to_np(state_dict[f"{tname}.weight"])  # [out, in]
        b = _to_np(state_dict[f"{tname}.bias"])
        k = w.T.astype(np.float32)  # -> [in, out]
        if fname == "fc1_1":
            if flatten_order == "nchw":
                # torch flattened (C, H, W); our flax input flattens (H, W, C)
                k = (
                    k.reshape(_C, _H, _W, -1)
                    .transpose(1, 2, 0, 3)
                    .reshape(_H * _W * _C, -1)
                )
            elif flatten_order != "nhwc":
                raise ValueError(f"unknown flatten_order {flatten_order!r}")
        params[fname] = {"kernel": k, "bias": b.astype(np.float32)}
    return params


def flax_vggish_to_torch(params: Dict, flatten_order: str = "nhwc") -> Dict:
    """Inverse mapping (for exporting back to the torch ecosystem)."""
    out: Dict = {}
    for tname, fname in _CONV_MAP.items():
        out[f"{tname}.weight"] = params[fname]["kernel"].transpose(3, 2, 0, 1).copy()
        out[f"{tname}.bias"] = params[fname]["bias"].copy()
    for tname, fname in _FC_MAP.items():
        k = params[fname]["kernel"]
        if fname == "fc1_1" and flatten_order == "nchw":
            k = (
                k.reshape(_H, _W, _C, -1)
                .transpose(2, 0, 1, 3)
                .reshape(_C * _H * _W, -1)
            )
        out[f"{tname}.weight"] = k.T.copy()
        out[f"{tname}.bias"] = params[fname]["bias"].copy()
    return out
