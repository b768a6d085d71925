"""Parity harness (T12, SURVEY.md §2.2): executable check that the TPU
implementation reproduces the reference semantics — front-end vs the frozen
VGGish constants, model forward vs golden outputs, metrics vs sklearn.

Because the reference mount is empty (SURVEY.md §0), the contract is the
frozen golden files in tests/golden/ (generated once from the NumPy/torch
oracles, which implement the paper's equations). Run via:

    python -m mla_tpu parity            # prints one JSON line per check
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")


def _gen_frontend_golden(path: str):
    from tests.oracle import frontend_oracle as oracle

    rng = np.random.default_rng(20260816)
    wav = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    patches = oracle.waveform_to_examples(wav)
    np.savez_compressed(path, wav=wav, patches=patches)


def _gen_model_golden(path: str):
    """Frozen random-weight multi-level-attention forward from the torch
    oracle (arXiv:1803.02353 §2 equations)."""
    import torch

    from tests.oracle import model_oracle as oracle

    torch.manual_seed(20260816)
    rng = np.random.default_rng(20260816)
    n_blocks, layers, hidden, d, c = 2, 1, 32, 128, 11
    params: Dict = {}
    prev = d
    for b in range(n_blocks):
        params[f"block{b}"] = {
            "fc0": {"kernel": rng.standard_normal((prev, hidden)).astype(np.float32) * 0.1,
                    "bias": np.zeros(hidden, np.float32)}
        }
        params[f"att{b}"] = {
            "gate": {"kernel": rng.standard_normal((hidden, c)).astype(np.float32) * 0.1,
                     "bias": np.zeros(c, np.float32)},
            "cla": {"kernel": rng.standard_normal((hidden, c)).astype(np.float32) * 0.1,
                    "bias": np.zeros(c, np.float32)},
        }
        prev = hidden
    params["out"] = {"kernel": rng.standard_normal((n_blocks * c, c)).astype(np.float32) * 0.1,
                     "bias": np.zeros(c, np.float32)}
    x = rng.standard_normal((3, 10, d)).astype(np.float32)
    probs = oracle.multi_level_attention_forward(params, x, n_blocks, 1)
    flat = {}

    def _flatten(prefix, node):
        for k, v in node.items():
            if isinstance(v, dict):
                _flatten(f"{prefix}{k}/", v)
            else:
                flat[f"{prefix}{k}"] = v

    _flatten("", params)
    np.savez_compressed(path, x=x, probs=probs,
                        meta=np.array([n_blocks, 1, hidden, d, c]), **flat)


def ensure_goldens():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    fe = os.path.join(GOLDEN_DIR, "frontend_golden.npz")
    mo = os.path.join(GOLDEN_DIR, "model_golden.npz")
    if not os.path.exists(fe):
        _gen_frontend_golden(fe)
    if not os.path.exists(mo):
        _gen_model_golden(mo)
    return fe, mo


def _unflatten(npz) -> Dict:
    params: Dict = {}
    for key in npz.files:
        if key in ("x", "probs", "meta", "wav", "patches"):
            continue
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[key]
    return params


def check_frontend(method: str = "matmul") -> Dict:
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import FrontendConfig
    from mla_tpu.ops.frontend import waveform_to_patches

    fe_path, _ = ensure_goldens()
    g = np.load(fe_path)
    fn = jax.jit(lambda w: waveform_to_patches(w, FrontendConfig(), method=method))
    ours = np.asarray(fn(jnp.asarray(g["wav"])))
    err = float(np.abs(ours - g["patches"]).max())
    return {"check": f"frontend_{method}", "max_abs_err": err, "pass": err < 2e-4}


def check_frontend_pallas() -> Dict:
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import FrontendConfig
    from mla_tpu.ops.pallas_frontend import fused_log_mel_patches

    fe_path, _ = ensure_goldens()
    g = np.load(fe_path)
    interpret = jax.default_backend() not in ("tpu", "axon")
    ours = np.asarray(
        fused_log_mel_patches(jnp.asarray(g["wav"]), FrontendConfig(), interpret=interpret)
    )
    err = float(np.abs(ours - g["patches"]).max())
    return {"check": "frontend_pallas", "max_abs_err": err, "pass": err < 2e-4}


def check_model() -> Dict:
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import ModelConfig
    from mla_tpu.models.zoo import AudioTagger

    _, mo_path = ensure_goldens()
    g = np.load(mo_path)
    n_blocks, layers, hidden, d, c = (int(v) for v in g["meta"])
    cfg = ModelConfig(variant="multi_level_attention", trunk="none", n_classes=c,
                      n_blocks=n_blocks, layers_per_block=layers, hidden_units=hidden,
                      compute_dtype="float32")
    model = AudioTagger(cfg)
    x = jnp.asarray(g["x"])
    params = _unflatten(g)
    # graft golden weights into the flax tree (same names by construction)
    with jax.default_matmul_precision("highest"):
        probs = np.asarray(jax.jit(model.apply)({"params": params}, x))
    err = float(np.abs(probs - g["probs"]).max())
    return {"check": "model_multi_level_attention", "max_abs_err": err, "pass": err < 1e-5}


def check_model_variant(variant: str) -> Dict:
    """Live torch-oracle parity for the non-golden head variants: the flax
    model and the oracle compute the same function from the SAME randomly
    initialized params (two independent codebases, one weight tree)."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import ModelConfig
    from mla_tpu.models.zoo import build_model
    from tests.oracle import model_oracle as oracle

    rng = np.random.default_rng(7)
    c, d, hidden, n_blocks, heads = 9, 64, 32, 2, 3
    cfg = ModelConfig(variant=variant, trunk="none", n_classes=c, n_blocks=n_blocks,
                      layers_per_block=1, hidden_units=hidden,
                      n_attention_heads=heads, compute_dtype="float32")
    model = build_model(cfg)
    x = rng.standard_normal((2, 10, d)).astype(np.float32)
    variables = model.init(jax.random.key(3), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    if variant == "single_attention":
        ref = oracle.single_attention_forward(params, x, n_blocks, 1)
    elif variant == "multi_attention":
        ref = oracle.multi_attention_forward(params, x, n_blocks, 1, heads)
    elif variant in ("avg_pool", "max_pool"):
        ref = oracle.avg_max_pool_forward(params, x, n_blocks, 1, variant[:3])
    else:
        raise ValueError(f"no oracle dispatch for {variant!r}")
    err = float(np.abs(ours - ref).max())
    return {"check": f"model_{variant}", "max_abs_err": err, "pass": err < 1e-5}


def check_metrics() -> Dict:
    from sklearn.metrics import average_precision_score, roc_auc_score

    from mla_tpu.utils.metrics import average_precision, roc_auc

    rng = np.random.default_rng(0)
    t = (rng.random((300, 8)) < 0.2).astype(np.float32)
    s = 0.6 * rng.random((300, 8)) + 0.4 * t
    ap_err = max(
        abs(average_precision(s, t)[j] - average_precision_score(t[:, j], s[:, j]))
        for j in range(8) if t[:, j].sum()
    )
    auc_err = max(
        abs(roc_auc(s, t)[j] - roc_auc_score(t[:, j], s[:, j])) for j in range(8)
    )
    err = float(max(ap_err, auc_err))
    return {"check": "metrics_vs_sklearn", "max_abs_err": err, "pass": err < 1e-10}


def run_all() -> List[Dict]:
    results = [
        check_frontend("matmul"),
        check_frontend("fft"),
        check_frontend_pallas(),
        check_model(),
        check_model_variant("single_attention"),
        check_model_variant("multi_attention"),
        check_model_variant("avg_pool"),
        check_model_variant("max_pool"),
        check_metrics(),
    ]
    return results


def main():
    ok = True
    for r in run_all():
        print(json.dumps(r))
        ok &= r["pass"]
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
