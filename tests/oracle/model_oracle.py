"""torch-cpu oracle for the model math (reference C5-C8 as specified by
arXiv:1803.02353 §2; SURVEY.md §4 "parity/golden").

Weights are injected from the flax param tree so the two implementations
compute the same function from independent codebases. Only the
bottleneck-feature protocol (trunk == "none") is oracled here — that is the
paper's exact published setting; the CNN trunk is covered by shape/behavior
tests plus the conv-parity test in test_models.py.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _dense(p):
    """flax Dense params {'kernel','bias'} -> torch linear apply fn."""
    w = torch.from_numpy(np.asarray(p["kernel"], dtype=np.float32))
    b = torch.from_numpy(np.asarray(p["bias"], dtype=np.float32))
    return lambda x: x @ w + b


def _gate(x, kind):
    if kind == "exp":
        return torch.exp(x)
    if kind == "sigmoid":
        return torch.sigmoid(x)
    if kind == "relu":
        return torch.relu(x)
    raise ValueError(kind)


def attention_module(params, h, att_activation="exp", cla_activation="sigmoid"):
    """h: [B, T, H] torch tensor -> [B, C] pooled output."""
    gate = _dense(params["gate"])(h)
    cla = _dense(params["cla"])(h)
    att = _gate(gate, att_activation)
    f = torch.sigmoid(cla) if cla_activation == "sigmoid" else cla
    num = (att * f).sum(dim=-2)
    den = att.sum(dim=-2).clamp_min(1e-7)
    return num / den


def embedded_block(params, h, layers_per_block):
    for i in range(layers_per_block):
        h = torch.relu(_dense(params[f"fc{i}"])(h))
    return h


def multi_level_attention_forward(
    params, x, n_blocks, layers_per_block, att_activation="exp", cla_activation="sigmoid"
):
    """params: flax param dict for AudioTagger (trunk=none, eval mode).
    x: np [B, T, D] -> np [B, C] probabilities."""
    h = torch.from_numpy(np.asarray(x, dtype=np.float32))
    zs = []
    for i in range(n_blocks):
        h = embedded_block(params[f"block{i}"], h, layers_per_block)
        zs.append(attention_module(params[f"att{i}"], h, att_activation, cla_activation))
    z = torch.cat(zs, dim=-1)
    out = _dense(params["out"])(z)
    return torch.sigmoid(out).numpy()


def single_attention_forward(params, x, n_blocks, layers_per_block,
                             att_activation="exp", cla_activation="sigmoid"):
    h = torch.from_numpy(np.asarray(x, dtype=np.float32))
    for i in range(n_blocks):
        h = embedded_block(params[f"block{i}"], h, layers_per_block)
    return attention_module(params["att"], h, att_activation, cla_activation).numpy()


def multi_attention_forward(params, x, n_blocks, layers_per_block, n_heads,
                            att_activation="exp", cla_activation="sigmoid"):
    """C8 'multi attention': several heads on the LAST hidden layer,
    concatenated, FC + sigmoid."""
    h = torch.from_numpy(np.asarray(x, dtype=np.float32))
    for i in range(n_blocks):
        h = embedded_block(params[f"block{i}"], h, layers_per_block)
    zs = [
        attention_module(params["mh"][f"att{i}"], h, att_activation, cla_activation)
        for i in range(n_heads)
    ]
    out = _dense(params["mh"]["out"])(torch.cat(zs, dim=-1))
    return torch.sigmoid(out).numpy()


def avg_max_pool_forward(params, x, n_blocks, layers_per_block, mode="avg"):
    h = torch.from_numpy(np.asarray(x, dtype=np.float32))
    for i in range(n_blocks):
        h = embedded_block(params[f"block{i}"], h, layers_per_block)
    seg = torch.sigmoid(_dense(params["pool"]["cla"])(h))
    return (seg.mean(dim=-2) if mode == "avg" else seg.max(dim=-2).values).numpy()


def conv2d_nhwc(flax_conv_params, x):
    """flax SAME conv on NHWC input, via torch (weight [kh,kw,in,out] -> OIHW)."""
    w = torch.from_numpy(np.asarray(flax_conv_params["kernel"], dtype=np.float32))
    w = w.permute(3, 2, 0, 1)  # -> [out, in, kh, kw]
    b = torch.from_numpy(np.asarray(flax_conv_params["bias"], dtype=np.float32))
    xt = torch.from_numpy(np.asarray(x, dtype=np.float32)).permute(0, 3, 1, 2)
    kh, kw = w.shape[2], w.shape[3]
    pad = (kw // 2, (kw - 1) // 2, kh // 2, (kh - 1) // 2)
    y = F.conv2d(F.pad(xt, pad), w, b)
    return y.permute(0, 2, 3, 1).numpy()
