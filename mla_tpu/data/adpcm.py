"""Block-independent IMA ADPCM wire codecs for serving (T11): 4-bit
(adpcm4, the quality default) and 2-bit (adpcm2, the max-throughput rung).

Why: serving on a transfer-bound host is limited by host->device bytes
(measured ~20-50 MB/s on this tunnel; docs/RESULTS.md — the device tick
itself is transfer-dominated even on the adpcm4 wire). The wire-format
ladder: f32 -> PCM16 (2x) -> 8-bit mu-law (4x) -> adpcm4 (8x, ~24 dB
SNR) -> adpcm2 (~13x, ~14 dB SNR; probed for flagship top-1/top-5
stability BEFORE being built — scripts/probe_adpcm_bits.py). ADPCM is
the classic fixed-rate speech/audio codec — no codec libraries exist in
this image, so it is implemented here from the IMA/DVI spec (the
reference family has no serving tier at all; its C15 is a one-shot
script — SURVEY.md §2.1). adpcm2 is serving-only; training staging
(data.staging_dtype) stops at adpcm4, where the loss trajectory was
measured to match f32.

Design for TPU decode (the part that must run INSIDE the jitted chunk
program so bytes travel host->HBM still compressed):

- Blocks of ``block`` samples are coded INDEPENDENTLY: each block stores
  the encoder's start state (pred0 int16, index0 uint8). Decode is
  therefore embarrassingly parallel across blocks — a ``lax.scan`` of
  length ``block`` over a [rows*n_blocks] lane vector, pure VPU integer
  ops. (A continuous-state ADPCM stream would force a scan over the WHOLE
  chunk; block independence is what makes the codec TPU-shaped.) The
  per-sample step-table lookup is a one-hot matmul, not a gather —
  measured 4.3x faster on this chip (gathers cost ~9 ns/sample).
- The encoder also resets at block boundaries (predictor = the block's
  first sample, step index = a deterministic integer heuristic from the
  block's mean |first difference|), so the numpy and C++ encoders are
  trivially vectorizable/parallelizable and bit-identical.
- All state arithmetic is exact int32; encoder and decoder share the same
  reconstruction-feedback step, so host numpy, device jnp, and native C++
  (data.native, threaded across rows) reconstruct bit-identically.
- The wire is ONE uint8 buffer per row — on this tunnel host, uploading
  two extra tiny header arrays per tick measured ~180x slower than one
  combined buffer (small-transfer latency dominates). The layout is
  BLOCK-INTERLEAVED: each block is a self-contained ``block/2 + 3`` byte
  unit ``[nibbles block/2 | pred0 int16-LE | index0]``, so a stream of
  blocks can be sliced/concatenated at any block boundary — that is what
  lets the serving tier buffer streams IN WIRE FORM (the client encodes,
  the host just routes bytes, the device decodes; measured 74 ms/tick of
  host encode at 32 streams on this 1-core host made tick-time encoding
  a non-starter).

Wire cost per sample: 4 bits + 24/block header bits (block=256 default
=> 0.512 bytes/sample; mu-law is 1.0). Measured SNR: ~24 dB on tonal
program material, ~14 dB on white noise (mu-law ~38 dB) — the
most-transfer-starved option; tagging top-1 is tested to stay stable vs
the float32 path (tests/test_adpcm.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# IMA/DVI ADPCM tables (the published standard constants).
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

DEFAULT_BLOCK = 256
# Serving uses a smaller block so stream chunk/hop boundaries (multiples
# of the front-end hop, 160*even = 320k samples) land on whole blocks —
# the wire can then be sliced per tick with zero re-coding. 3 header
# bytes / 64 samples = 0.547 bytes/sample (vs 0.512 at block 256).
SERVE_BLOCK = 64


def wire_block_bytes(block: int = DEFAULT_BLOCK, bits: int = 4) -> int:
    """Bytes per self-contained wire block (block*bits/8 codes + 3 header)."""
    return block * bits // 8 + 3


def wire_length(n: int, block: int = DEFAULT_BLOCK, bits: int = 4) -> int:
    """Wire bytes per row for n samples (codes + per-block headers)."""
    return (-(-n // block)) * wire_block_bytes(block, bits)


def wire_bytes_per_sample(block: int = DEFAULT_BLOCK, bits: int = 4) -> float:
    """Wire cost per sample (4-bit: 0.512 at block=256; mu-law is 1.0)."""
    return bits / 8 + 3.0 / block


def _as_int16_rows(x: np.ndarray) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """[..., n] float [-1,1] or int16 -> ([rows, n] int16, leading shape);
    quantization via the one shared audio_io.pcm16_quantize seam."""
    from mla_tpu.data.audio_io import pcm16_quantize

    x = np.asarray(x)
    lead = x.shape[:-1]
    return pcm16_quantize(x).reshape(-1, x.shape[-1]), lead


def _pad_blocks(x: np.ndarray, block: int) -> np.ndarray:
    """Edge-pad the sample axis to a whole number of blocks (diff 0 in the
    pad, so it costs the quantizer nothing)."""
    n = x.shape[-1]
    pad = (-n) % block
    if pad:
        x = np.concatenate([x, np.repeat(x[:, -1:], pad, axis=1)], axis=1)
    return x


def _init_index(blocks: np.ndarray) -> np.ndarray:
    """Deterministic per-block start index: smallest step >= the block's
    integer mean |first difference| (exactly reproduced by the C++
    encoder — integer sums and divide only). blocks: [L, B] int32."""
    b = blocks.shape[1]
    if b < 2:
        return np.zeros(blocks.shape[0], np.int32)
    mean_diff = np.abs(np.diff(blocks, axis=1)).sum(axis=1) // (b - 1)
    return np.searchsorted(STEP_TABLE, mean_diff).clip(0, 88).astype(np.int32)


def adpcm4_encode(x: np.ndarray, block: int = DEFAULT_BLOCK) -> np.ndarray:
    """Encode int16 PCM (or float [-1,1]) [..., n] -> one uint8 wire
    buffer [..., wire_length(n, block)] (layout in the module docstring).

    Uses the native C++ encoder when built (threaded across rows,
    bit-identical to this numpy path); the numpy path vectorizes across
    all rows*blocks and loops only over the ``block`` axis.
    """
    xi, lead = _as_int16_rows(x)
    xi = _pad_blocks(xi, block)
    rows, n_pad = xi.shape
    n_blocks = n_pad // block

    from mla_tpu.data import native

    if native.available():
        return native.adpcm4_encode(xi, block).reshape(lead + (-1,))

    blocks = xi.astype(np.int32).reshape(rows * n_blocks, block)  # [L, B]
    pred = blocks[:, 0].copy()
    index = _init_index(blocks)
    pred0 = pred.astype(np.int16)
    index0 = index.astype(np.uint8)
    nibbles = np.empty((blocks.shape[0], block), np.uint8)
    for i in range(block):
        step = STEP_TABLE[index]
        diff = blocks[:, i] - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        n3 = (mag >= step).astype(np.int32)
        mag = mag - n3 * step
        h = step >> 1
        n2 = (mag >= h).astype(np.int32)
        mag = mag - n2 * h
        q = step >> 2
        n1 = (mag >= q).astype(np.int32)
        code = (sign << 3) | (n3 << 2) | (n2 << 1) | n1
        nibbles[:, i] = code
        # reconstruction feedback: identical to the decoder step
        delta = (step >> 3) + n3 * step + n2 * h + n1 * q
        pred = np.clip(pred + np.where(sign, -delta, delta), -32768, 32767)
        index = np.clip(index + INDEX_TABLE[code & 7], 0, 88)
    # block-interleaved wire: per block [nibbles block/2 | pred lo,hi | idx]
    packed = (nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)).astype(np.uint8)
    wire = np.concatenate(
        [packed.reshape(rows * n_blocks, block // 2),
         pred0.view(np.uint8).reshape(rows * n_blocks, 2),
         index0.reshape(rows * n_blocks, 1)],
        axis=1)
    return wire.reshape(lead + (-1,))


def _split_wire(wire, n_pad: int, block: int):
    """wire [R, W] -> (packed [R, n_pad/2], pred0 int32 [R, nb],
    index0 [R, nb]); works for numpy and jnp (int16 rebuilt from LE byte
    pairs with explicit sign handling, so no bitcast is needed). Wire is
    block-interleaved: [R, nb, block/2 + 3] units."""
    nb = n_pad // block
    u = wire.reshape(wire.shape[0], nb, block // 2 + 3)
    packed = u[:, :, :block // 2].reshape(wire.shape[0], n_pad // 2)
    lo = u[:, :, block // 2].astype("int32")
    hi = u[:, :, block // 2 + 1].astype("int32")
    pred0 = lo + (hi << 8)
    pred0 = pred0 - (pred0 >= 32768) * 65536  # sign of the int16 LE pair
    index0 = u[:, :, block // 2 + 2]
    return packed, pred0, index0


def adpcm4_decode(
    wire: np.ndarray,
    n: Optional[int] = None,
    block: int = DEFAULT_BLOCK,
    xp=np,
):
    """Wire buffer [..., W] -> float32 waveform [..., n] in [-1,1].

    ``xp`` selects the array module: numpy on host, jax.numpy inside the
    serving tier's jitted chunk program — one algorithm for both sides of
    the wire (the jnp path is a single ``lax.scan`` of length ``block``
    over the rows*n_blocks lane vector; all cross-block work is parallel).
    Reconstruction is bit-identical between xp=np and xp=jnp (exact int32
    math). ``n`` slices off block padding (default: all decoded samples).
    """
    w = wire.shape[-1]
    # W = n_pad/2 + 3*n_pad/block  =>  n_pad = W * 2*block / (block + 6)
    n_pad = (w * 2 * block) // (block + 6)
    if wire_length(n_pad, block) != w or (n is not None and n > n_pad):
        raise ValueError(f"wire width {w} is not a whole number of "
                         f"block={block} groups (or n={n} too large)")
    if xp is np:
        return _decode_np(wire, n, n_pad, block)
    return _decode_jnp(wire, n, n_pad, block)


def _unpack(packed, xp):
    lo = packed & 15
    hi = packed >> 4
    return xp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (-1,))


def _decode_np(wire, n, n_pad, block):
    wire = np.asarray(wire, np.uint8)
    lead = wire.shape[:-1]
    wire = wire.reshape(-1, wire.shape[-1])
    packed, pred, index = _split_wire(wire, n_pad, block)
    nib = _unpack(packed.astype(np.int32), np)
    l_rows = nib.shape[0]
    n_blocks = n_pad // block
    nib = nib.reshape(l_rows * n_blocks, block)
    pred = pred.astype(np.int32).reshape(-1)
    index = index.astype(np.int32).reshape(-1)
    out = np.empty((nib.shape[0], block), np.int32)
    for i in range(block):
        code = nib[:, i]
        step = STEP_TABLE[index]
        delta = (step >> 3) + ((code >> 2) & 1) * step \
            + ((code >> 1) & 1) * (step >> 1) + (code & 1) * (step >> 2)
        pred = np.clip(pred + np.where(code & 8, -delta, delta), -32768, 32767)
        index = np.clip(index + INDEX_TABLE[code & 7], 0, 88)
        out[:, i] = pred
    out = out.reshape(l_rows, n_pad)
    if n is not None:
        out = out[:, :n]
    return (out.astype(np.float32) / 32768.0).reshape(lead + (out.shape[-1],))


# --------------------------------------------------------------- 2-bit
# The thinnest wire rung (0.297 bytes/sample at block 64 — 1.84x thinner
# than adpcm4): code = sign<<1 | mag, delta = step/2 + mag*step, index
# adaptation {-1, +2} on mag. Quality measured before building
# (scripts/probe_adpcm_bits.py): ~14 dB SNR on tonal program material vs
# adpcm4's ~24 dB, flagship top-1 AND full top-5 stable vs the f32 path.
# adpcm4 stays the serving default; adpcm2 is the opt-in
# maximum-throughput rung for transfer-starved links.

INDEX_TABLE_2 = np.array([-1, 2], dtype=np.int32)  # by mag bit


def adpcm2_encode(x: np.ndarray, block: int = DEFAULT_BLOCK) -> np.ndarray:
    """Encode int16 PCM (or float [-1,1]) [..., n] -> one uint8 wire
    buffer [..., wire_length(n, block, bits=2)]. Same block-interleaved
    layout as adpcm4 with 2-bit codes: per block
    ``[codes block/4 | pred0 int16-LE | index0]`` (4 codes per byte,
    sample order from LSB).

    Quality envelope (scripts/probe_adpcm_bits.py, docs/RESULTS.md):
    ~14-15 dB SNR on program- and speech-shaped material, flagship
    top-1/top-5 stable, and LEVEL-INDEPENDENT down to ~-60 dBFS (the
    step adaptation tracks amplitude, so quantization error scales with
    the signal). Below that — peaks within ~10 LSB of the 7-LSB step
    floor — both rungs degrade and adpcm2 collapses first (measured
    6.6 dB on -66 dBFS speech vs adpcm4's 17.4). Use ``adpcm4`` only
    for near-noise-floor feeds; otherwise the envelope difference is a
    flat ~9 dB at 1.84x less wire."""
    xi, lead = _as_int16_rows(x)
    xi = _pad_blocks(xi, block)
    rows, n_pad = xi.shape
    n_blocks = n_pad // block

    from mla_tpu.data import native

    if native.available():
        return native.adpcm2_encode(xi, block).reshape(lead + (-1,))

    blocks = xi.astype(np.int32).reshape(rows * n_blocks, block)
    pred = blocks[:, 0].copy()
    index = _init_index(blocks)
    pred0 = pred.astype(np.int16)
    index0 = index.astype(np.uint8)
    codes = np.empty((blocks.shape[0], block), np.uint8)
    for i in range(block):
        step = STEP_TABLE[index]
        diff = blocks[:, i] - pred
        sign = (diff < 0).astype(np.int32)
        mag = (np.abs(diff) >= step).astype(np.int32)
        codes[:, i] = (sign << 1) | mag
        # reconstruction feedback: identical to the decoder step
        delta = (step >> 1) + mag * step
        pred = np.clip(pred + np.where(sign, -delta, delta), -32768, 32767)
        index = np.clip(index + INDEX_TABLE_2[mag], 0, 88)
    packed = (codes[:, 0::4] | (codes[:, 1::4] << 2)
              | (codes[:, 2::4] << 4) | (codes[:, 3::4] << 6)).astype(np.uint8)
    wire = np.concatenate(
        [packed.reshape(rows * n_blocks, block // 4),
         pred0.view(np.uint8).reshape(rows * n_blocks, 2),
         index0.reshape(rows * n_blocks, 1)],
        axis=1)
    return wire.reshape(lead + (-1,))


def adpcm2_decode(
    wire: np.ndarray,
    n: Optional[int] = None,
    block: int = DEFAULT_BLOCK,
    xp=np,
):
    """2-bit wire buffer [..., W] -> float32 waveform [..., n] in [-1,1].
    Same dual-path contract as adpcm4_decode (xp=np host / xp=jnp inside
    the jitted chunk program, bit-identical reconstruction)."""
    w = wire.shape[-1]
    # W = n_pad/4 + 3*n_pad/block  =>  n_pad = W * 4*block / (block + 12)
    n_pad = (w * 4 * block) // (block + 12)
    if wire_length(n_pad, block, bits=2) != w or (n is not None and n > n_pad):
        raise ValueError(f"wire width {w} is not a whole number of "
                         f"2-bit block={block} groups (or n={n} too large)")
    if xp is np:
        return _decode2_np(wire, n, n_pad, block)
    return _decode2_jnp(wire, n, n_pad, block)


def _split_wire2(wire, n_pad: int, block: int):
    """2-bit twin of _split_wire: [R, W] -> (packed [R, n_pad/4],
    pred0 int32 [R, nb], index0 [R, nb])."""
    nb = n_pad // block
    u = wire.reshape(wire.shape[0], nb, block // 4 + 3)
    packed = u[:, :, :block // 4].reshape(wire.shape[0], n_pad // 4)
    lo = u[:, :, block // 4].astype("int32")
    hi = u[:, :, block // 4 + 1].astype("int32")
    pred0 = lo + (hi << 8)
    pred0 = pred0 - (pred0 >= 32768) * 65536
    index0 = u[:, :, block // 4 + 2]
    return packed, pred0, index0


def _decode2_np(wire, n, n_pad, block):
    wire = np.asarray(wire, np.uint8)
    lead = wire.shape[:-1]
    wire = wire.reshape(-1, wire.shape[-1])
    packed, pred, index = _split_wire2(wire, n_pad, block)
    packed = packed.astype(np.int32)
    codes = np.stack([(packed >> s) & 3 for s in (0, 2, 4, 6)],
                     axis=-1).reshape(packed.shape[0], -1)
    l_rows = codes.shape[0]
    n_blocks = n_pad // block
    codes = codes.reshape(l_rows * n_blocks, block)
    pred = pred.astype(np.int32).reshape(-1)
    index = index.astype(np.int32).reshape(-1)
    out = np.empty((codes.shape[0], block), np.int32)
    for i in range(block):
        code = codes[:, i]
        mag = code & 1
        step = STEP_TABLE[index]
        delta = (step >> 1) + mag * step
        pred = np.clip(pred + np.where(code & 2, -delta, delta),
                       -32768, 32767)
        index = np.clip(index + INDEX_TABLE_2[mag], 0, 88)
        out[:, i] = pred
    out = out.reshape(l_rows, n_pad)
    if n is not None:
        out = out[:, :n]
    return (out.astype(np.float32) / 32768.0).reshape(lead + (out.shape[-1],))


def _decode2_jnp(wire, n, n_pad, block):
    import jax.numpy as jnp
    from jax import lax

    # Same TPU lowering rules as _decode_jnp: one-hot select-and-sum step
    # lookup (int32, never a gather or an f32 dot), and NO minor-dim
    # interleave — the scan consumes the FOUR 2-bit code streams of each
    # packed byte separately (4 decode updates per step, block/4 steps)
    # and the outputs re-interleave via interior padding.
    step_t = jnp.asarray(STEP_TABLE, jnp.int32)
    iota89 = jnp.arange(89, dtype=jnp.int32)
    wire = jnp.asarray(wire).astype(jnp.uint8)
    lead = wire.shape[:-1]
    wire = wire.reshape(-1, wire.shape[-1])
    packed, pred, index = _split_wire2(wire, n_pad, block)
    l_rows = packed.shape[0]
    n_blocks = n_pad // block
    packed = packed.astype(jnp.int32).reshape(l_rows * n_blocks, block // 4)
    streams = [((packed >> s) & 3).T for s in (0, 2, 4, 6)]  # [block/4, L]
    pred = pred.astype(jnp.int32).reshape(-1)
    index = index.astype(jnp.int32).reshape(-1)

    def one(carry, code):
        pred, index = carry
        step = jnp.sum(
            jnp.where(index[:, None] == iota89[None, :], step_t[None, :], 0),
            axis=1)
        mag = code & 1
        delta = (step >> 1) + mag * step
        pred = jnp.clip(pred + jnp.where(code & 2, -delta, delta),
                        -32768, 32767)
        index = jnp.clip(index + jnp.where(mag > 0, 2, -1), 0, 88)
        return (pred, index), pred

    def step_fn(carry, codes):
        ys = []
        for c in codes:
            carry, p = one(carry, c)
            ys.append(p)
        return carry, tuple(ys)

    _, ys = lax.scan(step_fn, (pred, index), tuple(streams))
    # re-interleave the 4 phase streams via interior padding (width 3)
    out = None
    for phase, y in enumerate(ys):
        padded = lax.pad(y.T, jnp.int32(0),
                         [(0, 0, 0), (phase, 3 - phase, 3)])
        out = padded if out is None else out + padded
    out = out.reshape(l_rows, n_pad)
    if n is not None:
        out = out[:, :n]
    return (out.astype(jnp.float32) / 32768.0).reshape(
        lead + (out.shape[-1],)
    )


def _decode_jnp(wire, n, n_pad, block):
    import jax.numpy as jnp
    from jax import lax

    # TPU lowering note (measured on-chip): a per-sample jnp.take into the
    # 89-entry step table costs ~9 ns/sample as an XLA gather — 11.6 ms on
    # a serving tick, eating the codec's transfer win. The lookup is a
    # one-hot SELECT-AND-SUM in int32 (compare + where + sum, pure VPU):
    # an f32 one-hot @ table dot would hit XLA's default bf16 matmul
    # precision on TPU and round table entries (bf16 has 8 mantissa bits;
    # 29794 is not representable), silently breaking the encoder/decoder
    # bit agreement. The 8-entry index table has a closed form
    # (m<4 -> -1, else 2m-6) and needs no lookup at all.
    step_t = jnp.asarray(STEP_TABLE, jnp.int32)
    iota89 = jnp.arange(89, dtype=jnp.int32)
    wire = jnp.asarray(wire).astype(jnp.uint8)
    lead = wire.shape[:-1]
    wire = wire.reshape(-1, wire.shape[-1])
    packed, pred, index = _split_wire(wire, n_pad, block)
    l_rows = packed.shape[0]
    n_blocks = n_pad // block
    # TPU layout note: interleaving the two nibbles of each byte via
    # stack(..., axis=-1) creates a [.., 2] minor dim that XLA pads to its
    # (8,128) tile — a 64-128x memory blowup (measured: 29 GB OOM inside a
    # batch-256 train step). Instead the scan consumes the even and odd
    # nibble STREAMS separately (two decode updates per step, half the
    # scan length) and the outputs re-interleave via interior padding —
    # every array stays minor-dim wide.
    packed = packed.astype(jnp.int32).reshape(l_rows * n_blocks, block // 2)
    lo = (packed & 15).T   # [block/2, L]: even samples' codes
    hi = (packed >> 4).T   # odd samples' codes
    pred = pred.astype(jnp.int32).reshape(-1)
    index = index.astype(jnp.int32).reshape(-1)

    def one(carry, code):
        pred, index = carry
        step = jnp.sum(
            jnp.where(index[:, None] == iota89[None, :], step_t[None, :], 0),
            axis=1)
        delta = (step >> 3) + ((code >> 2) & 1) * step \
            + ((code >> 1) & 1) * (step >> 1) + (code & 1) * (step >> 2)
        pred = jnp.clip(pred + jnp.where(code & 8, -delta, delta),
                        -32768, 32767)
        m = code & 7
        index = jnp.clip(index + jnp.where(m < 4, -1, 2 * m - 6), 0, 88)
        return (pred, index), pred

    def step_fn(carry, codes):
        carry, p_even = one(carry, codes[0])
        carry, p_odd = one(carry, codes[1])
        return carry, (p_even, p_odd)

    _, (ys_even, ys_odd) = lax.scan(step_fn, (pred, index), (lo, hi))
    even = ys_even.T  # [L, block/2]
    odd = ys_odd.T
    out = (lax.pad(even, jnp.int32(0), [(0, 0, 0), (0, 1, 1)])
           + lax.pad(odd, jnp.int32(0), [(0, 0, 0), (1, 0, 1)]))
    out = out.reshape(l_rows, n_pad)
    if n is not None:
        out = out[:, :n]
    return (out.astype(jnp.float32) / 32768.0).reshape(
        lead + (out.shape[-1],)
    )
