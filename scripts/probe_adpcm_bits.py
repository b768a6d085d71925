"""Quality probe: would a 2-bit or 3-bit block IMA ADPCM wire hold up?

Serving's device tick is transfer-dominated even on the adpcm4 wire
(6.1 of 8.57 ms is the 0.67 MB upload — docs/RESULTS.md), so a thinner
wire lifts the device ceiling almost linearly. This probe answers the
GATE question before any plumbing gets built: does the flagship model's
top-1 survive the extra quantization noise?

Prototypes 2-bit (code = sign|mag, delta = step/2 + mag*step) and 3-bit
(code = sign|mag2, delta = step/4 + b1*step/2 + b2*step) variants of the
same block-independent structure as data/adpcm.py (per-block pred0 +
index0 header, reconstruction-feedback encode), numpy only. Reports SNR
on the test program material and — on the real chip — flagship
527-class score drift vs the float32 path.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_adpcm_bits.py
"""

import json
import sys

import numpy as np

from mla_tpu.data.adpcm import STEP_TABLE, _init_index

BLOCK = 64


def _blocks(x):
    from mla_tpu.data.audio_io import pcm16_quantize

    xi = pcm16_quantize(x).astype(np.int32)
    pad = (-xi.size) % BLOCK
    if pad:
        xi = np.concatenate([xi, np.repeat(xi[-1:], pad)])
    return xi.reshape(-1, BLOCK)


def codec_roundtrip(x, bits):
    """Encode+decode per block with reconstruction feedback; returns the
    decoded float waveform (no packing — this is a quality probe)."""
    blocks = _blocks(x)
    pred = blocks[:, 0].copy()
    index = _init_index(blocks)
    out = np.empty_like(blocks)
    n_mag = bits - 1
    for i in range(BLOCK):
        step = STEP_TABLE[index]
        diff = blocks[:, i] - pred
        sign = diff < 0
        mag_t = np.abs(diff)
        # greedy magnitude bits, mirrored exactly in the decode delta
        mag = np.zeros_like(step)
        delta = step >> n_mag  # rounding half-step
        rem = mag_t
        for b in range(n_mag - 1, -1, -1):
            w = step >> (n_mag - 1 - b)
            bit = (rem >= w).astype(np.int32)
            rem = rem - bit * w
            mag |= bit << b
            delta = delta + bit * w
        pred = np.clip(pred + np.where(sign, -delta, delta), -32768, 32767)
        if bits == 2:
            index = np.clip(index + np.where(mag > 0, 2, -1), 0, 88)
        else:  # 3-bit: IMA-style table {-1,-1,1,2} over mag
            adj = np.select([mag <= 1, mag == 2], [-1, 1], 2)
            index = np.clip(index + adj, 0, 88)
        out[:, i] = pred
    return (out.reshape(-1)[: x.size].astype(np.float32) / 32768.0)


def _program(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 2818 * t)
         + 0.05 * rng.standard_normal(t.size))
    return np.clip(x, -1, 1).astype(np.float32)


def _speechlike(seconds=2.0, sr=16000, seed=2):
    """Speech-shaped test material (round-3 VERDICT weak item 3: the
    adpcm2 envelope was probed on tonal program material only): a 120 Hz
    harmonic source with two formant-band emphases, a 4 Hz syllabic
    amplitude envelope WITH silent pauses, and vibrato — the
    hard-for-ADPCM features of speech (rapid level swings, pitch
    harmonics, silence-to-voice onsets)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.0 * t))  # vibrato
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros_like(t)
    for h, (lo, hi) in ((1, (300, 900)), (2, (300, 900)), (3, (300, 900)),
                        (7, (800, 1400)), (8, (800, 1400)),
                        (15, (1700, 2300)), (16, (1700, 2300))):
        fh = h * 120.0
        w = 0.5 if lo <= fh <= hi else 0.15
        x = x + w / h * np.sin(h * phase)
    syll = np.clip(np.sin(2 * np.pi * 4.0 * t), 0, None) ** 0.5  # pauses
    x = x * syll + 0.01 * rng.standard_normal(t.size)
    x = x / np.max(np.abs(x)) * 0.5
    return x.astype(np.float32)


def _snr(x, y):
    return float(10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2)))


def main():
    from mla_tpu.data.adpcm import SERVE_BLOCK, adpcm4_decode, adpcm4_encode

    tone = _program()
    noise = (np.random.default_rng(1).standard_normal(32000) * 0.1
             ).astype(np.float32)
    # envelope materials (VERDICT r3): speech-shaped, and QUIET versions
    # (-32 dB re full scale) of both — ADPCM's step adaptation is the
    # worry for low-level signals (the minimum step is 7 PCM16 LSB, so a
    # 0.01-amplitude signal lives ~327 LSB peak against +/-3 LSB dither
    # on the 2-bit rung)
    materials = {
        "tone": tone,
        "noise": noise,
        "speech": _speechlike(),
        "quiet_tone": (tone * 0.025).astype(np.float32),
        "quiet_speech": (_speechlike() * 0.025).astype(np.float32),
    }
    rows = {}
    rows["adpcm4"] = {"bytes_per_sample": 0.547}
    for name, x in materials.items():
        y4 = adpcm4_decode(adpcm4_encode(x, block=SERVE_BLOCK), n=x.size,
                           block=SERVE_BLOCK)
        rows["adpcm4"][f"snr_{name}"] = round(_snr(x, y4), 1)
    for bits, bps in ((3, 3 / 8 + 3 / 64), (2, 2 / 8 + 3 / 64)):
        rows[f"adpcm{bits}"] = {"bytes_per_sample": round(bps, 3)}
        for name, x in materials.items():
            rows[f"adpcm{bits}"][f"snr_{name}"] = round(
                _snr(x, codec_roundtrip(x, bits)), 1)

    # score drift on the real chip: flagship model, f32 vs decoded feeds
    import jax
    import jax.numpy as jnp

    from mla_tpu import get_config
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches

    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    drift_wavs = {
        "tone": _program(seconds=10.0, seed=3),
        "speech": _speechlike(seconds=10.0, seed=4),
        "quiet_speech": (_speechlike(seconds=10.0, seed=4) * 0.025
                         ).astype(np.float32),
    }
    patches = waveform_to_patches(
        jnp.asarray(drift_wavs["tone"])[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)

    @jax.jit
    def scores(w):
        return model.apply(
            variables, waveform_to_patches(w[None], cfg.frontend))[0]

    for mname, wav in drift_wavs.items():
        s_f32 = np.asarray(scores(jnp.asarray(wav)))
        for bits in (4, 3, 2):
            if bits == 4:
                y = adpcm4_decode(adpcm4_encode(wav, block=SERVE_BLOCK),
                                  n=wav.size, block=SERVE_BLOCK)
            else:
                y = codec_roundtrip(wav, bits)
            s = np.asarray(scores(jnp.asarray(y)))
            rows[f"adpcm{bits}"].update({
                f"score_maxdiff_{mname}":
                    round(float(np.max(np.abs(s - s_f32))), 5),
                f"top1_match_{mname}": bool(np.argmax(s) == np.argmax(s_f32)),
                f"top5_overlap_{mname}": int(len(set(np.argsort(-s)[:5])
                                             & set(np.argsort(-s_f32)[:5]))),
            })
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
