"""Streaming-server throughput benchmark (T11): audio-seconds/s per chip
for each wire format, flagship 527-class model, 8 concurrent streams.

Run EXCLUSIVELY on the real chip (a concurrent TPU job pollutes timing):

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serving.py

Timing rules for this host (see CLAUDE.md): jax.block_until_ready is a
no-op on the axon platform, so each repeat is synchronized by fetching the
scores to host once AFTER the timed tick burst; the per-fetch ~27 ms RTT
is excluded by keeping it outside the timed region's divisor only via
many ticks per repeat. On this tunnel host the tick is host->device
transfer-bound (~20 MB/s measured upload), which is exactly what the wire
formats attack: int16 halves the bytes of f32, uint8 mu-law quarters them.
"""

import json
import sys
import time

import numpy as np

import jax

from mla_tpu import get_config
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve.server import BatchedStreamingServer

N_STREAMS = 8
CHUNK_PATCHES = 10
TICKS_PER_REPEAT = 12
REPEATS = 5


def bench_dtype(cfg, variables, transfer_dtype: str,
                n_streams: int = N_STREAMS) -> dict:
    srv = BatchedStreamingServer(
        cfg, variables, max_streams=n_streams, chunk_patches=CHUNK_PATCHES,
        transfer_dtype=transfer_dtype,
    )
    sids = [srv.open() for _ in range(n_streams)]
    rng = np.random.default_rng(0)
    chunk = (rng.standard_normal(srv.chunk_samples) * 0.1).astype(np.float32)
    from mla_tpu.data.audio_io import pcm16_quantize

    if transfer_dtype == "int16":
        # feed wire-native bytes, as the HTTP layer does (audio/L16 /
        # audio/basic / audio/adpcm4 bodies pass straight into the wire
        # buffers) — the bench measures the serving tier, not a host-side
        # transcode
        chunk = pcm16_quantize(chunk)
    elif transfer_dtype == "adpcm4":
        from mla_tpu.data import adpcm

        chunk = adpcm.adpcm4_encode(pcm16_quantize(chunk),
                                    block=adpcm.SERVE_BLOCK)
    elif transfer_dtype == "uint8":
        from mla_tpu.data.audio_io import mulaw_encode

        chunk = mulaw_encode(chunk)
    audio_s_per_tick = n_streams * CHUNK_PATCHES * (
        cfg.frontend.example_hop_frames * cfg.frontend.hop_length
        / cfg.frontend.sample_rate
    )

    def burst(n):
        for _ in range(n):
            for sid in sids:
                srv.feed(sid, chunk)
            srv.tick()
        # host fetch = the only real synchronization on this platform
        return srv.scores(sids[0])

    burst(2)  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        burst(TICKS_PER_REPEAT)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = float((max(times) - min(times)) / med)
    return {
        "transfer_dtype": transfer_dtype,
        "n_streams": n_streams,
        "audio_seconds_per_s": TICKS_PER_REPEAT * audio_s_per_tick / med,
        "rel_spread": spread,
    }


def main():
    # optional argv: comma-separated wire formats (default: all four) and
    # stream count — one full sweep no longer fits a 10-minute tool budget
    dtypes = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["float32", "int16", "uint8", "adpcm4"])
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else N_STREAMS
    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    rows = [bench_dtype(cfg, variables, td, n_streams) for td in dtypes]
    for r in rows:
        print(json.dumps({**r, "audio_seconds_per_s": round(r["audio_seconds_per_s"], 1),
                          "rel_spread": round(r["rel_spread"], 3)}))
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
