"""Timeline ring cost + readout latency, measured in ONE process.

Answers two round-4 questions (VERDICT weak items 1/5; CLAUDE.md drift
caveat: only same-process comparisons are valid on this tunnel):

1. What does the on-device localization ring (`timeline_cap=64`) cost the
   serving tick?  Expected ~free — the ring update is one masked
   gather+scatter fused into the tick program, zero per-tick host traffic.
   Measured as bench_serving.bench_dtype (direct drive, 8 adpcm4 streams)
   at cap=0 then cap=64, same process.

2. What does a timeline window readout cost the host?  The round-4
   one-fetch path (clip scores ride the packed f32 blob, cursor/count
   bitcast into its tail — ops/attention_pool._pack_timeline) vs the
   two-fetch layout it replaced (separate finalize fetch + blob fetch).
   Expected ~27 ms saved per readout (one tunnel RTT).

Run EXCLUSIVELY on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_timeline_cost.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_serving as bs  # noqa: E402  (scripts/ neighbor)

from mla_tpu import get_config  # noqa: E402
from mla_tpu.models.zoo import build_model  # noqa: E402
from mla_tpu.ops.frontend import waveform_to_patches  # noqa: E402
from mla_tpu.serve.server import BatchedStreamingServer  # noqa: E402

CAP = 64
READOUT_REPS = 20

# MLA_PROBE_SMOKE=1: tiny config + minimal reps so the code path can be
# verified on CPU while the tunnel is down; numbers are meaningless there.
SMOKE = os.environ.get("MLA_PROBE_SMOKE") == "1"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        globals()["READOUT_REPS"] = 2
        bs.REPEATS, bs.TICKS_PER_REPEAT = 1, 2
        cfg = get_config("audioset_full_dp",
                         overrides={"model.conv_channels": "8,16",
                                    "model.n_classes": "12"})
    else:
        cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)

    # --- 1. tick cost: cap=0 vs cap=64, same process ---------------------
    rows = []
    for cap in (0, CAP):
        bs.TIMELINE_CAP = cap
        r = bs.bench_dtype(cfg, variables, "adpcm4", 8)
        r["timeline_cap"] = cap
        rows.append(r)
        print(json.dumps({**r, "audio_seconds_per_s":
                          round(r["audio_seconds_per_s"], 1)}), flush=True)
    ratio = rows[1]["audio_seconds_per_s"] / rows[0]["audio_seconds_per_s"]
    print(json.dumps({"metric": "timeline_ring_tick_ratio",
                      "cap64_vs_cap0": round(ratio, 3)}), flush=True)

    # --- 2. readout latency: one-fetch vs two-fetch, same server ---------
    srv = BatchedStreamingServer(cfg, variables, max_streams=2,
                                 chunk_patches=10, transfer_dtype="adpcm4",
                                 timeline_cap=CAP)
    sid = srv.open()
    rng = np.random.default_rng(0)
    from mla_tpu.data import adpcm
    from mla_tpu.data.audio_io import pcm16_quantize

    chunk = adpcm.adpcm4_encode(
        pcm16_quantize((rng.standard_normal(srv.chunk_samples) * 0.1)
                       .astype(np.float32)), block=adpcm.SERVE_BLOCK)
    for _ in range(8):
        srv.feed(sid, chunk)
        srv.tick()
    srv.scores(sid)  # sync + warm finalize

    def timed(fn):
        fn()  # warm (compile the pack program)
        ts = []
        for _ in range(READOUT_REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    one_ms = timed(lambda: srv.timeline_with_scores_from(
        srv.variables, srv.states, srv.tl, sid))
    two_ms = timed(lambda: (np.asarray(srv._finalize(srv.variables,
                                                     srv.states))[sid],
                            srv.timeline(sid)))
    print(json.dumps({"metric": "timeline_readout_ms",
                      "one_fetch_ms": round(one_ms, 2),
                      "scores_plus_timeline_ms": round(two_ms, 2),
                      "cap": CAP, "repeats": READOUT_REPS}), flush=True)


if __name__ == "__main__":
    main()
