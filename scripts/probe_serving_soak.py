"""Production-ops serving soak (round 5): sustained live-HTTP load with
periodic weight hot-reloads and health reads, all at once.

Every serving measurement so far exercised ONE surface at a time (a
bench burst, a reload probe, a healthz unit test). This soak runs the
integrated story the way a deployment would see it:

  - native C++ front, adpcm4 wire, 8 concurrent streams, sync feeds,
    driven by the C++ load generator in back-to-back bursts for N
    minutes (stream open/feed/scores/close churn included — each burst
    opens fresh streams);
  - a reloader thread hot-swaps the full 7.8 M-param tree every 30 s
    (prepare outside the lock / pointer swap inside — round-5 fix);
  - a health thread GETs /v1/healthz every 5 s and checks the tick
    gauges advance.

Pass/fail: every burst completes, zero healthz errors, zero reload
errors, and the per-burst throughput band is reported (the tunnel
drifts ~40% between sessions — the soak asserts LIVENESS and stability,
not an absolute number).

Run EXCLUSIVELY on the real chip:

    python -u scripts/probe_serving_soak.py [minutes]
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from mla_tpu import get_config
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve import native_front
from mla_tpu.serve.client import _CTYPE, _WireEncoder
from mla_tpu.serve.streaming import _samples_per_patches

S = 8
CHUNK_PATCHES = 10
TICKS_PER_BURST = 40
RELOAD_EVERY_S = 30.0
HEALTH_EVERY_S = 5.0

SMOKE = os.environ.get("MLA_PROBE_SMOKE") == "1"


def main():
    global TICKS_PER_BURST, RELOAD_EVERY_S, HEALTH_EVERY_S
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        # scale EVERYTHING so a sub-minute CPU run still exercises >=2
        # bursts AND >=1 reload + several health reads (round-5 review:
        # un-scaled 30 s reloads never fired inside a 0.6-min smoke)
        minutes = min(minutes, 0.6)
        TICKS_PER_BURST = 4
        RELOAD_EVERY_S = 4.0
        HEALTH_EVERY_S = 1.0
        cfg = get_config("audioset_full_dp",
                         overrides={"model.conv_channels": "8,16",
                                    "model.n_classes": "12"})
    else:
        cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)

    # the reload source alternates between two genuinely different trees
    trees = [jax.tree.map(lambda x: np.asarray(x) * 1.001, variables),
             jax.tree.map(lambda x: np.asarray(x), variables)]
    rstate = {"k": 0}

    def reload_fn():
        rstate["k"] += 1
        return trees[rstate["k"] % 2], {"soak_reload": rstate["k"]}

    srv = native_front.create_native_server(
        cfg, variables, port=0, max_streams=S, chunk_patches=CHUNK_PATCHES,
        transfer_dtype="adpcm4", reload_fn=reload_fn)
    host, port = srv.server_address

    from _client_util import ensure_bench_client

    exe = ensure_bench_client()
    rng = np.random.default_rng(0)
    sps = _samples_per_patches(cfg.frontend, CHUNK_PATCHES)
    chunk = (rng.standard_normal(sps) * 0.1).astype(np.float32)
    body = np.ascontiguousarray(_WireEncoder("adpcm4").encode(chunk)).tobytes()
    audio_s_per_burst = S * TICKS_PER_BURST * CHUNK_PATCHES * (
        cfg.frontend.example_hop_frames * cfg.frontend.hop_length
        / cfg.frontend.sample_rate)

    stop = threading.Event()
    errors = []
    reload_ms = []
    health = {"samples": 0, "errors": 0, "last_ticks": -1, "stalls": 0}

    def reloader():
        while not stop.wait(RELOAD_EVERY_S):
            t0 = time.perf_counter()
            try:
                srv.reload_now()
            except Exception as e:  # noqa: BLE001 - soak records, not raises
                errors.append(f"reload: {type(e).__name__}: {e}")
                return
            reload_ms.append((time.perf_counter() - t0) * 1e3)

    def health_reader():
        url = f"http://{host}:{port}/v1/healthz"
        while not stop.wait(HEALTH_EVERY_S):
            try:
                with urllib.request.urlopen(url, timeout=30) as r:
                    doc = json.loads(r.read())
                health["samples"] += 1
                t = doc.get("ticks", 0)
                # gauges must advance between samples while load runs
                if t == health["last_ticks"]:
                    health["stalls"] += 1
                health["last_ticks"] = t
            except Exception as e:  # noqa: BLE001
                health["errors"] += 1
                errors.append(f"healthz: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=reloader, daemon=True),
               threading.Thread(target=health_reader, daemon=True)]
    for t in threads:
        t.start()

    bursts = []
    t_start = time.time()
    deadline = t_start + minutes * 60.0
    try:
        with tempfile.NamedTemporaryFile(suffix=".wire") as bf:
            bf.write(body)
            bf.flush()
            while time.time() < deadline and not errors:
                t0 = time.perf_counter()
                try:
                    out = subprocess.run(
                        [exe, host, str(port), str(S), bf.name,
                         _CTYPE["adpcm4"], str(TICKS_PER_BURST), "1", "1"],
                        capture_output=True, timeout=600)
                except subprocess.TimeoutExpired:
                    # a wedged burst is soak DATA, not a crash: record it
                    # and keep the accumulated evidence (round-5 review)
                    errors.append("burst: bench_client wedged >600 s")
                    break
                dt = time.perf_counter() - t0
                if out.returncode != 0:
                    errors.append(f"burst: rc={out.returncode} "
                                  f"{out.stderr.decode()[-200:]}")
                    break
                bursts.append(audio_s_per_burst / dt)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=15)
        srv.server_close()
    elapsed_min = (time.time() - t_start) / 60.0

    ok = (not errors and len(bursts) >= 2 and health["errors"] == 0)
    print(json.dumps({
        "metric": "serving_soak",
        "ok": ok,
        "minutes": round(elapsed_min, 1),
        "minutes_requested": round(minutes, 1),
        "bursts": len(bursts),
        "total_audio_s": round(audio_s_per_burst * len(bursts), 0),
        "audio_s_per_s_min": round(min(bursts), 1) if bursts else None,
        "audio_s_per_s_med": round(float(np.median(bursts)), 1)
        if bursts else None,
        "audio_s_per_s_max": round(max(bursts), 1) if bursts else None,
        "reloads": len(reload_ms),
        "reload_ms_med": round(float(np.median(reload_ms)), 1)
        if reload_ms else None,
        "reload_ms_max": round(float(np.max(reload_ms)), 1)
        if reload_ms else None,
        "healthz_samples": health["samples"],
        "healthz_errors": health["errors"],
        "healthz_stalls": health["stalls"],
        "errors": errors[:5],
    }), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
