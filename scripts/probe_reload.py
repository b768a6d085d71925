"""Zero-downtime weight hot-reload latency under live feeds (round 4/5).

Measures `TickLoop.reload_weights` while 8 adpcm4 streams feed
continuously, and again idle. Round 5 split the reload into
prepare_reload (the ~31 MB device_put, NO lock held) + commit_reload
(pointer swap under the device lock) — VERDICT r4 item 3 — so this
probe now reports THREE numbers:

  caller_ms  total reload_weights latency seen by the reloader (still
             pays the transfer; that cost is unavoidable and harmless)
  swap_ms    the lock-held window (prepare outside / commit inside) —
             the only part open streams can ever observe; bar: <10 ms
  tick_gap   max tick-to-tick gap while reloading vs a no-reload
             control window — the DOWNTIME streams actually see

Also asserts the swap is LIVE: scores after a reload reflect the new
weights.

Run EXCLUSIVELY on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_reload.py
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from mla_tpu import get_config
from mla_tpu.data import adpcm
from mla_tpu.data.audio_io import pcm16_quantize
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve.server import BatchedStreamingServer
from mla_tpu.serve.ticker import TickLoop

S = 8
RELOADS = 10

# MLA_PROBE_SMOKE=1: tiny config + minimal reps so the code path can be
# verified on CPU while the tunnel is down; numbers are meaningless there.
SMOKE = os.environ.get("MLA_PROBE_SMOKE") == "1"


def main():
    global RELOADS
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        RELOADS = 2
        cfg = get_config("audioset_full_dp",
                         overrides={"model.conv_channels": "8,16",
                                    "model.n_classes": "12"})
    else:
        cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    n_params = sum(x.size for x in jax.tree.leaves(variables))

    srv = BatchedStreamingServer(cfg, variables, max_streams=S,
                                 chunk_patches=10, transfer_dtype="adpcm4")
    loop = TickLoop(srv)
    sids = [loop.open() for _ in range(S)]
    rng = np.random.default_rng(0)
    chunk = adpcm.adpcm4_encode(
        pcm16_quantize((rng.standard_normal(srv.chunk_samples) * 0.1)
                       .astype(np.float32)), block=adpcm.SERVE_BLOCK)
    loop.feed(sids[0], chunk)  # compile + warm the tick program
    loop.scores(sids[0])

    # the reload payload: a genuinely different host-side tree (what the
    # auto-reload watcher hands over after an Orbax restore)
    host_vars = jax.tree.map(lambda x: np.asarray(x) * 1.001, variables)

    stop = threading.Event()

    def feeder(sid):
        while not stop.is_set():
            loop.feed(sid, chunk, sync=False, max_backlog=4)

    threads = [threading.Thread(target=feeder, args=(sid,), daemon=True)
               for sid in sids]
    for t in threads:
        t.start()
    time.sleep(2.0)  # reach steady-state ticking

    # tick-gap monitor: samples the tick counter and records the largest
    # interval with no completed tick (the downtime open streams see)
    gaps = {"control": 0.0, "reload": 0.0}
    phase = {"name": "control"}
    mon_stop = threading.Event()

    def monitor():
        last_n, last_t = loop.ticks, time.perf_counter()
        last_phase = phase["name"]
        while not mon_stop.is_set():
            n, now = loop.ticks, time.perf_counter()
            if phase["name"] != last_phase:
                # phase flip: restart the open interval so a gap that
                # started in the control window is not charged to reload
                last_phase = phase["name"]
                last_n, last_t = n, now
            elif n != last_n:
                gaps[last_phase] = max(gaps[last_phase], now - last_t)
                last_n, last_t = n, now
            time.sleep(0.001)
        # fold in the still-open interval: a freeze caused by the FINAL
        # reload would otherwise be dropped (feeders are still running
        # here — mon_stop is set before stop)
        gaps[last_phase] = max(gaps[last_phase],
                               time.perf_counter() - last_t)

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()
    time.sleep(3.0)  # control window: steady ticking, no reloads

    phase["name"] = "reload"
    live_ms, swap_ms = [], []
    for k in range(RELOADS):
        t0 = time.perf_counter()
        if k % 2 == 0:
            loop.reload_weights(host_vars)
        else:
            # decomposed: time the lock-held window alone (same code
            # path reload_weights takes internally)
            staged = loop.srv.prepare_reload(host_vars)
            t1 = time.perf_counter()
            with loop.dev, loop.cond:
                loop.srv.commit_reload(staged)
            swap_ms.append((time.perf_counter() - t1) * 1e3)
        live_ms.append((time.perf_counter() - t0) * 1e3)
        time.sleep(0.3)
    mon_stop.set()
    mon.join(timeout=5)
    stop.set()
    for t in threads:
        t.join(timeout=10)

    idle_ms = []
    for _ in range(RELOADS):
        t0 = time.perf_counter()
        loop.reload_weights(host_vars)
        idle_ms.append((time.perf_counter() - t0) * 1e3)

    # the swap must be live: new weights change the scores
    before = loop.scores(sids[0])
    bumped = jax.tree.map(lambda x: np.asarray(x) * 1.5, variables)
    loop.reload_weights(bumped)
    after = loop.scores(sids[0])
    assert not np.array_equal(before, after), "reload did not take effect"

    loop.stop()
    print(json.dumps({
        "metric": "reload_ms",
        "live_median_ms": round(float(np.median(live_ms)), 1),
        "live_max_ms": round(float(np.max(live_ms)), 1),
        "swap_median_ms": round(float(np.median(swap_ms)), 2),
        "swap_max_ms": round(float(np.max(swap_ms)), 2),
        "tick_gap_control_ms": round(gaps["control"] * 1e3, 1),
        "tick_gap_reload_ms": round(gaps["reload"] * 1e3, 1),
        "idle_median_ms": round(float(np.median(idle_ms)), 1),
        "n_params": int(n_params),
        "streams": S, "reloads": RELOADS,
        "swap_live": True,
    }), flush=True)


if __name__ == "__main__":
    main()
