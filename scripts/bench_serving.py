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

import argparse
import json
import sys
import threading
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

# client-SDK wire name for each server transfer_dtype
_WIRE = {"float32": "float32", "int16": "int16", "uint8": "mulaw",
         "adpcm4": "adpcm4", "adpcm2": "adpcm2"}
TIMELINE_CAP = 0  # --timeline-cap: measure the localization ring's tick cost


def bench_dtype(cfg, variables, transfer_dtype: str,
                n_streams: int = N_STREAMS) -> dict:
    srv = BatchedStreamingServer(
        cfg, variables, max_streams=n_streams, chunk_patches=CHUNK_PATCHES,
        transfer_dtype=transfer_dtype, timeline_cap=TIMELINE_CAP,
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
    elif transfer_dtype in ("adpcm4", "adpcm2"):
        from mla_tpu.data import adpcm

        enc = (adpcm.adpcm4_encode if transfer_dtype == "adpcm4"
               else adpcm.adpcm2_encode)
        chunk = enc(pcm16_quantize(chunk), block=adpcm.SERVE_BLOCK)
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


def bench_packed(cfg, variables, transfer_dtype: str,
                 n_streams: int = N_STREAMS) -> dict:
    """Direct drive of the ONE-UPLOAD packed tick program (the native
    front's hot path since round 4): wav rows + active vector in one flat
    uint8 transfer, unpacked on device. Compared same-session against
    bench_dtype (feed() buffering + the 3-upload program) this isolates
    what the packed layout buys at the program level, independent of the
    HTTP tier."""
    import jax.numpy as jnp

    srv = BatchedStreamingServer(
        cfg, variables, max_streams=n_streams, chunk_patches=CHUNK_PATCHES,
        transfer_dtype=transfer_dtype, timeline_cap=TIMELINE_CAP,
    )
    assert srv._packed_step is not None, "packed program needs mesh=None"
    sids = [srv.open() for _ in range(n_streams)]
    rng = np.random.default_rng(0)
    chunk = (rng.standard_normal(srv.chunk_samples) * 0.1).astype(np.float32)
    from mla_tpu.data.audio_io import pcm16_quantize

    if transfer_dtype == "int16":
        chunk = pcm16_quantize(chunk)
    elif transfer_dtype in ("adpcm4", "adpcm2"):
        from mla_tpu.data import adpcm

        enc = (adpcm.adpcm4_encode if transfer_dtype == "adpcm4"
               else adpcm.adpcm2_encode)
        chunk = enc(pcm16_quantize(chunk), block=adpcm.SERVE_BLOCK)
    elif transfer_dtype == "uint8":
        from mla_tpu.data.audio_io import mulaw_encode

        chunk = mulaw_encode(chunk)
    units, _ = srv._chunk_hop_units()
    itemsize = np.dtype(srv._buf_dtype).itemsize
    row = np.ascontiguousarray(chunk).view(np.uint8).ravel()
    assert row.size == units * itemsize, (row.size, units, itemsize)
    wav_bytes = n_streams * units * itemsize
    buf = np.zeros(srv.packed_nbytes, np.uint8)
    for s in range(n_streams):
        buf[s * row.size: (s + 1) * row.size] = row
    buf[wav_bytes:] = 1  # every stream active
    srv._fed[:] = True
    audio_s_per_tick = n_streams * CHUNK_PATCHES * (
        cfg.frontend.example_hop_frames * cfg.frontend.hop_length
        / cfg.frontend.sample_rate
    )

    def burst(n):
        for _ in range(n):
            srv.states, srv.tl = srv._packed_step(
                srv.variables, srv.states, srv.tl, jnp.asarray(buf))
        return srv.scores(sids[0])  # host fetch = the only real sync

    burst(2)  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        burst(TICKS_PER_REPEAT)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return {
        "transfer_dtype": transfer_dtype,
        "mode": "direct-packed",
        "n_streams": n_streams,
        "audio_seconds_per_s": TICKS_PER_REPEAT * audio_s_per_tick / med,
        "rel_spread": float((max(times) - min(times)) / med),
    }


def bench_http(cfg, variables, transfer_dtype: str,
               n_streams: int = N_STREAMS, sync: bool = True,
               native: bool = False) -> dict:
    """The DEPLOYABLE endpoint's capacity (round-2 VERDICT next item 2):
    N real concurrent TagClient streams over live HTTP sockets against
    create_server(), same wire format end-to-end. Bodies are pre-encoded
    once and posted via feed_wire() so the number measures the service
    (sockets + routing + batched ticks), not a client-side transcode —
    mirroring how bench_dtype feeds the device server wire-native.
    native=True swaps in the C++ ingest front (serve/native_front.py) —
    same API, hot path GIL-free."""
    from mla_tpu.serve.client import TagClient, _WireEncoder

    if native:
        from mla_tpu.serve.native_front import create_native_server as create_server
    else:
        from mla_tpu.serve.http import create_server

    srv = create_server(cfg, variables, port=0, max_streams=n_streams,
                        chunk_patches=CHUNK_PATCHES,
                        transfer_dtype=transfer_dtype,
                        timeline_cap=TIMELINE_CAP)
    host, port = srv.server_address[:2]
    serve_t = threading.Thread(target=srv.serve_forever, daemon=True)
    serve_t.start()
    try:
        client = TagClient(f"http://{host}:{port}", timeout=300.0)
        wire = _WIRE[transfer_dtype]
        from mla_tpu.serve.streaming import _samples_per_patches

        rng = np.random.default_rng(0)
        sps = _samples_per_patches(cfg.frontend, CHUNK_PATCHES)
        chunk = (rng.standard_normal(sps) * 0.1).astype(np.float32)
        body = _WireEncoder(wire).encode(chunk)
        streams = [client.stream(wire, sync=sync) for _ in range(n_streams)]
        audio_s_per_round = n_streams * CHUNK_PATCHES * (
            cfg.frontend.example_hop_frames * cfg.frontend.hop_length
            / cfg.frontend.sample_rate
        )
        barrier = threading.Barrier(n_streams + 1)
        stop = threading.Event()
        errs = []

        def worker(s):
            try:
                while True:
                    barrier.wait()
                    if stop.is_set():
                        return
                    for _ in range(TICKS_PER_REPEAT):
                        s.feed_wire(body)
                    barrier.wait()
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)
                stop.set()
                barrier.abort()  # unblock main instead of deadlocking

        ts = [threading.Thread(target=worker, args=(s,), daemon=True)
              for s in streams]
        for t in ts:
            t.start()

        def burst():
            try:
                barrier.wait()   # release workers
                barrier.wait()   # workers done feeding (state folded per feed)
            except threading.BrokenBarrierError:
                raise (errs[0] if errs else RuntimeError("bench barrier broken"))
            while not sync and client.health().get("backlog", 0):
                time.sleep(0.002)  # pipelined feeds: wait out the backlog
            return streams[0].scores(top_k=1)  # host fetch = the only sync

        burst()  # compile + warm
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            burst()
            times.append(time.perf_counter() - t0)
        stop.set()
        try:
            barrier.wait()  # let workers observe stop and exit
        except threading.BrokenBarrierError:
            pass
        if errs:
            raise errs[0]
        tick_stats = srv.state.ticker
        med = float(np.median(times))
        row = {
            "transfer_dtype": transfer_dtype,
            "mode": ("http-native" if native else "http")
                    + ("" if sync else "-async"),
            "n_streams": n_streams,
            "audio_seconds_per_s": TICKS_PER_REPEAT * audio_s_per_round / med,
            "rel_spread": float((max(times) - min(times)) / med),
            # batching efficiency: streams folded per device tick (ideal =
            # n_streams; the serial round-2 tier was pinned at ~1)
            "streams_per_tick": round(
                tick_stats.ticked_streams / max(1, tick_stats.ticks), 2),
        }
        for s in streams:
            s.close()
        return row
    finally:
        srv.shutdown()
        srv.server_close()


def bench_http_cpp(cfg, variables, transfer_dtype: str,
                   n_streams: int = N_STREAMS, sync: bool = True,
                   native: bool = False) -> dict:
    """bench_http with the load generator in C++ (native/bench_client).

    At 32 streams the Python variant's own client threads saturate this
    host's single CPU core (~4 ms of GIL-held work per request), so its
    number measures the load generator, not the server (streams_per_tick
    22-30/32 = the server idle-waiting for feeds). The C++ client costs
    ~tens of us per request, so the reported number is true server
    capacity. Same methodology: keep-alive connection per stream,
    barrier-coordinated bursts, one scores fetch per repeat as the device
    sync."""
    import subprocess
    import tempfile

    from _client_util import ensure_bench_client
    from mla_tpu.serve.client import _CTYPE, _WireEncoder
    from mla_tpu.serve.streaming import _samples_per_patches

    exe = ensure_bench_client()

    if native:
        from mla_tpu.serve.native_front import create_native_server as create_server
    else:
        from mla_tpu.serve.http import create_server

    srv = create_server(cfg, variables, port=0, max_streams=n_streams,
                        chunk_patches=CHUNK_PATCHES,
                        transfer_dtype=transfer_dtype,
                        timeline_cap=TIMELINE_CAP)
    host, port = srv.server_address[:2]
    serve_t = threading.Thread(target=srv.serve_forever, daemon=True)
    serve_t.start()
    try:
        wire = _WIRE[transfer_dtype]
        rng = np.random.default_rng(0)
        sps = _samples_per_patches(cfg.frontend, CHUNK_PATCHES)
        chunk = (rng.standard_normal(sps) * 0.1).astype(np.float32)
        body = np.ascontiguousarray(
            _WireEncoder(wire).encode(chunk)).tobytes()
        audio_s_per_round = n_streams * CHUNK_PATCHES * (
            cfg.frontend.example_hop_frames * cfg.frontend.hop_length
            / cfg.frontend.sample_rate
        )
        with tempfile.NamedTemporaryFile(suffix=".wire") as bf:
            bf.write(body)
            bf.flush()
            out = subprocess.run(
                [exe, host, str(port), str(n_streams), bf.name,
                 _CTYPE[wire], str(TICKS_PER_REPEAT), str(REPEATS),
                 "1" if sync else "0"],
                capture_output=True, timeout=1200)
        if out.returncode != 0:
            raise RuntimeError(
                f"bench_client failed: {out.stderr.decode()[-500:]}")
        times = json.loads(out.stdout.decode())["times"]
        tick_stats = srv.state.ticker
        med = float(np.median(times))
        return {
            "transfer_dtype": transfer_dtype,
            "mode": ("http-native" if native else "http")
                    + ("" if sync else "-async") + "-cppclient",
            "n_streams": n_streams,
            "audio_seconds_per_s": TICKS_PER_REPEAT * audio_s_per_round / med,
            "rel_spread": float((max(times) - min(times)) / med),
            "streams_per_tick": round(
                tick_stats.ticked_streams / max(1, tick_stats.ticks), 2),
        }
    finally:
        srv.shutdown()
        srv.server_close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wire", nargs="?", default="float32,int16,uint8,adpcm4",
                    help="comma-separated transfer dtypes (one full sweep "
                         "does not fit a 10-minute tool budget)")
    ap.add_argument("streams", nargs="?", type=int, default=N_STREAMS)
    ap.add_argument("--http", action="store_true",
                    help="also drive N concurrent TagClient streams over "
                         "live HTTP and report the ratio vs direct drive")
    ap.add_argument("--http-only", action="store_true")
    ap.add_argument("--async-feeds", action="store_true",
                    help="HTTP clients use pipelined feeds (?sync=0)")
    ap.add_argument("--native", action="store_true",
                    help="HTTP modes serve through the C++ ingest front "
                         "(native/serve_front.cpp) instead of the stdlib tier")
    ap.add_argument("--cpp-client", action="store_true",
                    help="HTTP modes drive load from native/bench_client "
                         "(C++ threads) instead of Python TagClient threads "
                         "— required for a server-bound number at >=32 "
                         "streams on this 1-core host")
    ap.add_argument("--chunk-patches", type=int, default=CHUNK_PATCHES,
                    help="patches folded per device tick (the serving "
                         "throughput/latency knob: bigger chunks amortize "
                         "the per-dispatch tunnel latency over more audio)")
    ap.add_argument("--packed", action="store_true",
                    help="also direct-drive the one-upload packed tick "
                         "program and report packed_vs_direct")
    ap.add_argument("--timeline-cap", type=int, default=0,
                    help="run the servers with the on-device localization "
                         "ring enabled (expected ~free: one masked "
                         "gather+scatter fused into the tick program; "
                         "compare against a 0 run same-session)")
    ap.add_argument("--no-doctor", action="store_true",
                    help="skip the pre/post GEMM exclusivity probes "
                         "(VERDICT r4 item 6: by default every number is "
                         "stamped with the chip-exclusivity context and "
                         "warn-tagged when GEMM spread > 5%%)")
    args = ap.parse_args()
    globals()["CHUNK_PATCHES"] = args.chunk_patches
    globals()["TIMELINE_CAP"] = args.timeline_cap
    dtypes = args.wire.split(",")
    n_streams = args.streams

    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    excl_pre = None
    if not args.no_doctor:
        from mla_tpu.utils.doctor import exclusivity_context

        excl_pre = exclusivity_context()
    rows = []
    for td in dtypes:
        direct = None
        if not args.http_only:
            direct = bench_dtype(cfg, variables, td, n_streams)
            rows.append(direct)
        if args.packed:
            p = bench_packed(cfg, variables, td, n_streams)
            if direct is not None:
                p["packed_vs_direct"] = round(
                    p["audio_seconds_per_s"] / direct["audio_seconds_per_s"], 3)
            rows.append(p)
        if args.http or args.http_only:
            fn = bench_http_cpp if args.cpp_client else bench_http
            h = fn(cfg, variables, td, n_streams,
                   sync=not args.async_feeds, native=args.native)
            if direct is not None:
                h["http_vs_direct"] = round(
                    h["audio_seconds_per_s"] / direct["audio_seconds_per_s"], 3)
            rows.append(h)
    excl = None
    if not args.no_doctor:
        from mla_tpu.utils.doctor import SERVING_SPREAD_BAR

        # probe again AFTER the sweep: a job that arrived mid-run shows
        # up here even if the pre-probe was calm
        excl_post = exclusivity_context()
        excl = {"pre": excl_pre, "post": excl_post,
                "exclusive": excl_pre["exclusive"] and excl_post["exclusive"]}
        if not excl["exclusive"]:
            print(f"WARNING: chip not exclusive (GEMM spread pre="
                  f"{excl_pre['gemm_spread']} post="
                  f"{excl_post['gemm_spread']} > {SERVING_SPREAD_BAR}) — "
                  f"absolute numbers below are suspect; rerun on a "
                  f"calm tunnel (docs/RESULTS.md rule)", file=sys.stderr)
    for r in rows:
        row = {**r, "audio_seconds_per_s": round(r["audio_seconds_per_s"], 1),
               "rel_spread": round(r["rel_spread"], 3)}
        if excl is not None:
            row["chip_exclusive"] = excl["exclusive"]
            row["gemm_spread"] = [excl["pre"]["gemm_spread"],
                                  excl["post"]["gemm_spread"]]
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
