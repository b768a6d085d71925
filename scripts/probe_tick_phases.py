"""Phase-level timing of the native front's tick loop (where does the
host-side cost beyond the device tick go?).

Subclasses NativeTagServer with an instrumented _tick_loop (same logic,
per-phase cumulative perf_counter sums) and drives it with the C++ load
generator on the adpcm4 wire. By default probes the PACKED hot path
(one flat uint8 staging buffer, round 4); pass ``legacy`` to probe the
3-upload path the sharded server still uses. Run EXCLUSIVELY on the
real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_tick_phases.py [sync01] [legacy]

Round-3 finding this probe produced (3-upload loop, 8 adpcm4 streams):
6.25 ms/tick of Python work — 1.05 copy + 4.09 put + dispatch/ack —
vs the 8.57 ms device tick. The packed loop exists to delete the copy
and collapse the three transfers into one.
"""

import ctypes
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from mla_tpu import get_config
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve import native_front
from mla_tpu.serve.client import _CTYPE, _WireEncoder
from mla_tpu.serve.streaming import _samples_per_patches

N_STREAMS = 8
CHUNK_PATCHES = 10
TICKS = 12
REPEATS = 5


class ProbedServer(native_front.NativeTagServer):
    legacy = False

    def __init__(self, *a, **k):
        self.ph = {"wait": 0.0, "copy": 0.0, "put": 0.0, "step": 0.0,
                   "ack": 0.0, "n": 0}
        super().__init__(*a, **k)

    def _tick_loop(self):  # instrumented copy of the production loops
        srv = self.srv
        lib = self._lib
        chunk_bytes = self._cw_units * self._itemsize
        wav_bytes = srv.S * chunk_bytes
        ph = self.ph
        if srv._packed_step is not None and not self.legacy:
            # packed hot path: C++ gather writes wire rows + active vector
            # straight into one FRESH flat uint8 staging buffer per tick
            # (never mutated after jnp.asarray — see native_front); one
            # jnp.asarray per tick ("put"), no Python copy phase
            u8p = ctypes.POINTER(ctypes.c_uint8)
            while not self._closing:
                t0 = time.perf_counter()
                buf = np.empty(srv.packed_nbytes, np.uint8)
                wav_p = buf.ctypes.data_as(u8p)
                act_p = ctypes.cast(buf.ctypes.data + wav_bytes, u8p)
                n = lib.sf_wait_gather(self._h, wav_p, act_p, 200)
                t1 = time.perf_counter()
                if n < 0:
                    return
                if n == 0:
                    continue
                active = buf[wav_bytes:].astype(bool)
                t2 = time.perf_counter()
                dev_buf = jnp.asarray(buf)
                t3 = time.perf_counter()
                with self.dev:
                    srv.states, srv.tl = srv._packed_step(
                        srv.variables, srv.states, srv.tl, dev_buf)
                t4 = time.perf_counter()
                with self.host_lock:
                    srv._fed |= active
                lib.sf_tick_done(self._h)
                t5 = time.perf_counter()
                ph["wait"] += t1 - t0
                ph["copy"] += t2 - t1
                ph["put"] += t3 - t2
                ph["step"] += t4 - t3
                ph["ack"] += t5 - t4
                ph["n"] += 1
            return
        wav_buf = np.empty(wav_bytes, np.uint8)
        act_buf = np.zeros(srv.S, np.uint8)
        wav_p = wav_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        act_p = act_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        n_valid = np.full(srv.S, srv.chunk_patches, np.int32)
        while not self._closing:
            t0 = time.perf_counter()
            n = lib.sf_wait_gather(self._h, wav_p, act_p, 200)
            t1 = time.perf_counter()
            if n < 0:
                return
            if n == 0:
                continue
            wav = wav_buf.view(srv._buf_dtype).reshape(
                srv.S, self._cw_units).copy()
            active = act_buf.astype(bool)
            t2 = time.perf_counter()
            dev_args = srv._put_batch(wav, active, n_valid)
            t3 = time.perf_counter()
            with self.dev:
                srv.states, srv.tl = srv._batched_step(
                    srv.variables, srv.states, srv.tl, *dev_args)
            t4 = time.perf_counter()
            with self.host_lock:
                srv._fed |= active
            # tick gauges are counted in C++ at gather time (sf_counters)
            lib.sf_tick_done(self._h)
            t5 = time.perf_counter()
            ph["wait"] += t1 - t0
            ph["copy"] += t2 - t1
            ph["put"] += t3 - t2
            ph["step"] += t4 - t3
            ph["ack"] += t5 - t4
            ph["n"] += 1


def main():
    sync = sys.argv[1] if len(sys.argv) > 1 else "0"
    ProbedServer.legacy = "legacy" in sys.argv[2:]
    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    wav0 = np.zeros(16000 * 2, np.float32)
    patches = waveform_to_patches(jax.numpy.asarray(wav0)[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    srv = ProbedServer(cfg, variables, port=0, max_streams=N_STREAMS,
                       chunk_patches=CHUNK_PATCHES, transfer_dtype="adpcm4")
    host, port = srv.server_address

    exe = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "bench_client")
    rng = np.random.default_rng(0)
    sps = _samples_per_patches(cfg.frontend, CHUNK_PATCHES)
    chunk = (rng.standard_normal(sps) * 0.1).astype(np.float32)
    body = np.ascontiguousarray(_WireEncoder("adpcm4").encode(chunk)).tobytes()
    with tempfile.NamedTemporaryFile(suffix=".wire") as bf:
        bf.write(body)
        bf.flush()
        t0 = time.perf_counter()
        out = subprocess.run(
            [exe, host, str(port), str(N_STREAMS), bf.name, _CTYPE["adpcm4"],
             str(TICKS), str(REPEATS), sync],
            capture_output=True, timeout=600)
        wall = time.perf_counter() - t0
    print(out.stdout.decode().strip())
    if out.returncode != 0:
        print(out.stderr.decode()[-400:])
        return 1
    ph = dict(srv.ph)
    srv.server_close()
    n = max(1, ph.pop("n"))
    total = sum(ph.values())
    mode = "legacy-3-upload" if ProbedServer.legacy else "packed"
    print(f"mode={mode} ticks={n} wall={wall:.2f}s  per-tick phases (ms):")
    for k, v in ph.items():
        print(f"  {k:5s}: {v / n * 1e3:6.2f}")
    print(f"  sum  : {total / n * 1e3:6.2f} (loop only; gaps = client/via-C++)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
