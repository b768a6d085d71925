"""Front-end kernel benchmark (BASELINE.json:5: "front-end throughput within
90% of TPU memory-bandwidth roofline").

Times the fused Pallas kernel (T1) and the XLA fallback on the real chip
with a fori_loop-chained program (one host fetch per measurement — see
.claude/skills/verify/SKILL.md: block_until_ready is a no-op on axon, and
per-call fetches hit a ~27 ms tunnel RTT floor).

Note on the roofline: with VGGish semantics the kernel is intrinsically
compute-bound, not bandwidth-bound — ~480 f32 FLOP per HBM byte (DFT as
GEMM) — so "fraction of bandwidth roofline" is reported for the record but
the binding limit is the MXU; utilization against peak f32 matmul is
reported too.

Prints one JSON line.
"""

import json
import time

import numpy as np

B = 256
SECONDS = 10
ITERS = 10

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth
V5E_F32_TFLOPS = 197.0 / 4  # bf16 peak / 4 ~= f32 6-pass effective


def main():
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import FrontendConfig
    from mla_tpu.ops.frontend import waveform_to_patches
    from mla_tpu.ops.pallas_frontend import frontend_bytes_moved, fused_log_mel_patches

    cfg = FrontendConfig()
    n = SECONDS * cfg.sample_rate
    rng = np.random.default_rng(0)
    wav = jax.device_put(jnp.asarray((rng.standard_normal((B, n)) * 0.1).astype(np.float32)))

    combine = jax.jit(lambda xs: jnp.sum(jnp.stack(xs)))

    results = {}
    for name, fe in [
        ("pallas", lambda w: fused_log_mel_patches(w, cfg, precision="highest")),
        ("xla", lambda w: waveform_to_patches(w, cfg)),
    ]:
        f = jax.jit(lambda w: jnp.sum(fe(w)))
        np.asarray(f(wav))  # compile + warmup
        # warm with the SAME list length (combine specializes per length)
        np.asarray(combine([f(wav) for _ in range(ITERS)]))
        t0 = time.perf_counter()
        # K dispatches, ONE host fetch: avoids the per-fetch tunnel RTT floor
        np.asarray(combine([f(wav) for _ in range(ITERS)]))
        dt = (time.perf_counter() - t0) / ITERS
        results[name] = dt

    bytes_moved = frontend_bytes_moved(B, n, cfg)
    used_frames = 960
    flops = B * (2 * used_frames * 480 * 257 * 2 + 2 * used_frames * 257 * 64)
    dt = results["pallas"]
    gbps = bytes_moved / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "frontend_fused_GBps",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / V5E_HBM_GBPS, 4),
                "clips_per_sec": round(B / dt, 1),
                "ms_per_batch256": round(dt * 1e3, 3),
                "mxu_f32_utilization": round(flops / dt / 1e12 / V5E_F32_TFLOPS, 4),
                "xla_fallback_ms": round(results["xla"] * 1e3, 3),
                "speedup_vs_xla": round(results["xla"] / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
