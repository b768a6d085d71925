"""Front-end kernel benchmark (BASELINE.json:5: fused front-end ≥ XLA path;
throughput recorded against the bandwidth and MXU rooflines).

Times the fused Pallas kernel (T1) and the XLA fallback on the real chip at
two precisions (f32 HIGHEST = full parity; bf16x3 split-GEMM = ~3e-4), with
one host fetch per measurement (block_until_ready is a no-op on axon and
per-call fetches hit a ~27 ms tunnel RTT floor — see
.claude/skills/verify/SKILL.md). Reports the MEDIAN of REPEATS timed runs.

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
REPEATS = 5

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

    import dataclasses

    cfg3 = dataclasses.replace(cfg, precision="bf16x3")
    cases = {
        "pallas": lambda w: fused_log_mel_patches(w, cfg, precision="highest"),
        "pallas_bf16x3": lambda w: fused_log_mel_patches(w, cfg, precision="bf16x3"),
        "xla": lambda w: waveform_to_patches(w, cfg),
        "xla_bf16x3": lambda w: waveform_to_patches(w, cfg3),
    }
    results = {}
    for name, fe in cases.items():
        f = jax.jit(lambda w, fe=fe: jnp.sum(fe(w)))
        np.asarray(f(wav))  # compile + warmup
        # warm with the SAME list length (combine specializes per length)
        np.asarray(combine([f(wav) for _ in range(ITERS)]))
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            # K dispatches, ONE host fetch: avoids the per-fetch RTT floor
            np.asarray(combine([f(wav) for _ in range(ITERS)]))
            times.append((time.perf_counter() - t0) / ITERS)
        results[name] = {
            "median_ms": float(np.median(times) * 1e3),
            "spread_ms": float((max(times) - min(times)) * 1e3),
        }

    bytes_moved = frontend_bytes_moved(B, n, cfg)
    # derive the GEMM geometry from the same helpers the kernel uses so the
    # roofline tracks config/trim changes
    from mla_tpu.ops.frontend import trimmed_spectral_bases
    from mla_tpu.ops.pallas_frontend import _framing_plan

    window, hop, used_frames, _, g, _ = _framing_plan(cfg, n)
    n_bins = trimmed_spectral_bases(cfg)[3]
    k = g * hop
    flops = B * (
        2 * used_frames * k * n_bins * 2
        + 2 * used_frames * n_bins * cfg.num_mel_bins
    )
    dt = results["pallas"]["median_ms"] / 1e3
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
                "pallas_bf16x3_ms": round(results["pallas_bf16x3"]["median_ms"], 3),
                "xla_fallback_ms": round(results["xla"]["median_ms"], 3),
                "xla_bf16x3_ms": round(results["xla_bf16x3"]["median_ms"], 3),
                "speedup_vs_xla": round(results["xla"]["median_ms"] / (dt * 1e3), 2),
                "spread_ms": {k: round(v["spread_ms"], 3) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
