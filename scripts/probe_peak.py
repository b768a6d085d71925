"""Re-measure the machine's compute/bandwidth peaks with chained on-device
work and one scalar fetch per timing (axon platform rules: block_until_ready
is a no-op, every host fetch costs ~27 ms RTT — see CLAUDE.md).

Motivation (round 5): bench.py's flagship numbers imply ~105 TFLOPS of
effective bf16 conv throughput (4,216 clips/s x ~25 GFLOP/clip), nearly 3x
the round-2 "measured machine peak" of 35.8 bf16 TFLOPS that every roofline
claim in docs/RESULTS.md is sized from. One of the two is wrong. This probe
settles it with a methodology the round-2 ad-hoc probe lacked:

  - K dependent GEMMs chained inside ONE jitted fori_loop (K large enough
    that the ~27 ms fetch RTT is <15% of the measured interval), so
    per-dispatch overhead cannot masquerade as low FLOPS;
  - a measured empty-chain control subtracted from every interval;
  - 5 timed repeats, median + rel spread reported per point;
  - the flagship forward itself timed the same way, with its FLOP count
    taken from XLA's own cost analysis rather than hand math.

Usage:  python scripts/probe_peak.py [--quick]
Prints one JSON line per measurement (harvestable by onchip_reverify-style
tooling) and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

REPEATS = 5


def _median_time(fn, *args):
    """Median wall seconds over REPEATS calls of fn(*args) with a scalar
    host fetch as the only synchronization point. Returns (median, spread)."""
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med if med > 0 else float("inf")
    return med, spread


def gemm_chain_tflops(m: int, n: int, k: int, dtype, precision) -> dict:
    """K dependent [m,n]x[n,n] GEMMs in one program; returns measured TFLOPS.

    m == n replicates the round-2 square probe; m >> n reaches the
    saturated regime the round-2 MFU audit found at 16384x8192x8192."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    # w scaled so the chained product stays O(1) in magnitude (no extra
    # normalization pass that would pollute the GEMM timing)
    w_h = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    x_h = rng.standard_normal((m, n)).astype(np.float32)
    w = jax.device_put(jnp.asarray(w_h, dtype=dtype))
    x = jax.device_put(jnp.asarray(x_h, dtype=dtype))

    def chain(x, w, steps):
        def body(_, acc):
            return lax.dot(acc, w, precision=precision)
        return lax.fori_loop(0, steps, body, x).sum()

    timed = jax.jit(chain, static_argnums=(2,))
    empty = jax.jit(chain, static_argnums=(2,))
    np.asarray(timed(x, w, k))   # compile + warm
    np.asarray(empty(x, w, 0))   # compile + warm the control
    t_full, s_full = _median_time(timed, x, w, k)
    t_zero, s_zero = _median_time(empty, x, w, 0)
    dt = max(t_full - t_zero, 1e-9)
    tflops = k * 2.0 * m * n * n / dt / 1e12
    return {
        "probe": "gemm_chain", "m": m, "n": n, "k": k,
        "dtype": str(np.dtype(dtype).name),
        "precision": str(precision), "tflops": round(tflops, 2),
        "t_full_s": round(t_full, 4), "t_zero_s": round(t_zero, 4),
        "spread_full": round(s_full, 3), "spread_zero": round(s_zero, 3),
    }


def hbm_stream_gbps(mb: int, k: int) -> dict:
    """K dependent elementwise passes over an mb-MB f32 buffer; each pass
    reads + writes the buffer once => 2 * mb * k MB of HBM traffic."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = mb * 1024 * 1024 // 4
    x = jax.device_put(jnp.ones((n,), jnp.float32))

    def chain(x, steps):
        def body(_, acc):
            return acc * 1.0000001 + 1e-9
        return lax.fori_loop(0, steps, body, x).sum()

    timed = jax.jit(chain, static_argnums=(1,))
    np.asarray(timed(x, k))
    np.asarray(timed(x, 0))
    t_full, s_full = _median_time(timed, x, k)
    t_zero, _ = _median_time(timed, x, 0)
    dt = max(t_full - t_zero, 1e-9)
    gbps = 2.0 * mb * k / 1024 / dt
    return {"probe": "hbm_stream", "mb": mb, "k": k, "gbps": round(gbps, 1),
            "t_full_s": round(t_full, 4), "spread_full": round(s_full, 3)}


def flagship_forward() -> dict:
    """Time the bench.py flagship forward and report effective TFLOPS using
    XLA's own cost analysis for the FLOP count."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import get_config
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches

    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    batch, seconds = 128, 10
    wav = jax.device_put(jnp.asarray(
        (rng.standard_normal((batch, seconds * cfg.frontend.sample_rate)) * 0.1)
        .astype(np.float32)))
    patches = waveform_to_patches(wav[:2], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)

    def forward(variables, wav):
        return model.apply(variables, waveform_to_patches(wav, cfg.frontend))

    lowered = jax.jit(forward).lower(variables, wav)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan"))) if ca else float("nan")

    n_iters = 20
    fwd = jax.jit(forward)
    combine = jax.jit(lambda xs: jnp.sum(jnp.stack([jnp.sum(x) for x in xs])))

    def run():
        return combine([fwd(variables, wav) for _ in range(n_iters)])

    np.asarray(run())
    t, s = _median_time(run)
    per_fwd = t / n_iters
    return {
        "probe": "flagship_forward", "batch": batch, "clip_s": seconds,
        "xla_flops_per_fwd": flops, "ms_per_fwd": round(per_fwd * 1e3, 2),
        "clips_per_s": round(batch * n_iters / t, 1),
        "effective_tflops": round(flops / per_fwd / 1e12, 2)
        if flops == flops else None,
        "spread": round(s, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer points")
    args = ap.parse_args()

    import jax
    from jax import lax

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    results = []
    # (m, n, chain_k, dtype, precision): the two square points replicate the
    # round-2 methodology; the two 16384x8192 points measure the saturated
    # regime (bf16 expected ~122 TFLOPS per the round-2 MFU audit; HIGHEST at
    # saturation was never measured and sizes the front-end's true headroom).
    points = [
        (4096, 4096, 64, "bfloat16", lax.Precision.DEFAULT),
        (4096, 4096, 64, "float32", lax.Precision.HIGHEST),
        (16384, 8192, 16, "bfloat16", lax.Precision.DEFAULT),
        (16384, 8192, 8, "float32", lax.Precision.HIGHEST),
    ]
    if args.quick:
        points = points[:1] + points[2:3]
    import jax.numpy as jnp
    dt_map = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
    for m, n, k, dt, prec in points:
        r = gemm_chain_tflops(m, n, k, dt_map[dt], prec)
        results.append(r)
        print(json.dumps(r), flush=True)

    r = hbm_stream_gbps(512, 32 if not args.quick else 8)
    results.append(r)
    print(json.dumps(r), flush=True)

    r = flagship_forward()
    results.append(r)
    print(json.dumps(r), flush=True)

    best_bf16 = max((x["tflops"] for x in results if x.get("dtype") == "bfloat16"),
                    default=None)
    print(json.dumps({"summary": "peak_reprobe", "best_bf16_tflops": best_bf16,
                      "hbm_gbps": next((x["gbps"] for x in results
                                        if x["probe"] == "hbm_stream"), None)}),
          flush=True)


if __name__ == "__main__":
    main()
