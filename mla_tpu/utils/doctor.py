"""Environment self-check (``python -m mla_tpu doctor``).

The reference has no analogue (single host, no service); this is ops
tooling for the deployment story (SURVEY.md §5 observability row): one
command that answers "is this host fit to train/serve right now?" before
a long run is launched. It encodes every environment failure mode this
project has actually hit (CLAUDE.md / docs/RESULTS.md):

- the TPU tunnel can be DOWN, in which case ``jax.devices()`` blocks
  forever — the probe runs in a daemon thread with a timeout;
- ``jax.block_until_ready`` can be a NO-OP (axon platform), in which
  case only host fetches synchronize and naive timing lies;
- every host fetch can cost a ~27 ms tunnel round-trip;
- the default matmul precision on TPU is bf16 even for f32 operands
  (~1e-2 error) — parity paths must pin HIGHEST;
- a non-exclusive chip (another tenant's job) silently pollutes
  benchmarks — detectable as spread across timed repeats.

Each check returns data, not a judgment; ``verdict()`` folds them into
``ok`` / ``degraded`` / ``no-device`` with human-readable reasons.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np

# thresholds for verdict(); module-level so tests can reference them
RTT_DEGRADED_MS = 200.0     # host fetch slower than this: tunnel is sick
SPREAD_DEGRADED = 0.25      # (max-min)/median across GEMM repeats
DEVICE_PROBE_TIMEOUT_S = 120.0


def probe_devices(timeout_s: float = DEVICE_PROBE_TIMEOUT_S) -> Optional[list]:
    """``jax.devices()`` guarded against the hung-tunnel failure mode.

    Returns the device list, or None if the backend did not answer within
    ``timeout_s`` (the probe thread is daemonic — a wedged C call cannot
    pin the process; same pattern as bench.py's _require_device)."""
    import threading

    out: Dict[str, Any] = {}

    def probe():
        import jax

        out["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return out.get("devices")


def check_versions() -> Dict[str, str]:
    vers = {}
    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                "numpy", "grain"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            vers[mod] = getattr(m, "__version__", "?")
        except Exception:  # noqa: BLE001 - absent optional dep is data
            vers[mod] = "missing"
    return vers


def check_fetch_rtt(iters: int = 9) -> Dict[str, float]:
    """Median wall time of one scalar host fetch — the tunnel round-trip
    on axon (~27 ms historically), ~0 on local cpu/tpu backends."""
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda: jnp.float32(1.0) + 1.0)()
    np.asarray(x)  # compile + first-fetch costs outside the timing
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(x)
        times.append(time.perf_counter() - t0)
    return {"median_ms": float(np.median(times)) * 1e3,
            "max_ms": float(np.max(times)) * 1e3}


def check_block_until_ready_noop() -> Dict[str, Any]:
    """Detect the axon failure mode where ``block_until_ready`` returns
    before the device finishes: time a dependent matmul chain under
    block_until_ready vs under a host fetch. When block is honest, the two
    are comparable; a block that is >20x faster than the fetch (minus one
    RTT) means only fetches synchronize and timing code must fetch.

    The chain is sized per backend so an HONEST block still takes several
    ms on a fast accelerator — otherwise device time would vanish against
    a ~27 ms tunnel fetch RTT and an honest platform could read as a
    no-op (on a 1-core CPU the small chain already runs ~150 ms)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        n, chain = 1024, 8      # ~17 GFLOP
    else:
        n, chain = 2048, 16     # ~275 GFLOP: ~7 ms at this chip's 37 TFLOPS

    @jax.jit
    def work(a):
        for _ in range(chain):
            a = a @ a * (1.0 / n)
        return jnp.sum(a)

    a = jax.device_put(jnp.ones((n, n), jnp.float32) / n)
    np.asarray(work(a))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(work(a))
    block_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(work(a))
    fetch_s = time.perf_counter() - t0
    return {
        "block_ms": block_s * 1e3,
        "fetch_ms": fetch_s * 1e3,
        # heuristic; fetch includes one RTT, so only call it a no-op when
        # the gap is far beyond any plausible RTT share
        "noop": bool(fetch_s > 0.002 and block_s < fetch_s / 20),
    }


def check_compile_latency() -> Dict[str, float]:
    """First-call jit latency on a tiny unique-shaped program (the
    compile+transfer pipeline health; remote TPU compiles have been
    observed at 1-3 min for Pallas, ~seconds for plain XLA)."""
    import jax
    import jax.numpy as jnp

    # odd shape so no earlier check's cache entry can be reused
    x = jnp.ones((37, 53), jnp.float32)
    f = jax.jit(lambda a: jnp.tanh(a @ a.T).sum())
    t0 = time.perf_counter()
    np.asarray(f(x))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f(x))
    cached = time.perf_counter() - t0
    return {"first_call_ms": first * 1e3, "cached_call_ms": cached * 1e3}


def check_matmul_precision() -> Dict[str, Any]:
    """Effective f32 matmul precision at the DEFAULT setting vs HIGHEST.

    TPU defaults route f32 matmuls through bf16 passes (~1e-2 relative
    error); parity-critical code must pin HIGHEST (the repo's tests do
    globally). Reports the observed relative error so a run on new
    hardware shows its true default."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)

    @jax.jit
    def both(a, b):
        d = jax.lax.dot(a, b, precision=jax.lax.Precision.DEFAULT)
        h = jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST)
        return jnp.max(jnp.abs(d - h)) / jnp.max(jnp.abs(h))

    rel = float(np.asarray(both(a, b)))
    return {"default_vs_highest_rel_err": rel,
            "default_is_reduced_precision": bool(rel > 1e-5)}


def check_gemm_throughput(n: Optional[int] = None, iters: Optional[int] = None,
                          repeats: int = 3) -> Dict[str, float]:
    """f32-DEFAULT GEMM throughput spot check + repeat spread (the
    exclusive-chip detector: spread > ~25% across repeats means another
    job is timesharing the device). Synchronizes through ONE scalar fetch
    per repeat (axon rules), and SUBTRACTS the measured per-fetch RTT
    from every repeat before computing tflops/spread — otherwise the
    ~27 ms tunnel fetch dominates a short device window and the "spread"
    measures tunnel jitter, not chip contention (round-5 review finding:
    the old 6-iter window was ~2.7 ms of compute inside a ~24 ms fetch).
    ``n``/``iters`` default per backend: 2048 x 60 iters (~27 ms compute
    at this chip's measured 37.7 TFLOPS) on an accelerator, 512 x 6 on
    cpu (a long 2048^3 chain takes minutes on a 1-core host). The chain
    runs under lax.fori_loop so compile time stays O(1) in iters."""
    import jax
    import jax.numpy as jnp

    if n is None:
        n = 512 if jax.default_backend() == "cpu" else 2048
    if iters is None:
        iters = 6 if jax.default_backend() == "cpu" else 60

    @jax.jit
    def work(a):
        a = jax.lax.fori_loop(0, iters, lambda _, x: x @ x * (1.0 / n), a)
        return jnp.sum(a)

    a = jax.device_put(jnp.full((n, n), 1.0 / n, jnp.float32))
    np.asarray(work(a))  # compile + warmup
    rtt = check_fetch_rtt(iters=5)["median_ms"] / 1e3
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(work(a))
        dt = time.perf_counter() - t0
        # floor at 10% of the raw window: a slow single fetch must not
        # drive the device estimate negative
        times.append(max(dt - rtt, dt * 0.1))
    med = float(np.median(times))
    flops = 2.0 * n * n * n * iters
    return {
        "n": n,
        "iters": iters,
        "tflops": flops / med / 1e12,
        "median_s": med,
        "fetch_rtt_s": rtt,
        "rel_spread": (max(times) - min(times)) / med,
    }


SERVING_SPREAD_BAR = 0.05  # docs/RESULTS.md rule: spread > ~5% => rerun


def exclusivity_context(**gemm_kwargs) -> Dict[str, float]:
    """One quick GEMM spread probe for stamping onto benchmark output
    (VERDICT r4 item 6: every serving number carries its exclusivity
    context). Returns {'gemm_tflops', 'gemm_spread', 'exclusive'} —
    ``exclusive`` uses the serving bar (5%), stricter than verdict()'s
    degraded threshold, because benchmark numbers are quoted to ~1%."""
    g = check_gemm_throughput(**gemm_kwargs)
    return {"gemm_tflops": round(g["tflops"], 2),
            "gemm_spread": round(g["rel_spread"], 3),
            "exclusive": g["rel_spread"] <= SERVING_SPREAD_BAR}


def verdict(report: Dict[str, Any]) -> Dict[str, Any]:
    """Fold check results into ok/degraded/no-device + reasons."""
    if not report.get("devices"):
        return {"status": "no-device",
                "reasons": ["device probe timed out or returned none — "
                            "tunnel down or backend misconfigured"]}
    reasons: List[str] = []
    rtt = report.get("fetch_rtt", {}).get("median_ms", 0.0)
    if rtt > RTT_DEGRADED_MS:
        reasons.append(f"host fetch RTT {rtt:.0f} ms (> {RTT_DEGRADED_MS:.0f})")
    spread = report.get("gemm", {}).get("rel_spread", 0.0)
    if spread > SPREAD_DEGRADED:
        reasons.append(
            f"GEMM repeat spread {spread:.0%} — device likely NOT exclusive")
    if report.get("block_until_ready", {}).get("noop"):
        reasons.append("block_until_ready is a NO-OP here: synchronize by "
                       "fetching (utils.profiling.sync)")
    if report.get("matmul_precision", {}).get("default_is_reduced_precision"):
        reasons.append("default f32 matmul is reduced precision: pin "
                       "Precision.HIGHEST on parity paths")
    # the last two are facts of the platform, not sickness: degrade only
    # on RTT/spread problems
    status = "degraded" if (rtt > RTT_DEGRADED_MS or
                            spread > SPREAD_DEGRADED) else "ok"
    return {"status": status, "reasons": reasons}


def run(device_timeout_s: float = DEVICE_PROBE_TIMEOUT_S,
        quick: bool = False) -> Dict[str, Any]:
    """Run every check; never raises on a sick environment (the report IS
    the product). ``quick``: skip the GEMM spot check (seconds -> ms)."""
    report: Dict[str, Any] = {"versions": check_versions()}
    devices = probe_devices(device_timeout_s)
    report["devices"] = [str(d) for d in devices] if devices else []
    if not devices:
        report["verdict"] = verdict(report)
        return report
    import jax

    report["platform"] = jax.default_backend()
    report["process"] = {"index": jax.process_index(),
                         "count": jax.process_count()}
    checks = [("fetch_rtt", check_fetch_rtt),
              ("block_until_ready", check_block_until_ready_noop),
              ("compile", check_compile_latency),
              ("matmul_precision", check_matmul_precision)]
    if not quick:
        checks.append(("gemm", check_gemm_throughput))
    for name, fn in checks:
        try:
            report[name] = fn()
        except Exception as e:  # noqa: BLE001 - a failing check is data
            report[name] = {"error": f"{type(e).__name__}: {e}"}
    report["verdict"] = verdict(report)
    return report
