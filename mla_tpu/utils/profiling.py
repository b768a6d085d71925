"""Tracing / profiling harness (SURVEY.md §5 "Tracing/profiling" row — the
reference has none; the build mechanism is jax.profiler traces + an
axon-aware timing harness).

CRITICAL environment fact (see .claude/skills/verify/SKILL.md): on the axon
TPU platform ``jax.block_until_ready`` returns before the device finishes —
every timing here synchronizes by fetching outputs to host.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mla_tpu_trace"):
    """jax.profiler trace context -> TensorBoard/Perfetto-compatible dump."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree: Any) -> Any:
    """Reliable device synchronization: host-fetch every leaf (axon's
    block_until_ready is a no-op — fetching is the only real barrier)."""
    return jax.tree.map(np.asarray, tree)


def time_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    combine_outputs: bool = True,
) -> Dict[str, float]:
    """Wall-time a jitted device function.

    Dispatches ``iters`` calls then synchronizes ONCE through a combined
    device-side reduction (per-call host fetches hit a ~27 ms tunnel RTT
    floor on axon and would swamp sub-RTT kernels).
    """
    import jax.numpy as jnp

    for _ in range(warmup):
        sync(fn(*args))
    if combine_outputs:
        reduce_all = jax.jit(
            lambda xs: jnp.sum(jnp.stack([jnp.sum(jax.tree.leaves(x)[0]) for x in xs]))
        )
        # warm with the SAME list length — the reducer specializes on it, and
        # a shorter warmup would leave its compile inside the timed region
        sync(reduce_all([fn(*args) for _ in range(iters)]))
        t0 = time.perf_counter()
        sync(reduce_all([fn(*args) for _ in range(iters)]))
        total = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            sync(o)
        total = time.perf_counter() - t0
    return {
        "mean_ms": total / iters * 1e3,
        "total_s": total,
        "iters_per_sec": iters / total,
    }


@dataclass
class StepTimer:
    """Rolling train-loop throughput meter (clips/sec/chip, step latency)."""

    window: int = 50
    _times: List[float] = field(default_factory=list)
    _items: List[int] = field(default_factory=list)
    _last: Optional[float] = None

    def start(self):
        self._last = time.perf_counter()

    def step(self, n_items: int):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._items.append(n_items)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._items.pop(0)
        self._last = now

    @property
    def items_per_sec(self) -> float:
        t = sum(self._times)
        return sum(self._items) / t if t > 0 else 0.0

    @property
    def mean_step_ms(self) -> float:
        return 1e3 * sum(self._times) / len(self._times) if self._times else 0.0


def memory_stats() -> Dict[str, int]:
    """Device memory stats where the backend exposes them (best-effort)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
