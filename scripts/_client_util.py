"""Shared plumbing for scripts that drive the C++ load generator
(native/bench_client): one mtime-checked build rule so every harness in
a session measures the SAME client binary (round-5 review finding: the
soak's exists-only check could silently run a stale binary after a
bench_serving rebuild)."""

import os
import subprocess

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def ensure_bench_client() -> str:
    """Build native/bench_client if missing OR older than its source;
    returns the executable path."""
    exe = os.path.join(NATIVE_DIR, "bench_client")
    src = exe + ".cpp"
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-march=native", "-pthread",
             src, "-o", exe], check=True, capture_output=True, timeout=120)
    return exe
