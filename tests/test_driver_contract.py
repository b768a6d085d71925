"""Driver-contract checks that run cheaply on the CPU harness:
entry() must be jittable (validated via eval_shape — no compile),
bench.py must import cleanly from any cwd, and dryrun_multichip must
self-provision its device mesh when called the way the driver calls it."""

import importlib.util
import os
import subprocess
import sys

import jax
import numpy as np


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_is_traceable():
    m = _load("/root/repo/__graft_entry__.py", "ge_contract")
    fn, args = m.entry()
    out = jax.eval_shape(fn, *args)  # traces the full program, no compile
    assert out.shape == (4, 527)


def test_bench_imports_from_any_cwd():
    code = (
        "import importlib.util;"
        "spec = importlib.util.spec_from_file_location('b', '/root/repo/bench.py');"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m);"
        "print('ok', callable(m.main))"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       cwd="/tmp", timeout=120)
    assert "ok True" in r.stdout, r.stderr[-500:]


def test_dryrun_multichip_selfprovisions_like_the_driver():
    """The driver calls dryrun_multichip(8) in-process on a host that sees
    ONE device and sets no XLA flags (round-1 failure MULTICHIP_r01:
    ok=false). Reproduce that environment in a subprocess: no
    --xla_force_host_platform_device_count, and the function must build
    its own 8-device mesh."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device until the function provisions
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stderr[-800:]
    assert "dryrun_multichip ok" in r.stdout, r.stdout[-300:]
