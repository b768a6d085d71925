"""Driver-contract checks that run cheaply on the CPU harness:
entry() must be jittable (validated via eval_shape — no compile) and
bench.py must import cleanly from any cwd."""

import importlib.util
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
