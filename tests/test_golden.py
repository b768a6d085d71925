"""Golden regression tests (SURVEY.md §4 "parity/golden"): frozen oracle
inputs/outputs checked into tests/golden/ are the reference contract (the
mount is empty — SURVEY.md §0); any numerics drift fails here."""

import os

from mla_tpu import parity


def test_goldens_exist_and_are_committed():
    fe, mo = parity.ensure_goldens()
    assert os.path.exists(fe) and os.path.exists(mo)


def test_frontend_matmul_golden():
    r = parity.check_frontend("matmul")
    assert r["pass"], r


def test_frontend_fft_golden():
    r = parity.check_frontend("fft")
    assert r["pass"], r


def test_frontend_pallas_golden():
    r = parity.check_frontend_pallas()  # interpret mode on the CPU harness
    assert r["pass"], r


def test_model_golden():
    r = parity.check_model()
    assert r["pass"], r


def test_metrics_golden():
    r = parity.check_metrics()
    assert r["pass"], r
