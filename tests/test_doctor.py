"""`doctor` verb: environment self-check (utils/doctor.py).

The checks themselves run on the conftest CPU platform; the verdict
logic is unit-tested against synthetic reports covering the failure
modes the tool exists to detect (hung tunnel, slow fetch RTT,
non-exclusive chip, no-op block_until_ready, bf16 default matmuls).
"""

import json

from mla_tpu.utils import doctor


def test_run_quick_on_cpu_is_ok():
    report = doctor.run(quick=True)
    assert report["devices"], "conftest CPU platform must enumerate"
    assert report["platform"] == "cpu"
    assert report["verdict"]["status"] == "ok"
    # every quick check present and populated
    for key in ("versions", "fetch_rtt", "block_until_ready", "compile",
                "matmul_precision"):
        assert key in report and report[key], key
    assert "gemm" not in report  # quick skips the spot check
    assert report["versions"]["jax"] not in ("missing", "?")
    # CPU backend: block_until_ready is honest, f32 matmul is exact
    assert report["block_until_ready"]["noop"] is False
    assert report["matmul_precision"]["default_is_reduced_precision"] is False
    # the whole report must be JSON-serializable (the CLI prints it)
    json.dumps(report)


def test_gemm_check_spread_and_tflops():
    g = doctor.check_gemm_throughput(n=128, iters=2, repeats=3)
    assert g["tflops"] > 0
    assert g["rel_spread"] >= 0
    assert g["n"] == 128


def test_verdict_no_device():
    v = doctor.verdict({"devices": []})
    assert v["status"] == "no-device"
    assert v["reasons"]


def test_verdict_degraded_on_rtt_and_spread():
    base = {"devices": ["d0"], "fetch_rtt": {"median_ms": 1.0},
            "gemm": {"rel_spread": 0.01}}
    assert doctor.verdict(base)["status"] == "ok"
    slow = dict(base, fetch_rtt={"median_ms": doctor.RTT_DEGRADED_MS + 1})
    assert doctor.verdict(slow)["status"] == "degraded"
    shared = dict(base, gemm={"rel_spread": doctor.SPREAD_DEGRADED + 0.01})
    v = doctor.verdict(shared)
    assert v["status"] == "degraded"
    assert any("exclusive" in r for r in v["reasons"])


def test_verdict_platform_facts_warn_but_do_not_degrade():
    # no-op block + bf16 defaults are facts of the axon/TPU platform, not
    # sickness: they must surface as reasons while the status stays ok
    report = {
        "devices": ["d0"],
        "fetch_rtt": {"median_ms": 30.0},
        "gemm": {"rel_spread": 0.05},
        "block_until_ready": {"noop": True},
        "matmul_precision": {"default_is_reduced_precision": True},
    }
    v = doctor.verdict(report)
    assert v["status"] == "ok"
    assert len(v["reasons"]) == 2


def test_cli_doctor_exit_code_and_json(capsys):
    from mla_tpu.__main__ import main

    rc = main(["doctor", "--quick"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert report["verdict"]["status"] == "ok"


def test_probe_devices_times_out_on_hang(monkeypatch):
    # a backend that never answers must yield None after the timeout, not
    # hang the caller (the real failure mode: jax.devices() blocks forever
    # when the TPU tunnel is down)
    import threading

    never = threading.Event()

    class FakeJax:
        @staticmethod
        def devices():
            never.wait()  # daemon thread parks here forever

    import sys

    monkeypatch.setitem(sys.modules, "jax", FakeJax)
    try:
        assert doctor.probe_devices(timeout_s=0.2) is None
    finally:
        never.set()
