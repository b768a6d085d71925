"""Round-4 on-chip re-verification orchestrator (VERDICT item 1).

The TPU tunnel has been down for days; when it returns — possibly
briefly — EVERY pending on-chip measurement must run unattended in one
window, most-critical first. This runner executes the checklist
sequentially (benchmarks need the chip exclusive — never parallel on
this 1-core host), logs each step to ``workspace/onchip_r4/<step>.log``,
drops a ``.ok`` sentinel on success so a re-run resumes where it died,
re-gates on tunnel liveness between steps (a probe subprocess with a
timeout — jax.devices() hangs forever when the tunnel is dead), and
writes ``workspace/onchip_r4/summary.json`` at the end of every run.

    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/onchip_reverify.py
        [--steps parity,bench,...] [--cv] [--force step1,step2]

Checklist (docs/RESULTS.md round-3/4 pending list + VERDICT round-4
items 1/3/5/8):

  doctor         python -m mla_tpu doctor   (chip health: RTT, exclusive-
                 chip spread, precision audit — context for every number)
  parity         python -m mla_tpu parity   (tick/train program
                 signatures changed: variables-as-args)
  bench          python bench.py            (the BENCH_r04 numbers)
  serving8       direct + PACKED one-upload + native-HTTP w/ C++ client,
                 8 adpcm4 streams (VERDICT item 3's measurement)
  serving32      native-HTTP + C++ client at 32 streams (streams_per_tick)
  timeline_cost  ring tick cost cap=64 vs 0 + one-fetch readout latency
  reload         hot-reload latency under live feeds
  tick_phases    packed tick-loop phase decomposition
  mosaic         the once-per-round Mosaic row-merge reshape re-probe
  cv             (--cv only: ~1 h) milestone-scale 5-fold protocol on the
                 ESC-50-shaped corpus (generated on demand)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "workspace", "onchip_r4")
PY = sys.executable
# scripts/*.py children don't get the repo on sys.path from cwd alone
# (only -m and repo-root scripts do) — inject it, APPENDING to the preset
# PYTHONPATH (/root/.axon_site loads the TPU plugin; never override).
ENV = dict(os.environ,
           PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

STEPS = [
    # (name, argv, timeout_s)
    # doctor first: records chip health (fetch RTT, exclusive-chip spread,
    # default-precision audit) so every later number has context; a
    # 'degraded' verdict (exit 1) logs as FAIL but does not stop the run
    ("doctor", [PY, "-u", "-m", "mla_tpu", "doctor"], 900),
    ("parity", [PY, "-u", "-m", "mla_tpu", "parity"], 2400),
    ("bench", [PY, "-u", "bench.py"], 2400),
    ("serving8", [PY, "-u", "scripts/bench_serving.py", "adpcm4", "8",
                  "--packed", "--http", "--native", "--cpp-client"], 2400),
    ("serving32", [PY, "-u", "scripts/bench_serving.py", "adpcm4", "32",
                   "--http-only", "--native", "--cpp-client"], 2400),
    ("timeline_cost", [PY, "-u", "scripts/probe_timeline_cost.py"], 1800),
    ("reload", [PY, "-u", "scripts/probe_reload.py"], 1800),
    ("tick_phases", [PY, "-u", "scripts/probe_tick_phases.py", "sync01"],
     1800),
    ("mosaic", [PY, "-u", "scripts/probe_mosaic_reshape.py"], 1200),
]

CV_CORPUS = os.path.join(REPO, "workspace", "cv_corpus_esc50")
CV_STEPS = [
    ("cv_corpus", [PY, "-u", "scripts/make_cv_corpus.py", CV_CORPUS], 1200),
    ("cv", [PY, "-u", "-m", "mla_tpu", "cv",
            "--config=esc50_single_attention",
            f"--wav_dir={CV_CORPUS}/audio",
            f"--labels_csv={CV_CORPUS}/meta.csv",
            f"--workspace={OUT}/cv_run"], 7200),
]


def tunnel_alive(timeout_s: float = 150.0) -> bool:
    """jax.devices() in a THROWAWAY subprocess — it hangs unkillably
    in-process when the tunnel is down."""
    try:
        r = subprocess.run(
            [PY, "-c", "import jax; print(jax.devices()[0])"],
            timeout=timeout_s, capture_output=True, cwd=REPO)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_step(name, argv, timeout_s, summary):
    ok_path = os.path.join(OUT, f"{name}.ok")
    log_path = os.path.join(OUT, f"{name}.log")
    if os.path.exists(ok_path):
        print(f"[skip] {name} (done in a previous run)", flush=True)
        summary[name] = {"status": "done-previous"}
        return True
    print(f"[run ] {name} (timeout {timeout_s}s) -> {log_path}", flush=True)
    t0 = time.time()
    with open(log_path, "ab") as log:
        log.write(f"\n===== {time.strftime('%F %T')} {argv}\n".encode())
        log.flush()
        try:
            r = subprocess.run(argv, stdout=log, stderr=subprocess.STDOUT,
                               timeout=timeout_s, cwd=REPO, env=ENV)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -1
    dt = time.time() - t0
    # surface any JSON lines the step printed (bench/probe outputs)
    jlines = []
    try:
        with open(log_path) as fh:
            for l in fh:
                if l.startswith("{") and l.rstrip().endswith("}"):
                    try:  # per-line: a dict-repr log line must not
                        jlines.append(json.loads(l))  # discard real JSON
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    summary[name] = {"status": "ok" if rc == 0 else
                     ("timeout" if rc == -1 else f"rc={rc}"),
                     "seconds": round(dt, 1), "json": jlines[-8:]}
    if rc == 0:
        open(ok_path, "w").close()
        print(f"[ ok ] {name} in {dt:.0f}s", flush=True)
        return True
    print(f"[FAIL] {name} ({summary[name]['status']}) in {dt:.0f}s — "
          f"see {log_path}", flush=True)
    return False


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", default=None,
                    help="comma list to restrict to (default: all)")
    ap.add_argument("--force", default="",
                    help="comma list whose .ok sentinels are cleared first")
    ap.add_argument("--cv", action="store_true",
                    help="also run the long milestone-scale cv protocol")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    steps = STEPS + (CV_STEPS if args.cv else [])
    if args.steps:
        keep = set(args.steps.split(","))
        steps = [s for s in steps if s[0] in keep]
    for name in filter(None, args.force.split(",")):
        p = os.path.join(OUT, f"{name}.ok")
        if os.path.exists(p):
            os.remove(p)

    summary = {"started": time.strftime("%F %T")}
    if not tunnel_alive():
        print("TPU tunnel DOWN — nothing to do", flush=True)
        summary["tunnel"] = "down"
    else:
        summary["tunnel"] = "up"
        for name, argv, timeout_s in steps:
            run_step(name, argv, timeout_s, summary)
            # a step failing is survivable; the tunnel dying is not —
            # re-gate so we don't burn hours timing out every later step
            if summary[name].get("status") not in ("ok", "done-previous") \
                    and not tunnel_alive():
                print("tunnel died mid-run — stopping", flush=True)
                summary["tunnel"] = "died-mid-run"
                break
    summary["finished"] = time.strftime("%F %T")
    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
