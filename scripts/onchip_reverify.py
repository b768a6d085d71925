"""Round-5 on-chip re-verification orchestrator (VERDICT r4 items 2-8).

Runs the pending on-chip checklist unattended in one window, most-
critical first, sequentially (benchmarks need the chip exclusive —
never parallel on this 1-core host), logs each step to
``workspace/onchip_r5/<step>.log``, drops a ``.ok`` sentinel on success
so a re-run resumes where it died, re-gates on tunnel liveness between
steps (a probe subprocess with a timeout — jax.devices() hangs forever
when the tunnel is dead), and writes ``summary.json`` at the end of
every run. ``--strict`` exits nonzero if any step is red (VERDICT r4
item 7: never snapshot a failing record).

    python -u scripts/onchip_reverify.py
        [--steps parity,bench,...] [--cv] [--force step1,step2] [--strict]

Checklist (VERDICT round-4 items 2-8):

  doctor         python -m mla_tpu doctor   (chip health: RTT, exclusive-
                 chip spread, precision audit — context for every number)
  parity         python -m mla_tpu parity
  bench          python bench.py            (the BENCH_r05 numbers)
  serving8       direct + PACKED + native-HTTP w/ C++ client, 8 adpcm4
                 streams, SYNC feeds (VERDICT r4 item 2's ratio)
  serving8_async same with --async-feeds (the decomposition's other arm)
  ladder8        wire ladder at 8 streams: adpcm2 + uint8 control,
                 direct AND http, same session (VERDICT r4 item 5)
  ladder32       wire ladder at 32 streams over HTTP (adpcm4/adpcm2/uint8)
  reload         hot-reload latency under live feeds (item 3: now
                 pre-staged outside the lock — expect <10 ms live median)
  tick_phases    packed tick-loop phase decomposition
  mosaic         the once-per-round Mosaic row-merge reshape re-probe
                 (item 8: round 4's probe died as an HTTP 500, not a
                 clean reject — confirm which)
  soak           10-min production-ops soak: live HTTP load + hot-reload
                 every 30 s + healthz reads, all concurrently
  cv             (--cv only: ~1 h) milestone-scale 5-fold protocol on the
                 ESC-50-shaped corpus (generated on demand; item 4)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "workspace", "onchip_r5")
PY = sys.executable
# scripts/*.py children don't get the repo on sys.path from cwd alone
# (only -m and repo-root scripts do) — inject it, APPENDED after the
# preset PYTHONPATH (/root/.axon_site loads the TPU plugin; appending
# keeps the plugin's sitecustomize first and can never shadow it —
# round-4 ADVICE). No trailing/leading empty entries (an empty PYTHONPATH
# element means "add cwd to sys.path").
_pp = os.environ.get("PYTHONPATH", "")
ENV = dict(os.environ,
           PYTHONPATH=(_pp + os.pathsep + REPO) if _pp else REPO)

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
    ("serving8_async", [PY, "-u", "scripts/bench_serving.py", "adpcm4", "8",
                        "--http-only", "--native", "--cpp-client",
                        "--async-feeds"], 2400),
    ("ladder8", [PY, "-u", "scripts/bench_serving.py", "adpcm2,uint8", "8",
                 "--http", "--native", "--cpp-client"], 2400),
    ("ladder32", [PY, "-u", "scripts/bench_serving.py",
                  "adpcm4,adpcm2,uint8", "32",
                  "--http-only", "--native", "--cpp-client"], 3600),
    ("reload", [PY, "-u", "scripts/probe_reload.py"], 1800),
    ("tick_phases", [PY, "-u", "scripts/probe_tick_phases.py", "sync01"],
     1800),
    ("mosaic", [PY, "-u", "scripts/probe_mosaic_reshape.py"], 1200),
    ("soak", [PY, "-u", "scripts/probe_serving_soak.py", "10"], 1500),
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
    # keep ALL harvested lines (the round-4 [-8:] cap silently dropped
    # parity check #1 — VERDICT r4 item 1b)
    summary[name] = {"status": "ok" if rc == 0 else
                     ("timeout" if rc == -1 else f"rc={rc}"),
                     "seconds": round(dt, 1), "json": jlines}
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
    ap.add_argument("--strict", action="store_true",
                    help="exit nonzero if ANY step is red (VERDICT r4 "
                         "item 7: never snapshot a failing record)")
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
    red = [k for k, v in summary.items()
           if isinstance(v, dict)
           and v.get("status") not in ("ok", "done-previous")]
    summary["all_green"] = not red and summary.get("tunnel") == "up"
    with open(os.path.join(OUT, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    if args.strict and not summary["all_green"]:
        print(f"--strict: red steps {red or ['<tunnel down>']}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
