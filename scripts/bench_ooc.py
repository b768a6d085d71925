"""Out-of-core training proof bench (round-2 VERDICT next item 1): train
the audioset_full_dp milestone from an on-disk HDF5 pack that training
never loads, and show
  (a) throughput within ~10% of the identical in-RAM streamed run, and
  (b) peak host RSS far below the pack size (we really stream).

Run EXCLUSIVELY on the real chip (a concurrent job pollutes timing):

    python scripts/bench_ooc.py [--gb 4] [--steps 30] [--staging int16]

Prints one JSON line. The pack is cached in --workdir across runs."""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # kB -> GB


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=4.0, help="pack size target")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--staging", default="int16",
                    choices=["float32", "int16", "uint8", "adpcm4"])
    ap.add_argument("--workdir", default="/root/ooc_bench")
    ap.add_argument("--skip_ram", action="store_true",
                    help="only measure the out-of-core run")
    args = ap.parse_args()

    from mla_tpu.config import get_config
    from mla_tpu.data.ooc import generate_synthetic_pack
    from mla_tpu.train.loop import fit

    clip_bytes = 160000 * 4
    n_clips = max(64, int(args.gb * 1e9 / clip_bytes))
    pack = os.path.join(args.workdir, f"pack_{n_clips}.h5")
    ev = os.path.join(args.workdir, "eval.h5")
    if not os.path.exists(pack):
        t0 = time.time()
        nbytes = generate_synthetic_pack(pack, n_clips, 527, clip_seconds=10.0,
                                         seed=0)
        print(f"# generated {nbytes/1e9:.2f} GB pack in {time.time()-t0:.0f}s",
              file=sys.stderr)
    if not os.path.exists(ev):
        from mla_tpu.data.hdf5 import pack_hdf5
        from mla_tpu.data.synthetic import synth_waveforms

        xe, ye = synth_waveforms(64, 527, 10.0, multi_label=True, seed=99)
        pack_hdf5(ev, xe, ye)
    pack_gb = os.path.getsize(pack) / 1e9

    base = get_config("audioset_full_dp")
    steps = args.warmup + args.steps
    cfg = dataclasses.replace(
        base,
        name="ooc_bench",
        data=dataclasses.replace(
            base.data, dataset="hdf5", hdf5_path=pack, eval_hdf5_path=ev,
            out_of_core=True, pipeline="grain", staging_dtype=args.staging,
            device_resident=False,
        ),
        train=dataclasses.replace(
            base.train, batch_size=args.batch, num_steps=steps,
            log_every=1, eval_every=steps + 1, checkpoint_every=0,
        ),
    )

    def run(c, ws):
        res = fit(c, workspace=os.path.join(args.workdir, ws), log=False)
        # per-step clips/s from the post-warmup log entries (log_every=1)
        cps = [h["clips_per_sec"] for h in res.history[args.warmup:]]
        return float(np.median(cps)), [round(v, 1) for v in cps]

    t0 = time.time()
    ooc_cps, ooc_all = run(cfg, "ooc")
    ooc_rss = peak_rss_gb()

    out = {
        "metric": "ooc_train_clips_per_sec",
        "value": round(ooc_cps, 1),
        "unit": "clips/s",
        "pack_gb": round(pack_gb, 2),
        "n_clips": n_clips,
        "staging": args.staging,
        "steps": args.steps,
        "peak_rss_gb": round(ooc_rss, 2),
        "rss_vs_pack": round(ooc_rss / pack_gb, 3),
        "wall_s": round(time.time() - t0, 1),
    }
    if not args.skip_ram:
        # identical config but loaded to RAM (streamed feeds either way:
        # device_resident stays off so ONLY the read path differs)
        ram_cfg = dataclasses.replace(
            cfg, name="ram_bench",
            data=dataclasses.replace(cfg.data, out_of_core=False),
        )
        ram_cps, ram_all = run(ram_cfg, "ram")
        out["ram_clips_per_sec"] = round(ram_cps, 1)
        out["ooc_vs_ram"] = round(ooc_cps / ram_cps, 3)
        out["ram_steps"] = ram_all
    out["ooc_steps"] = ooc_all
    print(json.dumps(out))


if __name__ == "__main__":
    main()
