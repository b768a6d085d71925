"""Round-5 probe: does relaxing the INFERENCE front-end to default matmul
precision (what the training step already does in-step via
train.frontend_precision='default') buy measurable end-to-end throughput,
and what does it cost in score fidelity?

Measures, on the real chip, the bench.py flagship forward at:
  - frontend precision HIGHEST (current inference default)
  - frontend precision DEFAULT (the candidate)
  - batch 128 and 256 for each
and reports clips/s plus the max |prob delta| and top-1 agreement between
the two precisions on the same inputs.

One JSON line per point. Timing discipline per CLAUDE.md: device-side
combine, single scalar-ish fetch, median of 5.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 20
REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    from mla_tpu.config import get_config
    from mla_tpu.models.zoo import build_model
    from mla_tpu.ops.frontend import waveform_to_patches

    cfg = get_config("audioset_full_dp")
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)

    fe_hi = cfg.frontend
    fe_def = dataclasses.replace(cfg.frontend, precision="default")

    # batch 256 was dropped from the default sweep: round 2 measured batch
    # insensitivity (128 already saturates) and each extra (batch, precision)
    # point costs a 1-3 min remote compile on this tunnel.
    batches = (128, 256) if "--wide" in sys.argv else (128,)
    results = {}
    for batch in batches:
        wav = jax.device_put(jnp.asarray(
            (rng.standard_normal((batch, 10 * cfg.frontend.sample_rate)) * 0.1)
            .astype(np.float32)))
        patches = waveform_to_patches(wav[:2], fe_hi)
        variables = model.init(jax.random.key(0), patches)

        for tag, fe in (("highest", fe_hi), ("default", fe_def)):
            fwd = jax.jit(lambda v, w, fe=fe: model.apply(v, waveform_to_patches(w, fe)))
            combine = jax.jit(lambda xs: jnp.sum(jnp.stack([jnp.sum(x) for x in xs])))

            def run():
                return combine([fwd(variables, wav) for _ in range(N_ITERS)])

            np.asarray(fwd(variables, wav))
            np.asarray(run())
            times = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                np.asarray(run())
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            spread = (max(times) - min(times)) / med
            cps = batch * N_ITERS / med
            results[(batch, tag)] = (fwd, cps)
            print(json.dumps({"probe": "infer_precision", "batch": batch,
                              "frontend_precision": tag,
                              "clips_per_s": round(cps, 1),
                              "rel_spread": round(spread, 4)}), flush=True)

        # fidelity: same inputs, both precisions, one fetch each
        p_hi = np.asarray(results[(batch, "highest")][0](variables, wav))
        p_def = np.asarray(results[(batch, "default")][0](variables, wav))
        delta = np.abs(p_hi - p_def)
        top1_match = float((p_hi.argmax(1) == p_def.argmax(1)).mean())
        # top-5 set overlap per clip
        t5h = np.argsort(-p_hi, 1)[:, :5]
        t5d = np.argsort(-p_def, 1)[:, :5]
        ov = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(t5h, t5d)])
        print(json.dumps({"probe": "precision_fidelity", "batch": batch,
                          "max_abs_prob_delta": float(delta.max()),
                          "mean_abs_prob_delta": float(delta.mean()),
                          "top1_agreement": top1_match,
                          "top5_overlap": round(float(ov), 4)}), flush=True)

        ratio = results[(batch, "default")][1] / results[(batch, "highest")][1]
        print(json.dumps({"probe": "speedup", "batch": batch,
                          "default_vs_highest": round(ratio, 4)}), flush=True)


if __name__ == "__main__":
    main()
