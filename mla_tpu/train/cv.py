"""k-fold cross-validation runner (reference C1's actual ESC-50 /
UrbanSound8K evaluation protocol — SURVEY.md §2.1 C1 row: train on folds
{1..k}\\{i}, evaluate on fold i, report mean±std over i. Round-2 VERDICT
missing item 5: packing existed (`prep --folds`), the rotation did not).

One call packs every rotation once (corpus decoded a single time), trains
fit() per held-out fold, and aggregates the final eval metrics into one
JSON-able summary + a CSV."""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mla_tpu.config import Config
from mla_tpu.data.folder import pack_cv_folds
from mla_tpu.train.loop import fit


def cross_validate(
    cfg: Config,
    wav_dir: str,
    labels_csv: str,
    workspace: str,
    folds: Optional[Sequence[int]] = None,
    log: bool = True,
) -> Dict:
    """Run the fold rotation end-to-end; returns
    {"folds": {i: final_eval_stats}, "mean": {...}, "std": {...},
    "classes": [...]} and writes ``workspace/cv_results.csv``.

    ``cfg`` is the per-fold training config; its data section is replaced
    with each rotation's packed HDF5 pair. ``cfg.model.n_classes`` must
    match the corpus's class count (checked after packing)."""
    os.makedirs(workspace, exist_ok=True)
    packs, classes = pack_cv_folds(
        wav_dir,
        os.path.join(workspace, "packs"),
        clip_seconds=cfg.data.clip_seconds,
        sample_rate=cfg.frontend.sample_rate,
        labels_csv=labels_csv,
        folds=folds,
    )
    if cfg.model.n_classes != len(classes):
        raise ValueError(
            f"config has n_classes={cfg.model.n_classes} but the corpus has "
            f"{len(classes)} classes; --set model.n_classes={len(classes)}"
        )
    per_fold: Dict[int, Dict[str, float]] = {}
    for f, (train_h5, eval_h5) in sorted(packs.items()):
        cfg_f = dataclasses.replace(
            cfg,
            name=f"{cfg.name}_fold{f}",
            data=dataclasses.replace(
                cfg.data, dataset="hdf5", hdf5_path=train_h5, eval_hdf5_path=eval_h5
            ),
        )
        res = fit(cfg_f, workspace=os.path.join(workspace, f"fold{f}"), log=log)
        if not res.eval_stats:
            raise RuntimeError(f"fold {f} produced no eval stats "
                               "(num_steps < eval_every?)")
        final = {k: v for k, v in res.eval_stats[-1].items() if k != "step"}
        final["final_loss"] = res.history[-1]["loss"] if res.history else float("nan")
        per_fold[f] = final

    keys = sorted({k for s in per_fold.values() for k in s})
    mean = {k: float(np.mean([s[k] for s in per_fold.values()])) for k in keys}
    std = {k: float(np.std([s[k] for s in per_fold.values()])) for k in keys}

    csv_path = os.path.join(workspace, "cv_results.csv")
    with open(csv_path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["fold"] + keys)
        for f in sorted(per_fold):
            w.writerow([f] + [per_fold[f][k] for k in keys])
        w.writerow(["mean"] + [mean[k] for k in keys])
        w.writerow(["std"] + [std[k] for k in keys])

    return {
        "folds": {int(f): per_fold[f] for f in sorted(per_fold)},
        "mean": mean,
        "std": std,
        "classes": classes,
        "csv": csv_path,
    }
