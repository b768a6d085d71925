"""Logging (reference C16: ``create_logging`` — file + stdout) plus a
structured scalar writer (CSV) for loss/lr/throughput curves (SURVEY.md §5
"metrics/logging/observability")."""

from __future__ import annotations

import csv
import logging as _logging
import os
import sys
from typing import Dict, Optional


def create_logging(log_dir: str, name: str = "train", filemode: str = "w") -> _logging.Logger:
    """File + stdout logger, one numbered file per run (reference semantics:
    logs/<name>/0000.log, incrementing)."""
    os.makedirs(log_dir, exist_ok=True)
    i = 0
    while os.path.isfile(os.path.join(log_dir, f"{i:04d}.log")):
        i += 1
    path = os.path.join(log_dir, f"{i:04d}.log")
    logger = _logging.getLogger(f"mla_tpu.{name}.{i}")
    logger.setLevel(_logging.DEBUG)
    logger.handlers.clear()
    fmt = _logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = _logging.FileHandler(path, mode=filemode)
    fh.setFormatter(fmt)
    sh = _logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger


class ScalarWriter:
    """Append-only CSV scalar log: step, key, value. Cheap, greppable,
    plottable; no TensorBoard dependency required on the pod.

    ``tensorboard_dir`` adds an OPTIONAL TensorBoard event-file sink
    (tf.summary; degrades to CSV-only with a warning if tensorflow is not
    importable) — pair with the ``profile`` CLI verb's jax.profiler traces
    for the full TensorBoard view (SURVEY.md §5 observability row)."""

    def __init__(self, path: str, tensorboard_dir: Optional[str] = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._new = not os.path.exists(path)
        self._f = open(path, "a", newline="")
        self._w = csv.writer(self._f)
        if self._new:
            self._w.writerow(["step", "key", "value"])
        self._tb = self._tf = None
        if tensorboard_dir:
            try:
                import tensorflow as tf  # baked into this image; optional

                self._tf = tf
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception as e:  # pragma: no cover - env-dependent
                _logging.getLogger("mla_tpu").warning(
                    "tensorboard sink unavailable (%s); CSV only", e
                )

    def write(self, step: int, scalars: Dict[str, float]):
        for k, v in scalars.items():
            self._w.writerow([step, k, float(v)])
        self._f.flush()
        if self._tb is not None:
            with self._tb.as_default():
                for k, v in scalars.items():
                    self._tf.summary.scalar(k, float(v), step=step)
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
