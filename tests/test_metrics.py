"""Metric parity vs sklearn (the reference's metric backend, C13)."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from mla_tpu.utils import metrics


def _data(rng, n=200, c=15, informative=True):
    targets = (rng.random((n, c)) < 0.2).astype(np.float32)
    scores = rng.random((n, c)).astype(np.float64)
    if informative:
        scores = 0.6 * scores + 0.4 * targets  # correlate scores with labels
    return scores, targets


def test_average_precision_matches_sklearn(rng):
    scores, targets = _data(rng)
    ours = metrics.average_precision(scores, targets)
    for j in range(scores.shape[1]):
        if targets[:, j].sum() == 0:
            assert np.isnan(ours[j])
        else:
            ref = average_precision_score(targets[:, j], scores[:, j])
            np.testing.assert_allclose(ours[j], ref, rtol=1e-10)


def test_average_precision_with_ties(rng):
    scores, targets = _data(rng)
    scores = np.round(scores, 1)  # heavy ties
    ours = metrics.average_precision(scores, targets)
    for j in range(scores.shape[1]):
        if targets[:, j].sum() > 0:
            ref = average_precision_score(targets[:, j], scores[:, j])
            np.testing.assert_allclose(ours[j], ref, rtol=1e-10)


def test_roc_auc_matches_sklearn(rng):
    scores, targets = _data(rng)
    ours = metrics.roc_auc(scores, targets)
    for j in range(scores.shape[1]):
        ref = roc_auc_score(targets[:, j], scores[:, j])
        np.testing.assert_allclose(ours[j], ref, rtol=1e-10)


def test_roc_auc_with_ties(rng):
    scores, targets = _data(rng)
    scores = np.round(scores, 1)
    ours = metrics.roc_auc(scores, targets)
    for j in range(scores.shape[1]):
        ref = roc_auc_score(targets[:, j], scores[:, j])
        np.testing.assert_allclose(ours[j], ref, rtol=1e-10)


def test_d_prime_known_values():
    np.testing.assert_allclose(metrics.d_prime(0.5), 0.0, atol=1e-12)
    # paper's Table 1 pairing: AUC 0.970 -> d' 2.66 (BASELINE.md)
    np.testing.assert_allclose(metrics.d_prime(0.970), 2.6599, atol=5e-4)


def test_calculate_stats(rng):
    scores, targets = _data(rng)
    stats = metrics.calculate_stats(scores, targets)
    assert 0 <= stats["mAP"] <= 1 and 0.5 < stats["mAUC"] <= 1
    assert stats["d_prime"] > 0
    # perfect scores -> perfect metrics
    perfect = metrics.calculate_stats(targets + 0.0, targets)
    assert perfect["mAP"] == pytest.approx(1.0)
    assert perfect["mAUC"] == pytest.approx(1.0)


def test_degenerate_classes(rng):
    scores = rng.random((50, 3))
    targets = np.zeros((50, 3), np.float32)
    targets[:, 0] = (rng.random(50) < 0.3).astype(np.float32)  # only class 0 valid
    stats = metrics.calculate_stats(scores, targets)
    assert np.isfinite(stats["mAP"])
