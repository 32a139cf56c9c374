"""Metrics parity: our numpy mAP/F1 vs sklearn (the reference's metric stack)."""

import numpy as np
import pytest

from aecf_tpu.train.metrics import (
    average_precision,
    calculate_metrics,
    macro_map,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_average_precision_matches_sklearn():
    rng = np.random.default_rng(0)
    for _ in range(20):
        y_true = (rng.random(50) < 0.3).astype(int)
        if y_true.sum() == 0:
            y_true[0] = 1
        y_score = rng.normal(size=50)
        ours = average_precision(y_true, y_score)
        theirs = sklearn_metrics.average_precision_score(y_true, y_score)
        np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_average_precision_with_ties():
    y_true = np.array([1, 0, 1, 0, 1])
    y_score = np.array([0.5, 0.5, 0.5, 0.2, 0.2])
    np.testing.assert_allclose(
        average_precision(y_true, y_score),
        sklearn_metrics.average_precision_score(y_true, y_score),
        atol=1e-10,
    )


def test_average_precision_no_positives():
    assert average_precision(np.zeros(10), np.random.rand(10)) == 0.0


def test_calculate_metrics_matches_reference_protocol():
    """Full protocol vs sklearn: macro mAP over valid classes, per-label F1
    at sigmoid>0.5, macro F1 over positive F1s only."""
    rng = np.random.default_rng(1)
    n, c = 200, 8
    y_true = (rng.random((n, c)) < 0.25).astype(np.float32)
    y_true[:, 5] = 0.0  # class with no positives
    logits = rng.normal(size=(n, c)).astype(np.float32) + 2.0 * y_true

    map_score, macro_f1, per_label = calculate_metrics(logits, y_true)

    prob = 1.0 / (1.0 + np.exp(-logits))
    valid = y_true.sum(0) > 0
    want_map = sklearn_metrics.average_precision_score(
        y_true[:, valid], prob[:, valid], average="macro"
    )
    np.testing.assert_allclose(map_score, want_map, atol=1e-10)

    y_bin = (prob > 0.5).astype(int)
    want_f1 = np.array(
        [
            sklearn_metrics.f1_score(
                y_true[:, i], y_bin[:, i], zero_division=0
            )
            if y_true[:, i].sum() > 0
            else 0.0
            for i in range(c)
        ]
    )
    np.testing.assert_allclose(per_label, want_f1, atol=1e-10)
    # Reference macro-F1 quirk: mean over positive per-label F1s only.
    want_macro = np.mean(want_f1[want_f1 > 0]) if (want_f1 > 0).any() else 0.0
    np.testing.assert_allclose(macro_f1, want_macro, atol=1e-10)


def test_per_label_f1_zero_for_empty_classes():
    y_true = np.zeros((10, 3))
    y_true[:, 0] = 1
    logits = np.full((10, 3), 3.0)
    _, _, per_label = calculate_metrics(logits, y_true)
    assert per_label[1] == 0.0 and per_label[2] == 0.0
    assert per_label[0] == 1.0


def test_macro_map_all_empty():
    assert macro_map(np.zeros((5, 3)), np.random.rand(5, 3)) == 0.0
