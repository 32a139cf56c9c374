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


class TestCalibration:
    """ECE/Brier — the metric code behind the reference's calibration claim
    (reference README.md:7, 17; no metric shipped in the snapshot)."""

    def test_perfectly_calibrated_is_zero(self):
        from aecf_tpu.train.metrics import expected_calibration_error

        rng = np.random.default_rng(0)
        p = rng.uniform(0, 1, 200_000)
        t = (rng.uniform(0, 1, p.size) < p).astype(float)
        assert expected_calibration_error(p, t, n_bins=10) < 0.01

    def test_hand_computed_two_bins(self):
        from aecf_tpu.train.metrics import expected_calibration_error

        # bin [0, .5): probs (.2, .4) mean .3, acc 0.0 → |0 − .3| = .3
        # bin [.5, 1]: probs (.6, .8) mean .7, acc 1.0 → |1 − .7| = .3
        # equal occupancy → ECE = .3
        p = np.array([0.2, 0.4, 0.6, 0.8])
        t = np.array([0.0, 0.0, 1.0, 1.0])
        assert abs(expected_calibration_error(p, t, n_bins=2) - 0.3) < 1e-12

    def test_overconfident_detected(self):
        from aecf_tpu.train.metrics import expected_calibration_error

        rng = np.random.default_rng(1)
        # claims 99% confidence, right only 60% of the time
        p = np.full(10_000, 0.99)
        t = (rng.uniform(0, 1, p.size) < 0.6).astype(float)
        assert expected_calibration_error(p, t) > 0.3

    def test_edge_values_and_validation(self):
        from aecf_tpu.train.metrics import expected_calibration_error

        assert expected_calibration_error(np.array([0.0, 1.0]),
                                          np.array([0.0, 1.0])) == 0.0
        assert expected_calibration_error(np.zeros(0), np.zeros(0)) == 0.0
        with np.testing.assert_raises(ValueError):
            expected_calibration_error(np.array([1.5]), np.array([1.0]))
        # NaN slips past range checks (comparisons are False) and would
        # silently deflate ECE — must be rejected loudly instead.
        with np.testing.assert_raises(ValueError):
            expected_calibration_error(
                np.array([0.5, np.nan]), np.array([1.0, 0.0])
            )
        with np.testing.assert_raises(ValueError):
            expected_calibration_error(
                np.array([0.5, np.inf]), np.array([1.0, 0.0])
            )

    def test_brier(self):
        from aecf_tpu.train.metrics import brier_score

        assert brier_score(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == 0.0
        assert abs(brier_score(np.array([0.5]), np.array([1.0])) - 0.25) < 1e-12
        # proper scoring: calibrated-but-uninformative worse than sharp+right
        rng = np.random.default_rng(2)
        t = (rng.uniform(0, 1, 1000) < 0.5).astype(float)
        assert brier_score(np.full(1000, 0.5), t) > brier_score(t, t)

    def test_sweep_reports_calibration(self):
        from aecf_tpu.train.sweeps import missing_modality_sweep

        rng = np.random.default_rng(3)
        n, c = 64, 4
        labels = (rng.uniform(size=(n, c)) < 0.3).astype(float)

        def predict(a, b):
            return (labels * 4 - 2) + rng.normal(0, 0.1, size=(len(a), c))

        mods = {"a": rng.normal(size=(n, 8)), "b": rng.normal(size=(n, 8))}
        res = missing_modality_sweep(predict, mods, labels)
        for subset, row in res.items():
            assert {"map", "macro_f1", "per_label_f1", "ece", "brier"} <= set(row)
            assert 0.0 <= row["ece"] <= 1.0


class TestRecallAtK:
    """Retrieval recall@K — the deleted COCO experiments' protocol."""

    def test_perfect_retrieval(self):
        from aecf_tpu.train.metrics import recall_at_k

        rng = np.random.default_rng(0)
        emb = rng.normal(size=(32, 16))
        r = recall_at_k(emb, emb)  # identical pairs → rank 0 everywhere
        assert r[1] == 1.0 and r[5] == 1.0

    def test_hand_computed_ranks(self):
        from aecf_tpu.train.metrics import recall_at_k

        # targets on axes; queries 0 and 2 sit on their pair's axis
        # (rank 0); query 1 points mostly at target 2's axis, so its true
        # pair t1 ranks SECOND (behind t2) → top-1 miss, top-2 hit.
        q = np.array([[1.0, 0.0, 0.0],
                      [0.0, 0.1, 0.9],
                      [0.0, 0.0, 1.0]])
        t = np.eye(3)
        r = recall_at_k(q, t, ks=(1, 2))
        assert r[1] == pytest.approx(2 / 3)
        assert r[2] == 1.0

    def test_noisy_pairs_monotone_in_k(self):
        from aecf_tpu.train.metrics import recall_at_k

        rng = np.random.default_rng(1)
        t = rng.normal(size=(128, 32))
        q = t + 1.2 * rng.normal(size=t.shape)  # noisy match
        r = recall_at_k(q, t, ks=(1, 5, 10))
        assert r[1] <= r[5] <= r[10]
        assert r[10] > 2 * 10 / 128  # far better than chance

    def test_validation_and_empty(self):
        from aecf_tpu.train.metrics import recall_at_k

        assert recall_at_k(np.zeros((0, 4)), np.zeros((0, 4)))[1] == 0.0
        with np.testing.assert_raises(ValueError):
            recall_at_k(np.zeros((2, 4)), np.zeros((3, 4)))
