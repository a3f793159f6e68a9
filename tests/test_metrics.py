"""Metric-suite tests.

Golden values below were produced by running the *reference* implementation
(``/root/reference/compute_accfpr/compute_accfpr.py``) on its shipped example
pair on 2026-08-16:

    {'auaf': 0.5630759202357615, 'fpr@0.95acc': 0.018280892951309545,
     'full_acc': 0.5664655330042055, 'fpr95': 0.03656178590261909,
     'fpr81.4': 0.011777113728247496, 'auroc': 0.987227872621411,
     'aupr_in': 0.9874972288256816, 'aupr_out': 0.9871065660448538,
     'detection_error': 0.04024018641333574,
     'accuracy_accept': 0.7192864355435881, 'accuracy': 0.2776483240724144,
     'f1': 0.7002369668246445, 'accuracy_indomain': 0.5664655330042055}
"""

import json

import numpy as np
import pytest

from rgqa_tpu.metrics import (
    RGQAEvaluator,
    accfpr_curve,
    accfpr_metrics,
    auc,
    aupr,
    auroc,
    detection_error,
    dump_predictions,
    f1_binary,
    fpr_at_tpr,
    ood_evaluate,
    ood_performance,
    precision_recall_curve,
    roc_curve,
)

GOLDEN = {
    "auaf": 0.5630759202357615,
    "fpr@0.95acc": 0.018280892951309545,
    "full_acc": 0.5664655330042055,
    "fpr95": 0.03656178590261909,
    "fpr81.4": 0.011777113728247496,
    "auroc": 0.987227872621411,
    "aupr_in": 0.9874972288256816,
    "aupr_out": 0.9871065660448538,
    "detection_error": 0.04024018641333574,
    "accuracy_accept": 0.7192864355435881,
    "accuracy": 0.2776483240724144,
    "f1": 0.7002369668246445,
    "accuracy_indomain": 0.5664655330042055,
}


@pytest.fixture(scope="module")
def golden_example(reference_dir):
    with open(reference_dir / "compute_accfpr" / "example.json") as f:
        rows = json.load(f)
    with open(reference_dir / "compute_accfpr" / "example_predict.json") as f:
        preds = json.load(f)
    qid2label = {r["question_id"]: r["label"] for r in rows}
    return qid2label, preds


class TestGoldenParity:
    def test_full_metric_dict_matches_reference(self, golden_example):
        qid2label, preds = golden_example
        result = ood_evaluate(qid2label, preds)
        # The evaluator matches src/ood_metrics.py, which adds fpr88.9 on
        # top of the public CLI's key set (the CLI pops it for byte parity).
        assert set(result) == set(GOLDEN) | {"fpr88.9"}
        for key, want in GOLDEN.items():
            assert result[key] == pytest.approx(want, rel=1e-12, abs=1e-12), key

    def test_quesid2ans_form_matches(self, golden_example):
        qid2label, preds = golden_example
        quesid2ans = {
            r["questionId"]: (r["prediction"], r["confidence"]) for r in preds
        }
        result = RGQAEvaluator(qid2label).evaluate_quesid2ans(quesid2ans)
        for key, want in GOLDEN.items():
            assert result[key] == pytest.approx(want, rel=1e-12, abs=1e-12), key


class TestCurvesVsSklearn:
    """Cross-check the numpy curve primitives against sklearn on random data."""

    @pytest.fixture(scope="class")
    def rng(self):
        return np.random.default_rng(0)

    def test_roc_curve(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        for n in (10, 257, 4096):
            y = rng.integers(0, 2, n)
            # Heavy ties to stress the distinct-threshold logic.
            s = np.round(rng.random(n), 2)
            fpr, tpr, thr = roc_curve(y, s)
            fpr_sk, tpr_sk, thr_sk = sk.roc_curve(y, s)
            np.testing.assert_allclose(fpr, fpr_sk)
            np.testing.assert_allclose(tpr, tpr_sk)
            np.testing.assert_allclose(thr[1:], thr_sk[1:])

    def test_precision_recall_curve(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        for n in (10, 257, 4096):
            y = rng.integers(0, 2, n)
            s = np.round(rng.random(n), 2)
            p, r, thr = precision_recall_curve(y, s)
            p_sk, r_sk, thr_sk = sk.precision_recall_curve(y, s)
            np.testing.assert_allclose(p, p_sk)
            np.testing.assert_allclose(r, r_sk)
            np.testing.assert_allclose(thr, thr_sk)

    def test_auc(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        x = np.sort(rng.random(50))
        y = rng.random(50)
        assert auc(x, y) == pytest.approx(sk.auc(x, y))
        assert auc(x[::-1], y[::-1]) == pytest.approx(sk.auc(x[::-1], y[::-1]))

    def test_f1(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y = rng.integers(0, 2, 500)
        p = rng.integers(0, 2, 500)
        assert f1_binary(y, p) == pytest.approx(sk.f1_score(y, p))


class TestAccfprCurve:
    def test_anchored_at_origin_and_monotone(self):
        labels = np.array(["a", "b", "UQ", "a", "UQ", "c"])
        preds = np.array(["a", "a", "a", "a", "c", "c"])
        scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5, 0.4])
        fpr, acc, thr = accfpr_curve(labels, preds, scores, "UQ")
        assert fpr[0] == 0.0 and acc[0] == 0.0
        assert thr[0] == pytest.approx(1.9)
        assert np.all(np.diff(fpr) >= 0)
        assert np.all(np.diff(acc) >= 0)
        # 4 answerable, 3 correct among them; 2 UQ both accepted at the end.
        assert acc[-1] == pytest.approx(3 / 4)
        assert fpr[-1] == pytest.approx(1.0)

    def test_perfect_separation(self):
        # All answerable-and-correct above all UQ: FPR@0.95acc should be 0.
        labels = np.array(["a"] * 10 + ["UQ"] * 10)
        preds = np.array(["a"] * 20)
        scores = np.r_[np.linspace(0.9, 0.99, 10), np.linspace(0.0, 0.5, 10)]
        m = accfpr_metrics(scores, preds, labels, "UQ")
        assert m["full_acc"] == pytest.approx(1.0)
        assert m["fpr@0.95acc"] == pytest.approx(0.0)
        assert m["auaf"] == pytest.approx(1.0)

    def test_rejecting_counts_as_wrong(self):
        # Accuracy at a high threshold is low even if accepted answers are right.
        labels = np.array(["a"] * 4 + ["UQ"])
        preds = np.array(["a"] * 5)
        scores = np.array([0.9, 0.1, 0.1, 0.1, 0.05])
        fpr, acc, thr = accfpr_curve(labels, preds, scores, "UQ")
        # At threshold 0.9 only 1 of 4 answerable accepted → acc 0.25.
        assert acc[1] == pytest.approx(0.25)

    def test_weighted_samples(self):
        labels = np.array(["a", "UQ", "a"])
        preds = np.array(["a", "x", "a"])
        scores = np.array([0.9, 0.5, 0.1])
        w = np.array([2.0, 1.0, 0.0])
        fpr, acc, thr = accfpr_curve(labels, preds, scores, "UQ", sample_weight=w)
        # Zero-weight row filtered out entirely: only 2 swept thresholds + anchor.
        assert len(thr) == 3
        # Weighted numerator over unweighted positive count (reference
        # accfpr.py:82,157 semantics).
        assert acc[-1] == pytest.approx(2.0)


class TestOODBundle:
    def test_fpr_at_tpr_edges(self):
        # Perfect separation: fpr95 == 0.
        s = np.r_[np.ones(10), np.zeros(10)]
        y = np.r_[np.ones(10), np.zeros(10)]
        assert fpr_at_tpr(s, y) == 0.0
        assert auroc(s, y) == pytest.approx(1.0)
        # Inverted: fpr at tpr>=0.95 is 1 (interp).
        assert fpr_at_tpr(-s, y) == pytest.approx(1.0)

    def test_detection_error_perfect(self):
        s = np.r_[np.ones(10), np.zeros(10)]
        y = np.r_[np.ones(10), np.zeros(10)]
        assert detection_error(s, y) == pytest.approx(0.0)

    def test_bundle_keys(self):
        rng = np.random.default_rng(1)
        y = rng.integers(0, 2, 200)
        s = rng.random(200) + 0.3 * y
        m = ood_performance(y, s)
        assert set(m) == {
            "fpr95",
            "fpr81.4",
            "fpr88.9",
            "auroc",
            "aupr_in",
            "aupr_out",
            "detection_error",
        }


class TestDumpContract:
    def test_roundtrip_and_format(self, tmp_path):
        quesid2ans = {"q1": ("yes", 0.123456), "q2": ("cat", 0.9)}
        path = tmp_path / "pred.json"
        dump_predictions(quesid2ans, str(path))
        rows = json.loads(path.read_text())
        assert rows == [
            {"confidence": 0.1235, "prediction": "yes", "questionId": "q1"},
            {"confidence": 0.9, "prediction": "cat", "questionId": "q2"},
        ]
        # Keys serialized sorted, 4-space indent — matches reference dump.
        text = path.read_text()
        assert '    {\n        "confidence"' in text

    def test_dump_consumable_by_reference_cli_format(self, tmp_path):
        # The records must evaluate identically through our evaluator.
        qid2label = {"q1": {"yes": 1.0}, "q2": {"UQ": 1.0}}
        quesid2ans = {"q1": ("yes", 0.9), "q2": ("cat", 0.1)}
        path = tmp_path / "pred.json"
        dump_predictions(quesid2ans, str(path))
        result = ood_evaluate(qid2label, json.loads(path.read_text()))
        assert result["full_acc"] == pytest.approx(1.0)
        assert result["accuracy_indomain"] == pytest.approx(1.0)
