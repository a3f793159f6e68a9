"""Fuzz parity: our metric stack vs the reference accfpr/ood_metrics code
executed in-process (sklearn is available), over random prediction sets
including tie/degenerate cases the golden example doesn't cover."""

import sys

import numpy as np
import pytest

from rgqa_tpu.metrics import accfpr_curve, accfpr_metrics, ood_performance


@pytest.fixture(scope="module")
def ref_metrics(reference_dir):
    sys.path.insert(0, str(reference_dir))
    sys.path.insert(0, str(reference_dir / "src"))
    try:
        from accfpr import accfpr as ref_accfpr
        import ood_metrics as ref_ood
    finally:
        sys.path.pop(0)
        sys.path.pop(0)
    return ref_accfpr, ref_ood


def _random_case(rng, n, *, ties=False, all_pos=False, all_neg=False):
    answers = ["a", "b", "c", "d"]
    if all_pos:
        golds = [answers[rng.integers(4)] for _ in range(n)]
    elif all_neg:
        golds = ["UQ"] * n
    else:
        golds = [
            "UQ" if rng.random() < 0.4 else answers[rng.integers(4)]
            for _ in range(n)
        ]
    preds = [answers[rng.integers(4)] for _ in range(n)]
    scores = rng.random(n)
    if ties:
        scores = np.round(scores, 1)  # heavy ties
    return np.asarray(golds, str), np.asarray(preds, str), scores


class TestAccfprFuzz:
    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.parametrize("ties", [False, True])
    def test_curve_matches_reference(self, ref_metrics, seed, ties):
        ref_accfpr, _ = ref_metrics
        rng = np.random.default_rng(seed)
        golds, preds, scores = _random_case(rng, 200, ties=ties)
        ours = accfpr_curve(golds, preds, scores, "UQ")
        theirs = ref_accfpr.accfpr_curve(golds, preds, scores, "UQ")
        for o, t, name in zip(ours, theirs, ("fpr", "acc", "thresh")):
            np.testing.assert_allclose(o, t, rtol=1e-12, atol=0, err_msg=name)

    @pytest.mark.parametrize("seed", range(3))
    def test_metric_bundle_matches_reference(self, ref_metrics, seed):
        _, ref_ood = ref_metrics
        rng = np.random.default_rng(100 + seed)
        golds, preds, scores = _random_case(rng, 300)
        ours = accfpr_metrics(scores, preds, golds, "UQ", 0.95)
        theirs = ref_ood.accfpr_metrics(scores, preds, golds, "UQ", 0.95)
        for key in theirs:
            np.testing.assert_allclose(
                ours[key], theirs[key], rtol=1e-12, err_msg=key
            )

    @pytest.mark.parametrize("seed", range(3))
    def test_ood_performance_matches_reference(self, ref_metrics, seed):
        _, ref_ood = ref_metrics
        rng = np.random.default_rng(200 + seed)
        golds, preds, scores = _random_case(rng, 300)
        is_answerable = (golds != "UQ").astype(np.float64)
        ours = ood_performance(is_answerable, scores)
        theirs = ref_ood.ood_performance(is_answerable.tolist(), scores.tolist())
        for key in theirs:
            np.testing.assert_allclose(
                ours[key], theirs[key], rtol=1e-9, err_msg=key
            )

    def test_all_answerable_case(self, ref_metrics):
        ref_accfpr, _ = ref_metrics
        rng = np.random.default_rng(7)
        golds, preds, scores = _random_case(rng, 50, all_pos=True)
        ours = accfpr_curve(golds, preds, scores, "UQ")
        theirs = ref_accfpr.accfpr_curve(golds, preds, scores, "UQ")
        np.testing.assert_allclose(ours[1], theirs[1])
