"""Metric suite for selective VQA / OOD rejection.

Pure-numpy re-implementation (no sklearn dependency) of the RGQA metric
contract, validated bit-for-bit against the reference golden example
(``/root/reference/compute_accfpr``):

- ``accfpr_curve`` — the acc-fpr curve for selective classification with a
  designated reject label (reference ``accfpr/accfpr.py:87-167``).
- ``ood_performance`` — AUROC / AUPR-in/out / FPR@TPR / detection error
  (reference ``src/ood_metrics.py:103-116``).
- ``accfpr_metrics`` — AUAF, FPR@0.95·acc (FF95), full accuracy (FACC)
  (reference ``src/ood_metrics.py:118-151``).
- ``RGQAEvaluator`` — end-to-end evaluation of prediction lists
  (reference ``compute_accfpr/compute_accfpr.py:13-68`` and
  ``src/tasks/gqa_data.py:531-605``).
"""

from rgqa_tpu.metrics.curves import (
    auc,
    accfpr_curve,
    roc_curve,
    precision_recall_curve,
)
from rgqa_tpu.metrics.ood import (
    auroc,
    aupr,
    fpr_at_tpr,
    detection_error,
    ood_performance,
    accfpr_metrics,
    f1_binary,
)
from rgqa_tpu.metrics.evaluator import (
    RGQAEvaluator,
    ClosedSetEvaluator,
    ood_evaluate,
    dump_predictions,
)

__all__ = [
    "auc",
    "accfpr_curve",
    "roc_curve",
    "precision_recall_curve",
    "auroc",
    "aupr",
    "fpr_at_tpr",
    "detection_error",
    "ood_performance",
    "accfpr_metrics",
    "f1_binary",
    "RGQAEvaluator",
    "ClosedSetEvaluator",
    "ood_evaluate",
    "dump_predictions",
]
