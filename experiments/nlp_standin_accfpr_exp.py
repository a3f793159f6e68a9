"""Accfpr-level ablation of the NLP stand-ins (VERDICT r4 #6 —
measurement only; nothing ships from this script).

Two environmental stand-ins replace uninstallable NLP dependencies:

- the verifier's rule templates replace benepar constituency parses
  (``rgqa_tpu/verifier.py`` vs ``src/POSTree.py``), with a measured
  0.8% of real GQA questions landing in the word-order-preserving
  ``fallback`` rule;
- the coverage scorer's noun heuristic replaces spacy POS tagging
  (``rgqa_tpu/scorers/coverage.py::noun_tokens``; the nltk tagger path
  exists but its model data is also un-downloadable here).

Both were fidelity-measured at the token/template level
(``tests/test_fidelity.py``); this script measures what the int8 feed
got in ``experiments/int8_accfpr_exp.py``: the METRIC-level footprint,
on the reference's own golden example (11,158 REAL GQA questions +
its shipped prediction file) through the byte-compatible metric stack.

No gold parser/tagger is installable (zero egress), so the ablation
brackets instead of A/Bs:

  verifier fallback rows —
    (a) exclusion: metrics with the fallback-rule rows dropped from the
        eval set (their total weight in every metric);
    (b) adversarial: metrics with those rows' confidences flipped to
        the worst case (0 for accepted-at-tau rows, 1 for rejected) —
        an upper bound on what ANY template degradation there could do.

  coverage-suspect rows —
    rows where the noun heuristic yields 0 nouns (scorer auto-accepts)
    or >= 5 nouns (near-certain reject): the failure modes a gold
    tagger would fix.  Same exclusion + adversarial bracketing.

If even the adversarial arm moves AUAF by less than the run-to-run
noise of a training seed, the stand-ins are metric-neutral and the
residues can stay.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLD_DIR = "/root/reference/compute_accfpr"
TAU = 0.5
KEYS = (
    "auaf", "fpr@0.95acc", "full_acc", "auroc", "aupr_in", "aupr_out",
    "fpr95", "detection_error", "f1", "accuracy", "accuracy_accept",
    "accuracy_indomain",
)


def _metrics(qid2label, preds):
    from rgqa_tpu.metrics.evaluator import ood_evaluate

    out = ood_evaluate(qid2label, preds, tau=TAU)
    return {k: out[k] for k in KEYS if k in out}


def _delta_report(name, base, arm, n_rows):
    print(f"\n--- {name} (rows touched: {n_rows}) ---")
    for k in base:
        d = arm.get(k, float("nan")) - base[k]
        flag = "  <-- " if abs(d) > 0.005 else ""
        print(f"{k:18s} {base[k]:8.4f} -> {arm.get(k, float('nan')):8.4f} "
              f"(d={d:+.4f}){flag}")


def main():
    from rgqa_tpu.scorers.coverage import noun_tokens
    from rgqa_tpu.verifier import statement_with_rule

    with open(os.path.join(GOLD_DIR, "example.json")) as f:
        rows = json.load(f)
    with open(os.path.join(GOLD_DIR, "example_predict.json")) as f:
        preds = json.load(f)
    qid2label = {r["question_id"]: r["label"] for r in rows}
    qid2sent = {r["question_id"]: r["sent"] for r in rows}
    base = _metrics(qid2label, preds)
    print(f"golden example: {len(rows)} questions, tau={TAU}")

    def bracket(name, suspect_qids):
        sus = set(suspect_qids)
        # (a) exclusion
        excl_labels = {q: l for q, l in qid2label.items() if q not in sus}
        excl_preds = [p for p in preds if p["questionId"] not in sus]
        _delta_report(
            f"{name}: excluded", base,
            _metrics(excl_labels, excl_preds), len(sus),
        )
        # (b) adversarial flip: accepted rows -> confidence 0 (forced
        # reject), rejected rows -> 1 (forced accept).
        adv = [
            dict(p, confidence=(0.0 if p["confidence"] >= TAU else 1.0))
            if p["questionId"] in sus
            else p
            for p in preds
        ]
        _delta_report(
            f"{name}: adversarial flip", base, _metrics(qid2label, adv),
            len(sus),
        )

    # ------------------------------------------------- verifier fallback
    fallback = [
        q for q, s in qid2sent.items()
        if statement_with_rule(s)[1] == "fallback"
    ]
    print(
        f"\nverifier fallback rows: {len(fallback)}/{len(rows)} "
        f"({100 * len(fallback) / len(rows):.2f}%)"
    )
    bracket("verifier fallback", fallback)

    # ------------------------------------------------- coverage suspects
    counts = {q: len(noun_tokens(s)) for q, s in qid2sent.items()}
    zero = [q for q, c in counts.items() if c == 0]
    many = [q for q, c in counts.items() if c >= 5]
    print(
        f"\ncoverage suspects: {len(zero)} zero-noun "
        f"({100 * len(zero) / len(rows):.2f}%), {len(many)} >=5-noun "
        f"({100 * len(many) / len(rows):.2f}%)"
    )
    bracket("coverage zero-noun", zero)
    bracket("coverage >=5-noun", many)

    dist = np.bincount(list(counts.values()))
    print("\nnoun-count distribution:", dict(enumerate(dist.tolist())))


if __name__ == "__main__":
    main()
