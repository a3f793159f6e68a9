"""Dataset-cartography distillation pipeline.

Rebuild of ``src/tasks/gqa_distill.py`` (+ ``gqa_distill_online.py``'s
selection rules): generate re-paired (image, question-from-other-image)
candidates, score them with a teacher across several passes (epoch
checkpoints or dropout seeds), compute cartography statistics
(mean confidence + variability), then select:

- pseudo-AQ: confidence > tau_aq_c and variability < tau_aq_v, labeled
  with the teacher's majority answer weighted by mean confidence;
- pseudo-UQ: confidence < tau_uq_c and variability < tau_uq_v, labeled UQ;
- optionally balance AQ/UQ to within 1.25x (``filter_data_for_distill``).

Output rows use the reference's ``question_id = img_id + '+' + orig_qid``
convention and the standard split-JSON schema, so the student trains on
them through the normal pipeline.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Mapping, Optional, Sequence

import numpy as np

__all__ = [
    "sample_repaired",
    "cartography_stats",
    "select_distill",
    "build_distill_split",
    "build_ensemble_distill_split",
]


def sample_repaired(
    data: Sequence[Mapping],
    rng: np.random.Generator,
    n: int,
) -> list[dict]:
    """Re-pair questions with other images (``gqa_distill.py:190-227``)."""
    img_ids = sorted({d["img_id"] for d in data})
    out = []
    for i in range(n):
        q = data[int(rng.integers(len(data)))]
        img = img_ids[int(rng.integers(len(img_ids)))]
        while img == q["img_id"] and len(img_ids) > 1:
            img = img_ids[int(rng.integers(len(img_ids)))]
        out.append(
            {
                "img_id": img,
                "sent": q["sent"],
                "original_question_id": q["question_id"],
                "question_id": f"cand{i:07d}",
            }
        )
    return out


def stats_from_charts(chart_dir: str) -> dict[str, dict]:
    """Cartography statistics from training chart pickles.

    The reference's offline pipeline consumes per-epoch ``--chart`` dumps
    (``gqa_distill.py:37-42``; chart rows are ``{qid: (max-score, gold
    label, pred)}`` written by the trainer).  Mean confidence +
    variability over epochs, majority answer over predictions.
    """
    import glob
    import pickle

    passes = []
    for path in sorted(glob.glob(os.path.join(chart_dir, "epoch_*.pkl"))):
        with open(path, "rb") as f:
            chart = pickle.load(f)
        passes.append(
            {qid: (pred, float(score)) for qid, (score, _gold, pred) in chart.items()}
        )
    if not passes:
        raise FileNotFoundError(f"no epoch_*.pkl charts under {chart_dir}")
    common = set(passes[0])
    for p in passes[1:]:
        common &= set(p)
    passes = [{q: p[q] for q in common} for p in passes]
    return cartography_stats(passes)


def cartography_stats(
    passes: Sequence[Mapping[str, tuple[str, float]]],
) -> dict[str, dict]:
    """Per-question mean confidence, variability, majority answer
    (``gqa_distill.py:252-259``)."""
    out: dict[str, dict] = {}
    qids = passes[0].keys()
    for qid in qids:
        confs = np.asarray([p[qid][1] for p in passes], np.float64)
        answers = [p[qid][0] for p in passes]
        mean = float(confs.mean())
        out[qid] = {
            "confidence": mean,
            "variability": float(np.sqrt(((confs - mean) ** 2).mean())),
            "answer": Counter(answers).most_common(1)[0][0],
        }
    return out


def select_distill(
    candidates: Sequence[Mapping],
    stats: Mapping[str, dict],
    *,
    tau_aq_c: float = 0.5,
    tau_aq_v: float = 0.15,
    tau_uq_c: float = 0.1,
    tau_uq_v: float = 0.05,
    balance: bool = False,
    n_original: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> tuple[list[dict], list[dict]]:
    """Threshold + balance selection (``filter_data_for_distill``)."""
    rng = rng or np.random.default_rng(0)
    aq, uq = [], []
    for cand in candidates:
        # Candidates whose image was dropped by the feature filter
        # (--tiny/--fast or missing rows) have no teacher scores — skip.
        if cand["question_id"] not in stats:
            continue
        s = stats[cand["question_id"]]
        row = {
            "img_id": cand["img_id"],
            "sent": cand["sent"],
            "question_id": cand["img_id"] + "+" + cand["original_question_id"],
        }
        if s["confidence"] < tau_uq_c and s["variability"] < tau_uq_v:
            row["label"] = {"UQ": 1}
            uq.append(row)
        elif s["confidence"] > tau_aq_c and s["variability"] < tau_aq_v:
            row["label"] = {s["answer"]: float(s["confidence"])}
            aq.append(row)
    rng.shuffle(uq)
    rng.shuffle(aq)
    if balance:
        n_uq, n_aq = len(uq), len(aq)
        if n_aq + n_original > n_uq * 1.25:
            aq = aq[: max(int(n_uq * 1.25 - n_original), 0)]
        elif n_uq > (n_aq + n_original) * 1.25:
            uq = uq[: int((n_aq + n_original) * 1.25)]
    return aq, uq


def build_distill_split(
    runner,
    *,
    n_candidates: int,
    passes: int = 3,
    out_path: str,
    seed: int = 0,
    balance: bool = True,
    **taus,
) -> list[dict]:
    """End-to-end: sample candidates, teacher-score with MC-dropout passes,
    select, and write the student training split JSON.

    ``runner`` is a trained :class:`rgqa_tpu.runner.GQARunner` (the
    teacher).  Where the reference scores with per-epoch checkpoints, this
    uses stochastic dropout passes — same variability statistic, no
    checkpoint zoo required (checkpoint-based passes remain possible by
    calling ``score_split`` per loaded checkpoint and using
    ``cartography_stats`` directly).
    """
    import json

    from rgqa_tpu.data.dataset import GQADataset
    from rgqa_tpu.scorers import make_dropout_scorer

    rng = np.random.default_rng(seed)
    cands = sample_repaired(runner.dataset.data, rng, n_candidates)
    tmp = GQADataset.from_rows(
        cands,
        ans2label=runner.dataset.ans2label,
        label2ans=runner.dataset.label2ans,
        name="distill_candidates",
    )
    encoded = runner._encode(tmp)

    pass_results = []
    for i in range(passes):
        scorer = make_dropout_scorer(runner.forward, seed_list=(seed + i,))
        pass_results.append(runner.score_split(encoded, scorer=scorer))
    stats = cartography_stats(pass_results)
    aq, uq = select_distill(
        cands, stats, balance=balance, n_original=len(runner.dataset.data),
        rng=rng, **taus,
    )
    rows = aq + uq
    with open(out_path, "w") as f:
        json.dump(rows, f)
    return rows


def build_ensemble_distill_split(
    runner,
    ckpt_paths: Sequence[str],
    *,
    splits: str,
    out_path: str,
) -> list[dict]:
    """Ensemble-teacher pseudo-labeling (``gqa_ensemble_distill.py:85-139``).

    Loads each checkpoint into ``runner`` in turn, multiplies the sigmoid
    vectors per question across teachers (product ensemble), and writes a
    pseudo-labeled student split ``{img_id, question_id, sent,
    label: {argmax answer: ensemble score}}``.  UQ rows keep the
    reference's ``unanswerable_reason+question_id`` id convention
    (``:91-100``).
    """
    import json

    from rgqa_tpu.data.dataset import GQADataset

    # Re-keyed source rows (the reference builds a dict keyed by the
    # possibly reason-prefixed qid).
    data: dict[str, dict] = {}
    for d in GQADataset(
        runner.cfg.data.data_root, splits, add_uq=True
    ).data:
        label = d.get("label") or {}
        if "UQ" in label and d.get("unanswerable_reason"):
            qid = f"{d['unanswerable_reason']}+{d['question_id']}"
        else:
            qid = d["question_id"]
        data[qid] = {**d, "question_id": qid}

    tmp = GQADataset.from_rows(
        list(data.values()),
        ans2label=runner.dataset.ans2label,
        label2ans=runner.dataset.label2ans,
        name="ensemble_distill",
    )
    encoded = runner._encode(tmp)

    from rgqa_tpu.scorers import make_msp_scorer

    msp = make_msp_scorer(runner.forward)
    quesid2conf: dict[str, np.ndarray] = {}
    for path in ckpt_paths:
        runner.load(path)
        for qids, batch, real in runner._iter_eval(encoded):
            probs = np.asarray(msp(runner.params, batch)["probs"])[:real]
            for qid, p in zip(qids, probs):
                if qid in quesid2conf:
                    quesid2conf[qid] = quesid2conf[qid] * p
                else:
                    quesid2conf[qid] = p

    final = []
    label2ans = runner.label2ans
    for qid, score in quesid2conf.items():
        label = int(np.argmax(score))
        final.append(
            {
                "img_id": data[qid]["img_id"],
                "question_id": data[qid]["question_id"],
                "sent": data[qid]["sent"],
                "label": {label2ans[label]: float(score[label])},
            }
        )
    with open(out_path, "w") as f:
        json.dump(final, f)
    return final
