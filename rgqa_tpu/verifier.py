"""Verifier rejection strategy: answer-statement plausibility.

Rebuild of ``src/tasks/gqa_verifier.py`` (+ ``src/POSTree.py``): convert
each question into a declarative template with an ``**blank**`` answer
slot, train a binary verifier (LXMERT over statement+image, 1 logit) on

- the gold-answer fill (label 1),
- a wrong top-k proposal fill (label 0),
- a random other-image question's gold fill (label 0)
  (``gqa_verifier.py:165-280``),

and at eval score the statement filled with the answerer's prediction.

The reference derives templates from benepar constituency parses
(``POSTree.py``); benepar/spacy aren't installable here, so
:func:`question_to_statement` is a rule-based converter covering GQA's
question grammar (wh-subject, wh-copula, color/count/where forms, yes/no
auxiliaries).  Statements are rebuilt per batch on host (they depend on
sampled answer fills), then tokenized with the standard WordPiece path.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "question_to_statement",
    "statement_with_rule",
    "fill_statement",
    "VerifierTrainer",
]

_AUX = ("is", "are", "was", "were", "does", "do", "did", "can", "could")
_PRONOUNS = {"it", "this", "that", "he", "she"}


def statement_with_rule(sent: str) -> tuple[str, str]:
    """Question -> (statement template with an ``**blank**`` answer slot,
    name of the rule that fired).

    The rule set covers the real GQA question-form distribution — measured
    over the 11,158 questions of the reference's golden example
    (``compute_accfpr/example.json``) in
    ``tests/test_fidelity.py::TestVerifierTemplates`` — replacing the
    reference's benepar-parse POSTree transform (``POSTree.py:24+``),
    which is uninstallable here.  ``fallback`` marks questions no rule
    converts (statement keeps the question's own word order).
    """
    q = sent.strip().rstrip("?").strip()
    low = q.lower()
    # Contractions: "what's" -> "what is" etc. (121/11k GQA questions).
    low = re.sub(r"\b(what|who|where|which|how)'s\b", r"\1 is", low)
    words = low.split()
    if not words:
        return "**blank**", "empty"
    w0 = words[0]

    m = re.match(r"(?:of\s+)?(what|which)\s+colou?r\s+(is|are)\s+(.*)", low)
    if m:
        return f"the color of {m.group(3)} {m.group(2)} **blank**", "color"
    m = re.match(r"how\s+many\s+(.*)", low)
    if m:
        return f"there are **blank** {m.group(1)}", "count"
    # "how big/tall/... is X" -> "X is **blank**" (the answer is the
    # degree adjective: "how big is the house" / "large").
    m = re.match(r"how\s+(\w+)\s+(is|are)\s+(.*)", low)
    if m and m.group(1) not in ("many", "much"):
        return f"{m.group(3)} {m.group(2)} **blank**", "degree"
    # "how clean do you think is X" -> "X is **blank**".
    m = re.match(r"how\s+\w+\s+do\s+you\s+think\s+(is|are)\s+(.*)", low)
    if m:
        return f"{m.group(2)} {m.group(1)} **blank**", "degree"
    # "how is X called" / "what is X called" -> "X is called **blank**".
    m = re.match(r"(?:how|what)\s+(is|are)\s+(.*?)\s+called", low)
    if m:
        return f"{m.group(2)} {m.group(1)} called **blank**", "called"
    m = re.match(r"what\s+(.*?)\s+(is|are)\s+called", low)
    if m:  # GQA's inverted form: "what the X is called?"
        return f"{m.group(1)} {m.group(2)} called **blank**", "called"
    m = re.match(r"where\s+(is|are)\s+(.*)", low)
    if m:
        return f"{m.group(2)} {m.group(1)} in **blank**", "where"
    m = re.match(r"where\s+(does|do|did)\s+(.*)", low)
    if m:
        return f"{m.group(2)} in **blank**", "where-do"
    # "(on|in) which side ..." -> "... on the **blank** side".
    m = re.match(r"(on|in)\s+which\s+side(?:\s+of\s+(?:the\s+)?\w+)?\s+(is|are)\s+(.*)", low)
    if m:
        return (
            f"{m.group(3)} {m.group(2)} {m.group(1)} the **blank** side",
            "side",
        )
    m = re.match(r"(what|which|who)\s+(is|are|was|were)\s+(.*)", low)
    if m:
        rest = m.group(3)
        if rest in _PRONOUNS:  # "which place is it" -> "it is **blank**"
            return f"{rest} {m.group(2)} **blank**", "wh-pronoun"
        return f"**blank** {m.group(2)} {rest}", "wh-copula"
    # "what/which/who <noun phrase> <verb> ..." ("what kind of device is
    # shown", "which animal do you see") and do-support forms.
    m = re.match(r"(what|which|who)\s+(.*?)\s+(does|do|did)\s+(.*)", low)
    if m:
        return f"{m.group(4)} the **blank** {m.group(2)}", "wh-do"
    m = re.match(r"(what|which|who)\s+(.*)", low)
    if m:
        return f"the {m.group(2)} is **blank**", "wh-generic"
    if w0 in _AUX:
        # Yes/no question: "is there a dog" -> "there is a dog , **blank**".
        rest = " ".join(words[1:])
        return f"{rest} , **blank**", "yes-no"
    # Trailing-wh questions are already in statement order ("The vase
    # holds what?", "... is of which color?"): substitute the wh-tail.
    m = re.match(r"(.*)\s+(?:of\s+)?(?:which|what)\s+colou?r$", low)
    if m:
        return f"{m.group(1)} **blank** color", "tail-color"
    m = re.match(r"(.*)\s+(what|who|where|which)$", low)
    if m:
        return f"{m.group(1)} **blank**", "tail-wh"
    # "Beside/inside what is the X ..." -> "the X ... is beside **blank**".
    m = re.match(
        r"(beside|inside|behind|under|over|near|above|below|around)\s+"
        r"what\s+(is|are)\s+(.*)", low,
    )
    if m:
        return f"{m.group(3)} {m.group(2)} {m.group(1)} **blank**", "prep-wh"
    return f"{low} **blank**", "fallback"


def question_to_statement(sent: str) -> str:
    """Question -> statement template with an ``**blank**`` answer slot."""
    return statement_with_rule(sent)[0]


def fill_statement(template: str, answer: str) -> str:
    if answer == "":
        return template.replace(" **blank**", "").replace("**blank**", "")
    return template.replace("**blank**", answer)


class VerifierTrainer:
    """Trains and evaluates the statement verifier.

    ``answerer`` is a trained GQARunner (frozen); ``verifier`` is a
    GQARunner built with ``strategy='separate'`` (1-logit LXMERT) whose
    text inputs are statements instead of questions.
    """

    def __init__(self, verifier, answerer, topk: int = 5, seed: int = 0):
        self.verifier = verifier
        self.answerer = answerer
        self.topk = topk
        self.rng = np.random.default_rng(seed)
        self.templates: dict[str, str] = {}

    def _template(self, qid: str, sent: str) -> str:
        if qid not in self.templates:
            self.templates[qid] = question_to_statement(sent)
        return self.templates[qid]

    def _statement_batch(self, sents: Sequence[str], base_batch: dict) -> dict:
        ids, mask, seg = self.verifier.tokenizer.encode_batch(
            sents, self.verifier.cfg.model.max_text_len
        )
        out = dict(base_batch)
        out["input_ids"], out["input_mask"], out["segment_ids"] = ids, mask, seg
        return out

    def train(self, encoded, epochs: int = 1, batch_size: int = 16) -> list[float]:
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.data import batch_iterator
        from rgqa_tpu.parallel import shard_batch
        from rgqa_tpu.train import create_train_state, make_optimizer, make_train_step

        n_batches = len(encoded) // batch_size
        tx = make_optimizer(
            self.verifier.cfg.train.optim, max(n_batches * epochs, 1)
        )
        state = create_train_state(self.verifier.params, tx)
        step = make_train_step(self.verifier.forward, binary=True)

        @jax.jit
        def topk_answers(params, batch):
            out = self.answerer.forward(params, batch, deterministic=True)
            return jax.lax.top_k(
                out["logits"].astype(jnp.float32), self.topk
            )[1]

        key = jax.random.PRNGKey(0)
        losses = []
        dataset = encoded.dataset
        label2ans = self.answerer.label2ans
        for _ in range(epochs):
            for qids, batch, real in batch_iterator(
                encoded, batch_size, shuffle=True, rng=self.rng, drop_last=True
            ):
                proposals = np.asarray(topk_answers(self.answerer.params, batch))
                sents, labels = [], []
                b = len(qids)
                for j, qid in enumerate(qids):
                    datum = dataset.id2datum[qid]
                    tmpl = self._template(qid, datum["sent"])
                    gold = next(iter(datum.get("label") or {}), "")
                    # Positive: gold fill.
                    sents.append(fill_statement(tmpl, gold))
                    labels.append(1.0)
                    # Negative 1: wrong top-k proposal fill.
                    wrong = [
                        label2ans[int(p)]
                        for p in proposals[j]
                        if label2ans[int(p)] != gold
                    ]
                    pick = wrong[int(self.rng.integers(len(wrong)))] if wrong else ""
                    sents.append(fill_statement(tmpl, pick))
                    labels.append(0.0)
                    # Negative 2: random-paired other question's statement
                    # (never the anchor itself — k == j would label the
                    # gold statement 0 and 1 in the same batch).
                    k = (j + int(self.rng.integers(1, b))) % b
                    other = dataset.id2datum[qids[k]]
                    o_tmpl = self._template(qids[k], other["sent"])
                    o_gold = next(iter(other.get("label") or {}), "")
                    sents.append(fill_statement(o_tmpl, o_gold))
                    labels.append(0.0)

                tiled = {
                    k2: np.repeat(np.asarray(v), 3, axis=0)
                    for k2, v in batch.items()
                    if k2 in ("feats", "boxes")
                }
                vb = self._statement_batch(sents, tiled)
                vb["target"] = np.zeros((3 * b, 1), np.float32)
                vb["id_mask"] = np.asarray(labels, np.float32)
                key, sub = jax.random.split(key)
                state, aux = step(
                    state, shard_batch(self.verifier.mesh, vb), sub
                )
                losses.append(float(aux["loss"]))
        self.verifier.params = state.params
        return losses

    def ood_evaluate(self, encoded, dump: Optional[str] = None) -> dict:
        """Answer from the answerer; confidence = verifier's plausibility
        of the filled statement (``gqa_verifier.py`` eval path)."""
        import jax

        from rgqa_tpu.metrics import RGQAEvaluator, dump_predictions
        from rgqa_tpu.scorers import make_msp_scorer

        verify = make_msp_scorer(self.verifier.forward)
        answers = self.answerer.predict(self.answerer._encode(encoded.dataset))
        quesid2ans = {}
        for qids, batch, real in self.verifier._iter_eval(encoded):
            sents = []
            for qid in qids:
                datum = encoded.dataset.id2datum[qid]
                tmpl = self._template(qid, datum["sent"])
                sents.append(fill_statement(tmpl, answers[qid]))
            # The final batch is padded to full size; pad statements too.
            n_rows = batch["feats"].shape[0]
            sents += [sents[-1]] * (n_rows - len(sents))
            vb = self._statement_batch(
                sents, {k: batch[k] for k in ("feats", "boxes")}
            )
            out = verify(self.verifier.params, vb)
            scores = np.asarray(out["score"])[:real]
            for qid, s in zip(qids, scores):
                quesid2ans[qid] = (answers[qid], float(s))
        evaluator = RGQAEvaluator(
            encoded.dataset.qid2label, tau=self.verifier.cfg.ood.tau
        )
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results
