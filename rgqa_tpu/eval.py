"""Inference / rejection-scoring surface of the GQA runner.

Split out of ``runner.py`` so the training driver and the evaluation
stack grow independently (the reference spread this over ~18 per-strategy
driver files: ``gqa_conf.py:245-353``, ``gqa_ensemble.py``,
``gqa_fasterrcnn.py``, ``gqa_clip.py``, ``gqa_lxrcap.py``,
``gqa_maha.py``, ``gqa_separate.py``, ``gqa_vis_att.py`` ...).

``ScoringMixin`` expects the host class to provide ``cfg``, ``params``,
``mesh``, ``forward``, ``eval_step``, ``model_cfg``, ``label2ans``,
``features``, ``train_set``, ``output``, ``predict``-compatible
``_encode`` and ``load`` — i.e. :class:`rgqa_tpu.runner.GQARunner`.

Every eval loop here is pipelined both ways (``_map_eval``): inputs
prefetched ahead of the dispatch front, outputs fetched lag-N behind it,
so host transfers overlap device compute (measured in docs/kernels.md
"Production scoring pipeline").
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.data import EncodedGQA, batch_iterator, device_prefetch
from rgqa_tpu.data.batching import chunked_map, wrap_dequant
from rgqa_tpu.metrics import ClosedSetEvaluator, RGQAEvaluator, dump_predictions
from rgqa_tpu.scorers import calibrate_tau, fit_estimator, make_scorer

__all__ = ["ScoringMixin"]


class ScoringMixin:
    """Prediction, OOD scoring, and calibrated-threshold evaluation."""

    # ------------------------------------------------------------------
    # Pipelined eval plumbing
    # ------------------------------------------------------------------

    def _cached_step(self, key, build):
        """Per-runner cache of step-fn objects.

        ``chunked_map``'s scan-wrapper compile cache is keyed by step-fn
        *identity*, so a method that rebuilds its step fn per call would
        recompile the chunked wrapper on every call — 3-10 min over the
        tunnel, paid at each per-epoch validation.  Every eval surface
        therefore fetches its step fn here, building it at most once per
        runner."""
        cache = self.__dict__.setdefault("_step_fn_cache", {})
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = build()
        return fn

    def _iter_eval(
        self,
        encoded: EncodedGQA,
        *,
        with_target: bool = False,
        feed_bf16: Optional[bool] = None,
        feed_int8: bool = False,
    ):
        bs = self.cfg.train.batch_size
        if feed_bf16 is None:
            feed_bf16 = self.cfg.train.use_bf16
        return device_prefetch(
            batch_iterator(
                encoded, bs, shuffle=False, with_target=with_target
            ),
            self.mesh,
            # bf16 models consume feats/pixels as bf16 — casting on host
            # halves the dominant host->device bytes (docs/kernels.md).
            # Grad-at-eval scorers (needs_f32_inputs) opt out: their
            # ~1e-4 sign-gradient perturbations need off-lattice f32.
            feed_bf16=feed_bf16,
            # --feed_int8 quarters the feats bytes for wire-bound links
            # (dequantized in-jit by the wrapped step fn).
            feed_int8=feed_int8,
        )

    def _map_eval(
        self,
        encoded: EncodedGQA,
        step_fn,
        *,
        select: Optional[tuple] = None,
        with_target: bool = False,
        params=None,
    ):
        """Run ``step_fn(params, batch)`` over a split, pipelined both
        ways: inputs prefetched ahead of the dispatch front
        (`device_prefetch`), outputs fetched ``lag`` dispatches behind it
        so host transfers overlap device compute; ``--eval_chunk K`` > 1
        additionally groups K batches per device dispatch (`chunked_map`)
        for remote/tunneled chips where each dispatch is a round trip.

        ``params`` defaults to ``self.params`` and is threaded through as
        an explicit argument (NOT a closure) so the chunked dispatch can
        jit over it — a closed-over param pytree would be embedded in the
        compile payload as constants.  ``step_fn``'s object identity is
        the compile cache key: it passes through to ``chunked_map``
        unwrapped, except under ``--feed_int8`` where it is wrapped by
        ``wrap_dequant`` — which memoizes per step fn, so a stable step
        fn (e.g. one scorer reused across serving waves) still compiles
        once per process either way.  Yields ``(qids, numpy outputs,
        real)``."""
        params = self.params if params is None else params
        feed_bf16 = None
        f32_inputs = getattr(step_fn, "needs_f32_inputs", False)
        if f32_inputs:
            feed_bf16 = False
        # --feed_int8 (wire-bound links): ship feats as int8 + scales,
        # dequantize inside the step's jit.  Grad-at-eval scorers are
        # exempt — int8 is a far coarser lattice than the bf16 they
        # already refuse.  Training is exempt too (``_feed_exact``): the
        # per-epoch validation picks the BEST checkpoint, and a quantized
        # feed could flip near-tied epochs.  wrap_dequant caches by
        # step_fn identity, so the chunked-dispatch compile cache keeps
        # working.
        feed_int8 = bool(
            getattr(self.cfg.data, "feed_int8", False)
            and not f32_inputs
            and not getattr(self, "_feed_exact", False)
        )
        if feed_int8:
            step_fn = wrap_dequant(step_fn)
        return chunked_map(
            step_fn,
            self._iter_eval(
                encoded, with_target=with_target, feed_bf16=feed_bf16,
                feed_int8=feed_int8,
            ),
            chunk=getattr(self.cfg.train, "eval_chunk", 1),
            captures=params,
            select=select,
        )

    # ------------------------------------------------------------------
    # Closed-set prediction (gqa_conf.py:245-260)
    # ------------------------------------------------------------------

    def predict(self, encoded: EncodedGQA, dump: Optional[str] = None) -> dict:
        """Closed-set predictions {qid: answer} (``gqa_conf.py:245-260``)."""
        quesid2ans = {}
        # self.eval_step already has the (params, batch) signature — pass
        # it directly so its identity keys the chunked-dispatch compile
        # cache (a per-call lambda would recompile every call).
        for qids, out, real in self._map_eval(
            encoded, self.eval_step, select=("label",),
        ):
            for qid, l in zip(qids, out["label"][:real]):
                quesid2ans[qid] = self.label2ans[int(l)]
        if dump:
            ClosedSetEvaluator(encoded.dataset.qid2label).dump_result(
                quesid2ans, dump
            )
        return quesid2ans

    def evaluate(self, encoded: EncodedGQA) -> float:
        """Soft accuracy on a labeled split."""
        evaluator = ClosedSetEvaluator(encoded.dataset.qid2label)
        return evaluator.evaluate(self.predict(encoded))

    def topk_predict(
        self, encoded: EncodedGQA, k: int = 4, dump: Optional[str] = None
    ) -> float:
        """Top-k oracle accuracy: count the gold answer as correct when it
        appears in the top-k proposals (``gqa.py:196-217``)."""

        def build():
            @jax.jit
            def topk_step(params, batch):
                out = self.forward(params, batch, deterministic=True)
                return jax.lax.top_k(out["logits"].astype(jnp.float32), k)[1]

            return topk_step

        quesid2ans = {}
        for qids, idx, real in self._map_eval(
            encoded, self._cached_step(("topk", k), build)
        ):
            for qid, proposals in zip(qids, idx[:real]):
                label = encoded.dataset.id2datum[qid].get("label") or {}
                gold = next(iter(label), None)
                names = [self.label2ans[int(p)] for p in proposals]
                quesid2ans[qid] = gold if gold in names else names[0]
        evaluator = ClosedSetEvaluator(encoded.dataset.qid2label)
        if dump:
            evaluator.dump_result(quesid2ans, dump)
        return evaluator.evaluate(quesid2ans)

    @staticmethod
    def oracle_score(encoded: EncodedGQA) -> float:
        """Upper-bound accuracy from the targets alone (``gqa.py:244-253``)."""
        evaluator = ClosedSetEvaluator(encoded.dataset.qid2label)
        quesid2ans = {}
        for qid in encoded.question_ids:
            label = encoded.dataset.id2datum[qid].get("label") or {}
            best = max(label, key=label.get) if label else ""
            quesid2ans[qid] = best
        return evaluator.evaluate(quesid2ans)

    def dump_attention(
        self, encoded: EncodedGQA, out_dir: str, limit: Optional[int] = None
    ) -> int:
        """Dump cross-modal attention maps per question
        (reference ``gqa_vis_att.py:263-299`` via the ``lxrt_vis`` fork;
        here ``output_probs=True`` on the shared encoder).

        Writes ``<out_dir>/<qid>.npz`` with ``lang2visn_{i}`` /
        ``visn2lang_{i}`` arrays per cross-modal layer; returns the count.
        """
        os.makedirs(out_dir, exist_ok=True)

        def build():
            @jax.jit
            def viz_step(params, batch):
                out = self.forward(
                    params, batch, deterministic=True, output_probs=True
                )
                return out["x_attention_probs"]

            return viz_step

        written = 0
        for qids, probs, real in self._map_eval(
            encoded, self._cached_step("viz", build)
        ):
            for row, qid in enumerate(qids[:real]):
                arrays = {}
                for i, (l2v, v2l) in enumerate(probs):
                    arrays[f"lang2visn_{i}"] = l2v[row]
                    arrays[f"visn2lang_{i}"] = v2l[row]
                np.savez(os.path.join(out_dir, f"{qid}.npz"), **arrays)
                written += 1
                if limit and written >= limit:
                    return written
        return written

    # ------------------------------------------------------------------
    # Rejection scoring (gqa_conf.py:297-333 and siblings)
    # ------------------------------------------------------------------

    def make_scorer(self, name: Optional[str] = None):
        ocfg = self.cfg.ood
        name = name or ocfg.scorer or "msp"

        def build():
            opts = dict(
                temperature=ocfg.temperature,
                noise=ocfg.noise,
                topk=2,
                seed_list=ocfg.seed_list or (0, 1, 2, 3, 4),
                mix=ocfg.mix_branched_score,
            )
            if name == "maha":
                opts["estimator"] = self.fit_maha_estimator()
            return make_scorer(name, self.forward, **opts)

        # Cached per resolved name: the scorer's identity keys the
        # chunked-dispatch compile cache, and cfg.ood is fixed per runner.
        return self._cached_step(("scorer", name), build)

    def score_split(
        self, encoded: EncodedGQA, scorer=None, params=None
    ) -> dict[str, tuple[str, float]]:
        """{qid: (answer, confidence)} over a split with any scorer.

        Model params thread through as chunked_map ``captures``; scorer
        closures (the Mahalanobis estimator's ~8 MB at 1842 answers is
        the largest) ride along as compile-payload constants — fine at
        this scale, but a future scorer closing over tens of MB should
        grow an explicit captures slot (see ``chunked_map``)."""
        scorer = scorer or self.make_scorer()
        params = params if params is not None else self.params
        quesid2ans = {}
        for qids, out, real in self._map_eval(
            encoded, scorer, select=("label", "score"), params=params
        ):
            labels = out["label"][:real]
            scores = out["score"][:real]
            for qid, l, s in zip(qids, labels, scores):
                quesid2ans[qid] = (self.label2ans[int(l)], float(s))
        return quesid2ans

    def ood_evaluate(
        self, encoded: EncodedGQA, dump: Optional[str] = None, scorer=None
    ) -> dict:
        """Rejection evaluation with the configured scorer
        (``gqa_conf.py:297-333``)."""
        quesid2ans = self.score_split(encoded, scorer=scorer)
        evaluator = RGQAEvaluator(encoded.dataset.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def gated_ood_evaluate(
        self,
        encoded: EncodedGQA,
        answerer,
        dump: Optional[str] = None,
    ) -> dict:
        """Separate-detector evaluation (``gqa_separate.py:200-234``):
        this runner's model scores answerability (sigmoid of its single
        logit); ``answerer`` (a GQARunner with a frozen GQA model) supplies
        the answers."""
        det = self.make_scorer("msp")  # max sigmoid of the 1-logit head
        quesid2ans = {}
        ans_encoded = answerer._encode(encoded.dataset)
        answers = answerer.predict(ans_encoded)
        for qids, out, real in self._map_eval(
            encoded, det, select=("score",)
        ):
            for qid, s in zip(qids, out["score"][:real]):
                quesid2ans[qid] = (answers[qid], float(s))
        evaluator = RGQAEvaluator(encoded.dataset.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def ensemble_ood_evaluate(
        self, encoded: EncodedGQA, ckpt_paths: list[str],
        dump: Optional[str] = None,
    ) -> dict:
        """Mean/product ensemble over checkpoints (``gqa_ensemble.py``)."""
        from rgqa_tpu.scorers import ensemble_merge, make_msp_scorer

        msp = make_msp_scorer(self.forward)
        all_qids: list[str] = []
        prob_sets = []
        for path in ckpt_paths:
            self.load(path)
            probs_per_batch = []
            qids_seen = []
            for qids, out, real in self._map_eval(
                encoded, msp, select=("probs",)
            ):
                probs_per_batch.append(out["probs"][:real])
                qids_seen.extend(qids[:real])
            prob_sets.append(np.concatenate(probs_per_batch, 0))
            all_qids = qids_seen
        merged = ensemble_merge(
            [jnp.asarray(p) for p in prob_sets], self.cfg.ood.ensemble_method
        )
        labels = np.asarray(merged["label"])
        scores = np.asarray(merged["score"])
        quesid2ans = {
            qid: (self.label2ans[int(l)], float(s))
            for qid, l, s in zip(all_qids, labels, scores)
        }
        evaluator = RGQAEvaluator(encoded.dataset.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def coverage_ood_evaluate(
        self,
        encoded: EncodedGQA,
        objects_vocab_path: str,
        dump: Optional[str] = None,
    ) -> dict:
        """FRCNN object-coverage rejection (``gqa_fasterrcnn.py:105-133``):
        answers from this model's MSP argmax; confidence = 1 iff every
        question noun stem matches a detected object name."""
        from rgqa_tpu.scorers import coverage_scores, load_object_vocab

        vocab = load_object_vocab(objects_vocab_path)
        answers = self.predict(encoded)
        ds = encoded.dataset
        qids = list(encoded.question_ids)
        sents = [ds.id2datum[q]["sent"] for q in qids]
        rows = encoded.img_row
        objects = [np.asarray(self.features.objects_id[r]) for r in rows]
        scores = coverage_scores(sents, objects, vocab)
        quesid2ans = {
            qid: (answers[qid], float(s)) for qid, s in zip(qids, scores)
        }
        evaluator = RGQAEvaluator(ds.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def clip_ood_evaluate(
        self,
        encoded: EncodedGQA,
        similarity,
        image_root: str,
        dump: Optional[str] = None,
        batch_size: int = 32,
    ) -> dict:
        """CLIP-score rejection (``gqa_clip.py:76-110``): answers from this
        finetuned model's argmax, confidence = image-question cosine
        similarity from ``similarity(images, texts) -> scores`` (a
        ``scorers.clip.ClipScorer`` or any injected callable) over the raw
        JPEGs under ``image_root``.

        When the scorer exposes its ``image_size`` (the jax ClipScorer
        does) and a matching CLIP :class:`PixelPack` exists beside the
        image root (``prepare_data --pack_pixels --pixel_transform
        clip``), the pre-decoded uint8 rows feed the scorer directly —
        skipping the per-image JPEG decode that otherwise caps this loop
        at ~122 img/s on a one-core host (docs/kernels.md "Image
        production scoring")."""
        from PIL import Image

        from rgqa_tpu.data.images import GQAImageSource, PixelPack

        source = GQAImageSource(image_root)
        pack = None
        # ``similarity`` is usually the bound ``ClipScorer.scores`` —
        # the scorer behind it must EXPLICITLY declare it consumes raw
        # uint8 rows (``consumes_uint8_rows``); injected callables that
        # expect PIL images keep the decode path.  The pack must also
        # have been built from this exact image root — a stale/foreign
        # pack silently substituting different bytes is worse than the
        # decode cost it saves.
        owner = getattr(similarity, "__self__", similarity)
        scorer_size = getattr(owner, "image_size", None)
        if scorer_size and getattr(owner, "consumes_uint8_rows", False):
            pack_dir = os.path.join(
                os.path.dirname(os.path.abspath(image_root)),
                f"pixels_clip_{scorer_size}",
            )
            if os.path.isfile(os.path.join(pack_dir, "meta.json")):
                cand = PixelPack(pack_dir)
                if (
                    cand.transform == "clip"
                    and cand.size == scorer_size
                    and cand.matches_source(image_root)
                ):
                    pack = cand

        answers = self.predict(encoded)
        ds = encoded.dataset
        qids = list(encoded.question_ids)
        quesid2ans = {}
        for s in range(0, len(qids), batch_size):
            chunk = qids[s : s + batch_size]
            sents = [ds.id2datum[q]["sent"] for q in chunk]
            imgs = []
            for q in chunk:
                img_id = ds.id2datum[q]["img_id"]
                if pack is not None and img_id in pack:
                    imgs.append(pack.load_u8(img_id)[0])
                else:
                    with Image.open(source.path(img_id)) as im:
                        imgs.append(im.convert("RGB"))
            scores = similarity(imgs, sents)
            for qid, sc in zip(chunk, scores):
                quesid2ans[qid] = (answers[qid], float(sc))
        evaluator = RGQAEvaluator(ds.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def match_ood_evaluate(
        self,
        encoded: EncodedGQA,
        pretrain_params,
        dump: Optional[str] = None,
    ) -> dict:
        """LXMERT cross-modal match rejection (``gqa_lxrcap.py:98-120``):
        answers from this finetuned model, confidence from the pretraining
        matched head's softmax[:, 1]."""
        from rgqa_tpu.models.lxmert import LxmertPretraining

        def build():
            pre_model = LxmertPretraining(
                self.model_cfg.encoder, dtype=jnp.float32
            )

            @jax.jit
            def match_step(params, batch):
                return pre_model.apply(
                    {"params": params},
                    batch["input_ids"], batch["input_mask"],
                    batch["segment_ids"], batch["feats"], batch["boxes"],
                    method=LxmertPretraining.match_score,
                )

            return match_step

        answers = self.predict(encoded)
        quesid2ans = {}
        for qids, scores, real in self._map_eval(
            encoded, self._cached_step("match", build), params=pretrain_params
        ):
            for qid, s in zip(qids, scores[:real]):
                quesid2ans[qid] = (answers[qid], float(s))
        evaluator = RGQAEvaluator(encoded.dataset.qid2label, tau=self.cfg.ood.tau)
        results = evaluator.evaluate_quesid2ans(quesid2ans)
        if dump:
            dump_predictions(quesid2ans, dump)
        return results

    def fit_maha_estimator(self):
        """Per-class means + shared precision over the train set
        (``gqa_maha.py:120-189``), cached like the reference."""
        cache = os.path.join(self.output, "sample_estimates.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                data = pickle.load(f)
            from rgqa_tpu.scorers import MahaEstimator

            return MahaEstimator(
                jnp.asarray(data["mean"]), jnp.asarray(data["precision"])
            )
        assert self.train_set is not None, "maha needs the train split"

        def build():
            def pooled_step(p, batch):
                out = self.eval_step(p, batch)
                return {"pooled": out["pooled"], "target": batch["target"]}

            # The maha scorer feeds exact f32 (needs_f32_inputs); the
            # statistics it consumes must be fitted on the SAME feed, and
            # the fitted estimator is pickled and reused by later runs —
            # a bf16/int8-feed fit would poison every one of them.
            pooled_step.needs_f32_inputs = True
            return pooled_step

        def batches():
            for _, out, real in self._map_eval(
                self.train_set, self._cached_step("maha_pooled", build),
                with_target=True,
            ):
                yield out["pooled"][:real], out["target"][:real]

        est = fit_estimator(
            batches(),
            num_classes=self.model_cfg.num_answers,
            feat_dim=self.model_cfg.encoder.hidden_size
            if self.model_cfg.backbone != "butd"
            else self.model_cfg.butd_hidden_dim,
        )
        with open(cache, "wb") as f:
            pickle.dump(
                {
                    "mean": np.asarray(est.class_mean),
                    "precision": np.asarray(est.precision),
                },
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        return est

    def get_pseudo_labels(
        self, encoded: EncodedGQA, dump: Optional[str] = None
    ) -> list[dict]:
        """Teacher-label a split: each row's label becomes the model's
        max-sigmoid answer with its confidence (``gqa_conf.py:335-353``)."""
        quesid2ans = self.score_split(encoded)
        rows = []
        for qid in encoded.question_ids:
            datum = dict(encoded.dataset.id2datum[qid])
            ans, score = quesid2ans[qid]
            datum["label"] = {ans: float(score)}
            rows.append(datum)
        if dump:
            with open(dump, "w") as f:
                json.dump(rows, f)
            print(f"{len(rows)} pseudo data have been saved in {dump}.")
        return rows

    def predict_with_thresh(
        self, encoded: EncodedGQA, dump: Optional[str] = None
    ) -> dict:
        """Calibrate tau at --target_acc on a labeled split, then threshold
        (``gqa_conf.py:262-295``)."""
        assert self.cfg.ood.target_acc is not None
        quesid2ans = self.score_split(encoded)
        targets, preds, scores = [], [], []
        for qid, (ans, s) in quesid2ans.items():
            label = encoded.dataset.id2datum[qid].get("label") or {}
            targets.append(next(iter(label), "UQ"))
            preds.append(ans)
            scores.append(s)
        tau = calibrate_tau(targets, preds, scores, self.cfg.ood.target_acc)
        out = {
            qid: (("UQ", s) if s < tau else (ans, s))
            for qid, (ans, s) in quesid2ans.items()
        }
        if dump:
            # 4dp confidences, matching dump_predictions' contract (also
            # keeps the dump mesh-shape invariant: raw f32 scores carry
            # ~1-ulp program-dependent drift, tests/test_parallel_fullshape
            # TestMeshInvariantScoring).
            with open(dump, "w") as f:
                json.dump(
                    {
                        q: [ans, round(float(s), 4)]
                        for q, (ans, s) in out.items()
                    },
                    f,
                )
        return {"tau": tau, "quesid2ans": out}
