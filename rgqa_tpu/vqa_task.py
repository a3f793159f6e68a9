"""VQA v2 task: finetune / predict / evaluate on MSCOCO features.

Rebuild of the reference VQA pipeline (``src/tasks/vqa.py:1-214``,
``vqa_data.py:16-188``, ``vqa_model.py:1-49``):

- rows are ``{answer_type, img_id, label: {ans: score}, question_id: int,
  question_type, sent}`` with 10-annotator soft scores — the data contract
  is GQA's, so :class:`rgqa_tpu.data.GQADataset` / ``EncodedGQA`` are
  reused directly (no UQ class: VQA has no rejection vocabulary);
- the model is the LXMERT backbone + 2-layer answer head
  (``vqa_model.py:15-33`` — identical head to GQA's);
- training is BCE-with-logits x num_answers, grad-clip 5.0, BertAdam with
  warmup 0.1 (``vqa.py:63-78, 94-113``), logging per-epoch train/valid
  soft scores and saving BEST/LAST;
- :class:`VQAEvaluator` scores ``sum(label.get(ans))/N`` and dumps the
  VQA-challenge submission JSON ``[{"question_id": int, "answer": str}]``
  with ``indent=4, sort_keys=True`` (``vqa_data.py:154-188``);
- ``minival``-only validation convention (``vqa.py:188-200``) is the
  caller's split choice; ``--loadLXMERTQA`` transplants answer-head rows
  by answer string (``vqa.py:49-51``).

The reference's ``vqa_ood.py`` is an **empty file** (0 bytes); the RVQA
rejection machinery for VQA-format data is covered by pointing
``GQARunner`` at a VQA-format root with UQ rows.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.checkpoint import load_checkpoint, save_checkpoint, wait_for_saves
from rgqa_tpu.config import RunConfig
from rgqa_tpu.data import PackedFeatures, WordPieceTokenizer
from rgqa_tpu.data.batching import (
    batch_iterator,
    chunked_map,
    device_prefetch,
    wrap_dequant,
)
from rgqa_tpu.data.dataset import EncodedGQA, GQADataset, build_targets
from rgqa_tpu.data.tokenizer import load_vocab
from rgqa_tpu.models.zoo import build_model, example_batch
from rgqa_tpu.parallel import make_mesh, shard_params
from rgqa_tpu.train import (
    create_train_state,
    make_chunked_train_step,
    make_optimizer,
)
from rgqa_tpu.train.losses import optax_sigmoid_bce
from rgqa_tpu.train.step import global_norm_clip

__all__ = ["VQAEvaluator", "VQARunner"]


class VQAEvaluator:
    """Soft-score accuracy + submission dump (``vqa_data.py:154-188``)."""

    def __init__(self, dataset: GQADataset):
        self.dataset = dataset

    def evaluate(self, quesid2ans: dict) -> float:
        score = 0.0
        for quesid, ans in quesid2ans.items():
            datum = self.dataset.id2datum[quesid]
            label = datum.get("label", {})
            if ans in label:
                score += label[ans]
        return score / len(quesid2ans) if quesid2ans else 0.0

    def dump_result(self, quesid2ans: dict, path: str) -> None:
        """VQA online-evaluation submission format — exact reference
        serialization (``vqa_data.py:166-188``)."""
        with open(path, "w") as f:
            result = [
                {"question_id": ques_id, "answer": ans}
                for ques_id, ans in quesid2ans.items()
            ]
            json.dump(result, f, indent=4, sort_keys=True)


class VQARunner:
    """Train/predict/evaluate driver for VQA (reference ``vqa.py:33-214``)."""

    def __init__(self, cfg: RunConfig, *, init_train: bool = True):
        self.cfg = cfg
        data = cfg.data
        root = data.data_root

        if data.synthetic and not os.path.exists(
            os.path.join(root, "trainval_ans2label.json")
        ):
            from rgqa_tpu.data.synthetic import make_synthetic_vqa

            make_synthetic_vqa(root)

        self.features = PackedFeatures(os.path.join(root, "features"))
        if data.tiny:
            self.features = self.features.truncate(512)
        elif data.fast:
            self.features = self.features.truncate(5000)
        self.tokenizer = WordPieceTokenizer(
            load_vocab(os.path.join(root, "vocab.txt"))
        )

        splits = data.train_splits if init_train else (
            data.test_splits or data.valid_splits
        )
        # No UQ append: VQA's vocabulary is closed (vqa_data.py:61-64).
        self.dataset = GQADataset(root, splits, add_uq=False)
        self.label2ans = self.dataset.label2ans

        import dataclasses

        self.model_cfg = dataclasses.replace(
            cfg.model, num_answers=self.dataset.num_answers
        )
        self.model, self.forward = build_model(
            self.model_cfg, use_bf16=cfg.train.use_bf16
        )
        self.mesh = make_mesh(model=cfg.mesh.model_axis)
        self.params = self._init_params()
        self._load_initial_weights()

        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)
        from rgqa_tpu.config import dump_run_config

        # Reproducibility snapshot (reference copies src/ into each
        # output dir, run/gqa_conf_finetune.bash:6-8).
        dump_run_config(cfg, self.output)
        self._encoded: dict[str, EncodedGQA] = {}

    # ------------------------------------------------------------------

    def _init_params(self):
        batch = example_batch(self.model_cfg, batch_size=2, seed=0)
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        params = self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed),
            b["input_ids"], b["input_mask"], b["segment_ids"],
            b["feats"], b["boxes"],
        )["params"]
        return shard_params(self.mesh, params)

    def _load_initial_weights(self):
        """``--load`` / ``--loadLXMERT`` / ``--loadLXMERTQA`` init
        (``vqa.py:45-51``) — identical semantics to the GQA runner, whose
        loader covers the VQAModel layout (same encoder + head keys)."""
        cfg = self.cfg
        enc = self.model_cfg.encoder
        if cfg.load:
            self.load(cfg.load)
            return
        if cfg.load_lxmert_qa or cfg.load_lxmert:
            from rgqa_tpu.checkpoint.torch_import import import_lxmert_gqa
            from rgqa_tpu.runner import np_params

            if cfg.load_lxmert_qa:
                from rgqa_tpu.checkpoint import load_lxmert_qa
                from rgqa_tpu.pretrain.answer_table import AnswerTable

                path = cfg.load_lxmert_qa
                if not path.endswith(".pth") and os.path.exists(
                    path + "_LXRT.pth"
                ):
                    path = path + "_LXRT.pth"
                cand = os.path.join(cfg.data.data_root, "all_ans.json")
                if os.path.exists(cand):
                    table = AnswerTable(path=cand)
                    self.params, loaded, zeroed = load_lxmert_qa(
                        np_params(self.params), path, self.label2ans,
                        src_ans2id=table.ans2id_map(),
                        convert_ans=table.convert_ans,
                        l_layers=enc.l_layers, x_layers=enc.x_layers,
                        r_layers=enc.r_layers,
                    )
                    print(
                        f"Loaded {loaded} answers from LXRTQA pre-training "
                        f"and {zeroed} not"
                    )
                else:
                    self.params, _, _ = import_lxmert_gqa(
                        np_params(self.params), path,
                        l_layers=enc.l_layers, x_layers=enc.x_layers,
                        r_layers=enc.r_layers, from_pretrain=True,
                    )
            else:
                self.params, _, _ = import_lxmert_gqa(
                    np_params(self.params), cfg.load_lxmert,
                    l_layers=enc.l_layers, x_layers=enc.x_layers,
                    r_layers=enc.r_layers, from_pretrain=True,
                )
            self.params = shard_params(self.mesh, self.params)

    def encoded(self, split: str) -> EncodedGQA:
        if split not in self._encoded:
            ds = GQADataset(
                self.cfg.data.data_root, split, add_uq=False,
                vocab_dir=self.cfg.data.data_root,
            )
            self._encoded[split] = EncodedGQA(
                ds, self.features,
                tokenizer=self.tokenizer,
                max_text_len=self.cfg.model.max_text_len,
                backbone=self.model_cfg.backbone,
                keep_uq_target=True,  # no UQ column to slice off
            )
        return self._encoded[split]

    def evaluator(self, split: str) -> VQAEvaluator:
        return VQAEvaluator(self.encoded(split).dataset)

    def _batches(self, encoded, batch_size, *, shuffle=False, rng=None,
                 drop_last=False, with_target=True, feed_bf16=False,
                 feed_int8=False):
        """Shared double-buffered feed (``data/batching.py``): host batch
        build + device_put run ``depth`` ahead of the dispatch front."""
        return device_prefetch(
            batch_iterator(
                encoded, batch_size, shuffle=shuffle, rng=rng,
                drop_last=drop_last, with_target=with_target,
            ),
            self.mesh,
            feed_bf16=feed_bf16,
            feed_int8=feed_int8,
        )

    # ------------------------------------------------------------------

    def train(self, train_split: Optional[str] = None,
              valid_split: Optional[str] = None) -> dict:
        tcfg = self.cfg.train
        train_split = train_split or self.cfg.data.train_splits
        valid_split = valid_split or self.cfg.data.valid_splits
        train_set = self.encoded(train_split)
        evaluator = self.evaluator(train_split)
        n_batches = max(len(train_set) // tcfg.batch_size, 1)
        tx = make_optimizer(tcfg.optim, n_batches * tcfg.epochs)
        state = create_train_state(self.params, tx)
        num_answers = self.model_cfg.num_answers

        def loss_fn(params, batch, rng):
            out = self.forward(
                params, batch, deterministic=False, rng=rng
            )
            logits = out["logits"].astype(jnp.float32)
            # BCEWithLogitsLoss (mean) * num classes (vqa.py:101-103).
            loss = jnp.mean(
                optax_sigmoid_bce(logits, batch["target"])
            ) * num_answers
            return loss, jnp.argmax(logits, axis=-1)

        @jax.jit
        def step(state, batch, rng):
            (loss, labels), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, rng)
            grads = global_norm_clip(grads, tcfg.optim.grad_clip)
            return state.apply_gradients(grads), {
                "loss": loss, "label": labels,
            }

        # --train_chunk K: K optimizer steps per device dispatch (see
        # runner.train / docs/kernels.md "Dispatch anatomy").
        chunk = max(1, int(getattr(tcfg, "train_chunk", 1)))
        chunk_run = make_chunked_train_step(step) if chunk > 1 else None

        key = jax.random.PRNGKey(tcfg.seed)
        rng = np.random.default_rng(tcfg.seed)
        best_valid = 0.0
        history = {"loss": [], "train": [], "valid": []}
        import collections

        for epoch in range(tcfg.epochs):
            loss = float("nan")
            quesid2ans: dict = {}
            # Train-accuracy labels are fetched a few steps behind the
            # dispatch front so the host transfer overlaps device compute
            # (the output analogue of the device_prefetch input feed).
            pending: collections.deque = collections.deque()

            def drain(item):
                qids0, labels0, real0 = item
                for qid, l in zip(qids0, np.asarray(labels0)[:real0]):
                    quesid2ans[qid] = self.label2ans[int(l)]

            group: list = []  # (qids, batch, real) per chunk member
            for qids, batch, real in self._batches(
                train_set, tcfg.batch_size, shuffle=True, rng=rng,
                drop_last=True,
            ):
                if chunk > 1:
                    # Per-step key splits run inside the chunked jit —
                    # bitwise the per-step loop's sequence (pinned in
                    # tests/test_vqa.py).
                    group.append((qids, batch, real))
                    if len(group) < chunk:
                        continue
                    state, key, auxs = chunk_run(
                        state, tuple(b for _, b, _ in group), key
                    )
                    loss = auxs["loss"][-1]
                    for gi, (gqids, _, greal) in enumerate(group):
                        pending.append((gqids, auxs["label"][gi], greal))
                    group = []
                else:
                    key, sub = jax.random.split(key)
                    state, aux = step(state, batch, sub)
                    loss = aux["loss"]
                    pending.append((qids, aux["label"], real))
                while len(pending) > 4:
                    drain(pending.popleft())
            # Partial final group: per-step (a padded TRAIN group would
            # apply spurious updates).
            for gqids, batch, greal in group:
                key, sub = jax.random.split(key)
                state, aux = step(state, batch, sub)
                loss = aux["loss"]
                pending.append((gqids, aux["label"], greal))
            while pending:
                drain(pending.popleft())
            self.params = state.params
            train_score = evaluator.evaluate(quesid2ans)
            history["loss"].append(float(loss))
            history["train"].append(train_score)
            log_str = f"\nEpoch {epoch}: Train {train_score * 100.0:0.2f}\n"
            if valid_split:
                # Validation always feeds exact (see GQARunner
                # ._validate_exact): --feed_int8 is eval-only transport.
                self._feed_exact = True
                try:
                    valid_score = self.evaluate(valid_split)
                finally:
                    self._feed_exact = False
                history["valid"].append(valid_score)
                if valid_score > best_valid:
                    best_valid = valid_score
                    save_checkpoint(
                        self.output, "BEST", state, async_save=True
                    )
                log_str += (
                    f"Epoch {epoch}: Valid {valid_score * 100.0:0.2f}\n"
                    f"Epoch {epoch}: Best {best_valid * 100.0:0.2f}\n"
                )
            print(log_str, end="")
            with open(os.path.join(self.output, "log.log"), "a") as f:
                f.write(log_str)
        save_checkpoint(self.output, "LAST", state)
        wait_for_saves()
        return history

    def predict(self, split: str, dump: Optional[str] = None) -> dict:
        encoded = self.encoded(split)

        # Built once per runner: chunked_map's compile cache is keyed by
        # the step-fn object, so a per-call @jax.jit would recompile the
        # chunked scan wrapper at every predict (each per-epoch valid).
        infer = self.__dict__.get("_infer_step")
        if infer is None:

            @jax.jit
            def infer(params, batch):
                out = self.forward(params, batch, deterministic=True)
                return jnp.argmax(out["logits"].astype(jnp.float32), axis=-1)

            self._infer_step = infer

        quesid2ans: dict = {}
        bs = min(len(encoded), self.cfg.train.batch_size)
        # --feed_int8 applies here exactly as on the GQA eval surface
        # (eval.ScoringMixin._map_eval): int8 feats transport, in-jit
        # dequant via the identity-memoized wrap_dequant.  Training's
        # per-epoch validation is exempt (_feed_exact) — BEST selection
        # must not depend on the transport quantization.
        feed_int8 = bool(
            getattr(self.cfg.data, "feed_int8", False)
            and not getattr(self, "_feed_exact", False)
        )
        step_fn = wrap_dequant(infer) if feed_int8 else infer
        # params as explicit captures (not a closure) so --eval_chunk's
        # grouped dispatch can jit over them; see eval.ScoringMixin.
        for qids, labels, real in chunked_map(
            step_fn,
            self._batches(
                encoded, bs, with_target=False,
                feed_bf16=self.cfg.train.use_bf16,
                feed_int8=feed_int8,
            ),
            chunk=getattr(self.cfg.train, "eval_chunk", 1),
            captures=self.params,
        ):
            for qid, l in zip(qids, labels[:real]):
                quesid2ans[qid] = self.label2ans[int(l)]
        if dump is not None:
            self.evaluator(split).dump_result(quesid2ans, dump)
        return quesid2ans

    def evaluate(self, split: str, dump: Optional[str] = None) -> float:
        quesid2ans = self.predict(split, dump)
        return self.evaluator(split).evaluate(quesid2ans)

    def oracle_score(self, split: str) -> float:
        """Upper bound from the targets alone (``vqa.py:160-169``)."""
        encoded = self.encoded(split)
        quesid2ans = {}
        target = build_targets(
            encoded.label_idx, encoded.label_score, encoded.num_answers
        )
        best = np.argmax(target, axis=-1)
        for qid, l in zip(encoded.question_ids, best):
            quesid2ans[qid] = self.label2ans[int(l)]
        return self.evaluator(split).evaluate(quesid2ans)

    def save(self, name: str) -> str:
        return save_checkpoint(self.output, name, self.params)

    def load(self, path: str) -> None:
        """Orbax checkpoint dir or a reference VQAModel ``.pth``
        (same key layout as GQAModel — ``vqa_model.py:15-33``)."""
        if path.endswith(".pth") or os.path.isfile(path):
            from rgqa_tpu.checkpoint.torch_import import import_lxmert_gqa
            from rgqa_tpu.runner import np_params

            enc = self.model_cfg.encoder
            self.params, missing, unused = import_lxmert_gqa(
                np_params(self.params), path,
                l_layers=enc.l_layers, x_layers=enc.x_layers,
                r_layers=enc.r_layers,
            )
            if missing:
                print(f"Weights not found in ckpt: {missing[:5]}...")
            if unused:
                print(f"Ckpt weights unused: {unused[:5]}...")
        else:
            directory, name = os.path.split(path.rstrip("/"))
            restored = load_checkpoint(directory or ".", name)
            self.params = (
                restored["params"] if "params" in restored else restored
            )
        self.params = shard_params(self.mesh, self.params)
