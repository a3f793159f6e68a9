"""LXMERT pretraining trainer (reference ``src/pretrain/lxmert_pretrain.py``).

One jitted step does everything the reference does per batch on host:
matched-task sentence swap, word masking, RoI masking — then the 5-task
forward/loss and a BertAdam update.  Epoch loop keeps the reference's
BEST_EVAL_LOSS + per-epoch checkpoint convention (``:309-360``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.checkpoint import save_checkpoint, wait_for_saves
from rgqa_tpu.config import RunConfig
from rgqa_tpu.data import (
    EncodedGQA,
    GQADataset,
    PackedFeatures,
    WordPieceTokenizer,
    make_synthetic_gqa,
)
from rgqa_tpu.data.tokenizer import MASK, load_vocab
from rgqa_tpu.models.lxmert import LxmertPretraining
from rgqa_tpu.parallel import make_mesh, shard_params
from rgqa_tpu.pretrain.answer_table import AnswerTable
from rgqa_tpu.pretrain.losses import pretrain_loss
from rgqa_tpu.pretrain.masking import mask_objects, mask_words, matched_swap
from rgqa_tpu.train import create_train_state, make_optimizer
from rgqa_tpu.train.step import global_norm_clip

__all__ = ["make_pretrain_step", "PretrainRunner"]


def make_pretrain_step(
    model: LxmertPretraining,
    tx,
    *,
    tasks=("mask_lm", "matched", "obj", "attr", "feat", "qa"),
    word_mask_rate: float = 0.15,
    mask_id: int = 4,
    special_ids=(0, 1, 2, 3, 4),
    grad_clip: float = 5.0,
    donate: bool = True,
):
    """Jitted pretraining step over a dict batch with keys
    input_ids/input_mask/segment_ids/feats/boxes/obj_id/attr_id/ans."""
    vocab_size = model.cfg.vocab_size
    special = jnp.asarray(special_ids)

    def loss_fn(params, batch, rng, *, deterministic=False):
        r_m, r_w, r_o, r_d = jax.random.split(rng, 4)
        ids, mask, seg, ans = (
            batch["input_ids"], batch["input_mask"],
            batch["segment_ids"], batch["ans"],
        )
        matched = None
        if "matched" in tasks:
            ids, mask, seg, matched, ans = matched_swap(r_m, ids, mask, seg, ans)

        lm_labels = None
        if "mask_lm" in tasks:
            maskable = (mask > 0) & ~jnp.isin(ids, special)
            ids, lm_labels = mask_words(
                r_w, ids, maskable,
                mask_rate=word_mask_rate, vocab_size=vocab_size, mask_id=mask_id,
            )

        feats = batch["feats"]
        feat_mask = None
        visual = {"obj", "attr", "feat"} & set(tasks)
        if visual:
            pool = feats.reshape(-1, feats.shape[-1])
            masked_feats, feat_mask = mask_objects(r_o, feats, pool)
        else:
            masked_feats = feats

        out = model.apply(
            {"params": params},
            ids, mask, seg, masked_feats, batch["boxes"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": r_d},
        )
        total, parts = pretrain_loss(
            out,
            lm_labels=lm_labels,
            matched=matched,
            obj_labels=batch.get("obj_id"),
            attr_labels=batch.get("attr_id"),
            feat_target=feats.astype(jnp.float32),
            feat_mask=feat_mask,
            ans=ans,
            tasks=tasks,
        )
        return total, parts

    def step(state, batch, rng):
        grads, parts = jax.grad(loss_fn, has_aux=True)(state.params, batch, rng)
        if grad_clip:
            grads = global_norm_clip(grads, grad_clip)
        new_state = state.apply_gradients(grads)
        return new_state, parts

    def eval_loss(params, batch, rng):
        # Dropout off; the caller passes a FIXED rng so the masking noise
        # is identical across epochs and eval losses are comparable
        # (BEST_EVAL_LOSS selection, lxmert_pretrain.py:355-360).
        return loss_fn(params, batch, rng, deterministic=True)

    return (
        jax.jit(step, donate_argnums=(0,) if donate else ()),
        jax.jit(eval_loss),
    )


class PretrainRunner:
    """Multi-task pretraining over GQA-format splits.

    The reference pretrains on mscoco+vgnococo caption/QA data
    (``lxmert_data.py:18-23``); the data contract here is the same
    question-JSON + packed-features layout, so GQA (or synthetic) splits
    pretrain directly.
    """

    def __init__(self, cfg: RunConfig, tasks=("mask_lm", "matched", "obj", "attr", "feat", "qa")):
        self.cfg = cfg
        self.tasks = tasks
        root = cfg.data.data_root
        if cfg.data.synthetic and not os.path.exists(
            os.path.join(root, "trainval_ans2label.json")
        ):
            make_synthetic_gqa(root)
        self.features = PackedFeatures(os.path.join(root, "features"))
        vocab = load_vocab(os.path.join(root, "vocab.txt"))
        self.tokenizer = WordPieceTokenizer(vocab)
        self.mask_id = vocab[MASK]

        # Multi-source semantics (lxmert_data.py:40-57): comma-joined
        # splits concatenate per-source rows; the answer-id space comes
        # from an all_ans.json filtered by --qaSets when present (each
        # answer row carries the dsets it appears in), else from the GQA
        # vocab directly.
        ds = GQADataset(root, cfg.data.train_splits)
        all_ans_path = os.path.join(root, "all_ans.json")
        if os.path.exists(all_ans_path):
            qa_sets = cfg.data.qa_sets
            dsets = (
                set(s.lower().strip() for s in qa_sets.split(","))
                if qa_sets else None
            )  # lxmert_pretrain.py:27-29 normalization
            self.answer_table = AnswerTable(dsets, path=all_ans_path)
        else:
            self.answer_table = AnswerTable(answers=ds.label2ans)
        self.train_set = EncodedGQA(
            ds, self.features, tokenizer=self.tokenizer,
            max_text_len=cfg.model.max_text_len,
        )
        vds = GQADataset(root, cfg.data.valid_splits)
        self.valid_set = EncodedGQA(
            vds, self.features, tokenizer=self.tokenizer,
            max_text_len=cfg.model.max_text_len,
        )

        self.model = LxmertPretraining(
            cfg.model.encoder,
            num_answers=self.answer_table.num_answers,
            dtype=jnp.bfloat16 if cfg.train.use_bf16 else jnp.float32,
        )
        self.mesh = make_mesh(model=cfg.mesh.model_axis)
        # Weak keys + compute-on-miss: an id()-keyed dict would serve a
        # stale array if a dead dataset's id were recycled, and KeyError
        # on any split other than the two precomputed ones.
        import weakref

        self._ans_cache: "weakref.WeakKeyDictionary" = (
            weakref.WeakKeyDictionary()
        )
        self._ans_cache[self.train_set] = self._answer_ids(self.train_set)
        self._ans_cache[self.valid_set] = self._answer_ids(self.valid_set)
        b = self._host_batch(self.train_set, np.arange(2))
        params = self.model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.asarray(b["input_ids"]), jnp.asarray(b["input_mask"]),
            jnp.asarray(b["segment_ids"]), jnp.asarray(b["feats"]),
            jnp.asarray(b["boxes"]),
        )["params"]
        self.params = shard_params(self.mesh, params)
        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)

    def _answer_ids(self, encoded: EncodedGQA) -> np.ndarray:
        """Per-row pretraining answer ids, computed once at encode time
        (the reference redoes the ans -> id lookup per batch,
        ``lxmert_pretrain.py:239-247``)."""
        ans = np.full((len(encoded),), -1, np.int32)
        for i in range(len(encoded)):
            li = encoded.label_idx[i, 0]
            if li >= 0:
                s = encoded.dataset.label2ans[li]
                key = self.answer_table.convert_ans(s)
                if self.answer_table.used(key):
                    ans[i] = self.answer_table.ans2id(key)
        return ans

    def _host_batch(self, encoded: EncodedGQA, idx: np.ndarray) -> dict:
        batch = encoded.gather_batch(idx, with_target=False)
        rows = encoded.img_row[idx]
        batch["obj_id"] = np.asarray(self.features.objects_id[rows], np.int32)
        batch["attr_id"] = np.asarray(self.features.attrs_id[rows], np.int32)
        ans = self._ans_cache.get(encoded)
        if ans is None:
            ans = self._answer_ids(encoded)
            self._ans_cache[encoded] = ans
        batch["ans"] = ans[idx]
        return batch

    class _FeedView:
        """Adapter exposing the ``batch_iterator`` protocol
        (question_ids / __len__ / gather_batch) over a pretraining batch
        build, so the shared double-buffered feed applies unchanged."""

        def __init__(self, runner, encoded):
            self._runner = runner
            self._encoded = encoded
            self.question_ids = encoded.question_ids

        def __len__(self):
            return len(self._encoded)

        def gather_batch(self, idx, with_target=True):
            return self._runner._host_batch(self._encoded, idx)

    def _batches(self, encoded, batch_size, *, shuffle, rng=None):
        from rgqa_tpu.data.batching import batch_iterator, device_prefetch

        if encoded not in self._ans_cache:
            self._ans_cache[encoded] = self._answer_ids(encoded)
        it = batch_iterator(
            self._FeedView(self, encoded), batch_size,
            shuffle=shuffle, rng=rng, drop_last=True,
        )
        for _, batch, _ in device_prefetch(it, self.mesh):
            yield batch

    def train(self) -> dict:
        tcfg = self.cfg.train
        n_batches = len(self.train_set) // tcfg.batch_size
        tx = make_optimizer(tcfg.optim, max(n_batches * tcfg.epochs, 1))
        state = create_train_state(self.params, tx)
        # --train_chunk K: scan K optimizer steps per device dispatch,
        # exactly like the finetune loop (runner.py; measured 169.8 ->
        # 89.6 ms/step there by amortizing the tunnel round trip).  The
        # per-step key splits run INSIDE the chunk jit, so the key
        # sequence — and the trajectory — is bitwise the per-step loop's
        # (pinned in tests/test_pretrain.py).
        chunk = max(1, int(getattr(tcfg, "train_chunk", 1)))
        step, eval_loss = make_pretrain_step(
            self.model, tx, tasks=self.tasks, mask_id=self.mask_id,
            grad_clip=tcfg.optim.grad_clip, donate=chunk == 1,
        )
        chunk_run = None
        if chunk > 1:
            from rgqa_tpu.train import make_chunked_train_step

            chunk_run = make_chunked_train_step(step)

        key = jax.random.PRNGKey(tcfg.seed)
        rng = np.random.default_rng(tcfg.seed)
        best_eval = float("inf")
        history = {"train": [], "eval": []}

        for epoch in range(tcfg.epochs):
            parts = {}
            pend: list = []
            for batch in self._batches(
                self.train_set, tcfg.batch_size, shuffle=True, rng=rng
            ):
                if chunk > 1:
                    pend.append(batch)
                    if len(pend) < chunk:
                        continue
                    state, key, auxs = chunk_run(state, tuple(pend), key)
                    parts = {k: v[-1] for k, v in auxs.items()}
                    pend = []
                    continue
                key, sub = jax.random.split(key)
                state, parts = step(state, batch, sub)
            # Partial final group: per-step dispatch (padding a TRAIN
            # group would apply spurious updates).
            for batch in pend:
                key, sub = jax.random.split(key)
                state, parts = step(state, batch, sub)
            train_parts = {k: float(v) for k, v in parts.items()}
            history["train"].append(train_parts)

            # Eval loss (fixed rng for comparability across epochs).
            # Device scalars accumulate in a list and convert once at the
            # end, keeping dispatch ahead of the host fetches.
            totals = []
            for batch in self._batches(
                self.valid_set, tcfg.batch_size, shuffle=False
            ):
                total, _ = eval_loss(
                    state.params, batch,
                    jax.random.PRNGKey(0),  # fixed: comparable across epochs
                )
                totals.append(total)
            avg = float(np.mean([float(t) for t in totals])) if totals else 0.0
            history["eval"].append(avg)
            self.params = state.params
            print(
                f"Epoch {epoch:02d}: train {train_parts} | eval loss {avg:.4f}",
                flush=True,
            )
            if avg < best_eval:
                best_eval = avg
                save_checkpoint(
                    self.output, "BEST_EVAL_LOSS", state, async_save=True
                )
            save_checkpoint(
                self.output, f"Epoch{epoch:02d}", state, async_save=True
            )
        wait_for_saves()
        return history
