"""NLVR2 task: two-image true/false reasoning.

Rebuild of the reference NLVR2 pipeline (``src/tasks/nlvr2.py`` /
``nlvr2_data.py`` / ``nlvr2_model.py``): rows are
``{uid, img0, img1, sent, label}`` with binary labels; the model is the
two-image LXMERT (``rgqa_tpu.models.nlvr2``) trained with 2-way CE and
evaluated by exact accuracy (``nlvr2.py:106-133``).

The VQA task lives in :mod:`rgqa_tpu.vqa_task` (its own driver with the
VQA evaluator/dump semantics); this module covers NLVR2 only.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.checkpoint import save_checkpoint
from rgqa_tpu.config import RunConfig
from rgqa_tpu.data import PackedFeatures, WordPieceTokenizer
from rgqa_tpu.data.tokenizer import load_vocab
from rgqa_tpu.models.nlvr2 import Nlvr2Model
from rgqa_tpu.parallel import make_mesh, shard_batch, shard_params
from rgqa_tpu.train import create_train_state, make_optimizer
from rgqa_tpu.train.step import global_norm_clip

__all__ = ["EncodedNLVR2", "Nlvr2Runner"]


class EncodedNLVR2:
    """NLVR2 rows encoded to fixed-shape arrays (two feature rows each)."""

    def __init__(self, rows, features: PackedFeatures, tokenizer, max_text_len=20):
        rows = [
            r for r in rows if r["img0"] in features and r["img1"] in features
        ]
        self.rows = rows
        self.features = features
        self.uids = [r["uid"] for r in rows]
        sents = [r["sent"] for r in rows]
        self.input_ids, self.input_mask, self.segment_ids = (
            tokenizer.encode_batch(sents, max_text_len)
        )
        self.img_rows = np.asarray(
            [(features.index[r["img0"]], features.index[r["img1"]]) for r in rows],
            np.int32,
        )
        self.labels = np.asarray([int(r["label"]) for r in rows], np.int32)
        sizes = np.asarray(features.sizes, np.float32)
        boxes = np.asarray(features.boxes, np.float32).copy()
        boxes[:, :, (0, 2)] /= sizes[:, None, 1:2]
        boxes[:, :, (1, 3)] /= sizes[:, None, 0:1]
        self.norm_boxes = np.clip(boxes, 0.0, 1.0)

    def __len__(self):
        return len(self.rows)

    def gather_batch(self, idx):
        rows = self.img_rows[idx]  # (B, 2)
        feats = np.asarray(self.features.features[rows.reshape(-1)], np.float32)
        boxes = self.norm_boxes[rows.reshape(-1)]
        b = len(idx)
        return {
            "input_ids": self.input_ids[idx],
            "input_mask": self.input_mask[idx],
            "segment_ids": self.segment_ids[idx],
            "feats": feats.reshape(b, 2, *feats.shape[1:]),
            "boxes": boxes.reshape(b, 2, *boxes.shape[1:]),
            "label": self.labels[idx],
        }


class Nlvr2Runner:
    def __init__(self, cfg: RunConfig, rows_by_split: dict):
        self.cfg = cfg
        root = cfg.data.data_root
        self.features = PackedFeatures(os.path.join(root, "features"))
        self.tokenizer = WordPieceTokenizer(
            load_vocab(os.path.join(root, "vocab.txt"))
        )
        self.splits = {
            name: EncodedNLVR2(
                rows, self.features, self.tokenizer, cfg.model.max_text_len
            )
            for name, rows in rows_by_split.items()
        }
        self.model = Nlvr2Model(
            cfg.model.encoder,
            dtype=jnp.bfloat16 if cfg.train.use_bf16 else jnp.float32,
        )
        self.mesh = make_mesh(model=cfg.mesh.model_axis)
        first = next(iter(self.splits.values()))
        b = first.gather_batch(np.arange(2))
        params = self.model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.asarray(b["input_ids"]), jnp.asarray(b["input_mask"]),
            jnp.asarray(b["segment_ids"]), jnp.asarray(b["feats"]),
            jnp.asarray(b["boxes"]),
        )["params"]
        self.params = shard_params(self.mesh, params)
        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)
        from rgqa_tpu.config import dump_run_config

        # Reproducibility snapshot (reference copies src/ into each
        # output dir, run/gqa_conf_finetune.bash:6-8).
        dump_run_config(cfg, self.output)

        def fwd(params, batch, *, deterministic=True, rng=None):
            return self.model.apply(
                {"params": params},
                batch["input_ids"], batch["input_mask"], batch["segment_ids"],
                batch["feats"], batch["boxes"],
                deterministic=deterministic,
                rngs={"dropout": rng} if rng is not None else None,
            )

        self.forward = fwd

    def _batches(
        self, encoded, batch_size, *, shuffle=False, rng=None,
        drop_last=False,
    ):
        """Yield (uids, batch, real).  The final partial batch is padded to
        ``batch_size`` by repeating the last row (static shapes; ``real``
        marks valid rows) unless ``drop_last``."""
        order = np.arange(len(encoded))
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            real = len(idx)
            if real < batch_size:
                if drop_last:
                    return
                idx = np.concatenate(
                    [idx, np.full(batch_size - real, idx[-1], idx.dtype)]
                )
            yield (
                [encoded.uids[i] for i in idx[:real]],
                encoded.gather_batch(idx),
                real,
            )

    def train(self, train_split="train", valid_split="valid") -> dict:
        tcfg = self.cfg.train
        train_set = self.splits[train_split]
        n_batches = len(train_set) // tcfg.batch_size
        tx = make_optimizer(tcfg.optim, max(n_batches * tcfg.epochs, 1))
        state = create_train_state(self.params, tx)

        def loss_fn(params, batch, rng):
            out = self.forward(params, batch, deterministic=False, rng=rng)
            logits = out["logits"].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, batch["label"][:, None], axis=-1)
            return jnp.mean(nll) * 2  # CE * num classes (nlvr2.py:77)

        @jax.jit
        def step(state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            grads = global_norm_clip(grads, tcfg.optim.grad_clip)
            return state.apply_gradients(grads), loss

        key = jax.random.PRNGKey(tcfg.seed)
        rng = np.random.default_rng(tcfg.seed)
        best = 0.0
        history = {"loss": [], "valid": []}
        for epoch in range(tcfg.epochs):
            loss = float("nan")
            for _, batch, _ in self._batches(
                train_set, tcfg.batch_size, shuffle=True, rng=rng,
                drop_last=True,
            ):
                key, sub = jax.random.split(key)
                state, loss = step(state, shard_batch(self.mesh, batch), sub)
            history["loss"].append(float(loss))
            self.params = state.params
            if valid_split in self.splits:
                acc = self.evaluate(valid_split)
                history["valid"].append(acc)
                if acc > best:
                    best = acc
                    save_checkpoint(self.output, "BEST", state)
        save_checkpoint(self.output, "LAST", state)
        return history

    def predict(self, split: str) -> dict[str, int]:
        encoded = self.splits[split]

        @jax.jit
        def infer(params, batch):
            out = self.forward(params, batch, deterministic=True)
            return jnp.argmax(out["logits"].astype(jnp.float32), axis=-1)

        uid2pred = {}
        for uids, batch, real in self._batches(encoded, min(len(encoded), 32)):
            preds = np.asarray(infer(self.params, shard_batch(self.mesh, batch)))
            for uid, p in zip(uids, preds[:real]):
                uid2pred[uid] = int(p)
        return uid2pred

    def evaluate(self, split: str) -> float:
        encoded = self.splits[split]
        gold = {u: int(l) for u, l in zip(encoded.uids, encoded.labels)}
        preds = self.predict(split)
        if not preds:
            return 0.0
        return float(np.mean([preds[u] == gold[u] for u in preds]))

    def dump_csv(self, split: str, path: str) -> None:
        """Reference submission format: ``identifier,{True|False}``
        (``nlvr2.py:150-156``; falls back to uid when the row carries no
        ``identifier``)."""
        encoded = self.splits[split]
        uid2row = {r["uid"]: r for r in encoded.rows}
        preds = self.predict(split)
        with open(path, "w") as f:
            for uid, p in preds.items():
                ident = uid2row[uid].get("identifier", uid)
                f.write(f"{ident},{'True' if p else 'False'}\n")
