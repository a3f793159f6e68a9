"""GQA runner: the task driver tying data, model, training, and scoring.

TPU-native rebuild of the reference task drivers (``src/tasks/gqa_conf.py``
and its ~18 per-strategy siblings): one runner class whose strategy knobs
(RP pairing, mixup, energy regularization, branched head, scorer choice)
are *configuration*, not file forks.  Exposes the same workflow surface:
``train() / evaluate() / predict() / ood_evaluate() / predict_with_thresh()
/ save() / load()`` (``gqa_conf.py:140-381``).

Differences by design (SURVEY.md §7):

- the whole hot path is jitted over a device mesh (batch sharded on
  ``data``); augmentations run on device inside the step;
- questions are tokenized once at dataset encode, not per batch;
- checkpoints are orbax (with optimizer state); PyTorch reference
  checkpoints import through ``rgqa_tpu.checkpoint``.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dataclasses import replace as dataclasses_replace

from rgqa_tpu.checkpoint import (
    import_lxmert_gqa,
    import_uniter_gqa,
    load_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from rgqa_tpu.config import RunConfig
from rgqa_tpu.data import (
    EncodedGQA,
    GQADataset,
    PackedFeatures,
    WordPieceTokenizer,
    batch_iterator,
    device_prefetch,
    make_synthetic_gqa,
)
from rgqa_tpu.data.tokenizer import load_vocab
from rgqa_tpu.eval import ScoringMixin
from rgqa_tpu.models.zoo import build_model, example_batch
from rgqa_tpu.parallel import make_mesh, shard_params
from rgqa_tpu.train import (
    create_train_state,
    make_chunked_train_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = ["GQARunner", "cast_params_bf16", "np_params"]


class GQARunner(ScoringMixin):
    """Task driver: construction + training here; the prediction /
    rejection-scoring surface lives in :class:`rgqa_tpu.eval.ScoringMixin`
    (split per the reference's driver-vs-eval seam)."""

    def __init__(self, cfg: RunConfig, *, init_train: bool = True):
        self.cfg = cfg
        data = cfg.data
        root = data.data_root

        if data.synthetic and not os.path.exists(
            os.path.join(root, "trainval_ans2label.json")
        ):
            make_synthetic_gqa(root)

        self.features = PackedFeatures(os.path.join(root, "features"))
        # --tiny / --fast smoke modes (reference TINY/FAST_IMG_NUM,
        # gqa_data.py:21-22): restrict to the first 512 / 5000 images.
        if data.tiny:
            self.features = self.features.truncate(512)
        elif data.fast:
            self.features = self.features.truncate(5000)
        self.tokenizer = WordPieceTokenizer(
            load_vocab(os.path.join(root, "vocab.txt"))
        )

        backbone = cfg.model.backbone
        self.train_set: Optional[EncodedGQA] = None
        self.valid_set: Optional[EncodedGQA] = None
        self.butd_word2idx = None
        if backbone == "butd":
            self.butd_word2idx = self._butd_dictionary(root)

        if init_train:
            ds = GQADataset(root, data.train_splits, add_uq=True)
            self.dataset = ds
            self.train_set = self._encode(ds, train=True)
            if data.valid_splits:
                vds = GQADataset(root, data.valid_splits, add_uq=True)
                self.valid_set = self._encode(vds)
        else:
            # Evaluation-only: vocab from any split named by test_splits.
            ds = GQADataset(
                root, data.test_splits or data.valid_splits, add_uq=True
            )
            self.dataset = ds

        # Model outputs num_answers - 1 logits; 'UQ' is the appended class
        # used only as the target indicator (gqa_conf.py:79-91).
        import dataclasses

        num_real = self.dataset.num_answers - 1
        if cfg.model.uq_as_class:
            num_real = self.dataset.num_answers  # UQ trained as a class
        if cfg.train.strategy in ("separate", "caption"):
            num_real = 1  # binary detector head (gqa_separate.py)
        mcfg = dataclasses.replace(
            self.cfg.model,
            num_answers=num_real,
            butd_vocab_size=(
                len(self.butd_word2idx)
                if self.butd_word2idx is not None
                else self.cfg.model.butd_vocab_size
            ),
        )
        self.model_cfg = mcfg
        self.model, self.forward = build_model(
            mcfg, use_bf16=cfg.train.use_bf16
        )
        self.label2ans = self.dataset.label2ans

        self.mesh = make_mesh(model=cfg.mesh.model_axis)
        self.params = self._init_params()
        if backbone == "butd":
            self._load_glove_embeddings(root)
        self._load_initial_weights()

        self.eval_step = make_eval_step(self.forward)
        self.output = cfg.output
        os.makedirs(self.output, exist_ok=True)
        from rgqa_tpu.config import dump_run_config

        # Reproducibility snapshot (reference copies src/ into each
        # output dir, run/gqa_conf_finetune.bash:6-8).
        dump_run_config(cfg, self.output)

    # ------------------------------------------------------------------
    # Construction helpers
    # ------------------------------------------------------------------

    def _butd_dictionary(self, root: str) -> dict[str, int]:
        """Word dict over all question splits (``butd/preprocess.py:54-123``).

        Covers the configured splits (train/valid/test, dual-loader
        pos/neg) plus the standard split names, so no configured question
        tokenizes to the padding index.

        Cached to ``<root>/butd/dictionary.json`` keyed on the split list
        — the reference caches ``data/butd/dictionary.pkl`` and rebuilds
        only when absent (``preprocess.py:60-66``); without the cache
        every process start re-scans all split JSONs.
        """
        from rgqa_tpu.models.butd import butd_split

        data = self.cfg.data
        names = {"train", "valid", "testdev"}
        for spec in (
            data.train_splits, data.valid_splits, data.test_splits,
            data.train_pos, data.train_neg,
        ):
            if spec:
                names.update(spec.split(","))
        key = sorted(names)
        # The cache key includes which split files actually existed: a
        # build that ran before some split JSON appeared must not pin its
        # partial vocab forever (the new split's words would silently
        # tokenize to the padding index).
        found = [
            n for n in key if os.path.exists(os.path.join(root, f"{n}.json"))
        ]
        cache = os.path.join(root, "butd", "dictionary.json")
        if os.path.exists(cache):
            with open(cache) as f:
                cached = json.load(f)
            if cached.get("splits") == key and cached.get("found", key) == found:
                return dict(cached["words"])
        words: dict[str, int] = {}
        for name in found:
            with open(os.path.join(root, f"{name}.json")) as f:
                for row in json.load(f):
                    for tok in butd_split(row.get("sent", "")):
                        words.setdefault(tok, len(words))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "w") as f:
            json.dump({"splits": key, "found": found, "words": words}, f)
        return words

    def _load_glove_embeddings(self, root: str) -> None:
        """GloVe-300 init of the BUTD word embedding, cached as
        ``<root>/butd/glove.npy`` (reference ``preprocess.py:100-123``).
        Skips silently when no GloVe file exists (random init stands)."""
        path = self.cfg.data.glove_path or os.path.join(
            root, "butd", "glove.6B.300d.txt"
        )
        if not os.path.exists(path):
            return
        from rgqa_tpu.checkpoint.torch_import import _to_mutable
        from rgqa_tpu.models.butd import build_glove_matrix

        cache = os.path.join(root, "butd", "glove.npy")
        meta_path = cache + ".meta.json"
        # Shape alone can't validate the cache: a different --glove file
        # (or a reshuffled word->index mapping of equal size) would
        # silently reuse stale vectors.  Fingerprint source + mapping.
        st = os.stat(path)
        meta = {
            "glove_path": os.path.abspath(path),
            "glove_mtime": st.st_mtime,
            "glove_size": st.st_size,
            "vocab_fprint": hashlib.md5(
                json.dumps(sorted(self.butd_word2idx.items())).encode()
            ).hexdigest(),
            "dim": self.model_cfg.butd_embed_dim,
        }
        mat = None
        if os.path.exists(cache) and os.path.exists(meta_path):
            with open(meta_path) as f:
                cached_meta = json.load(f)
            if cached_meta == meta:
                m = np.load(cache)
                if m.shape == (
                    len(self.butd_word2idx) + 1,
                    self.model_cfg.butd_embed_dim,
                ):
                    mat = m
        if mat is None:
            mat = build_glove_matrix(
                self.butd_word2idx, path, dim=self.model_cfg.butd_embed_dim
            )
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.save(cache, mat)
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        p = _to_mutable(np_params(self.params))
        emb = p["w_emb"]["embedding"]
        if emb.shape != mat.shape:
            print(
                f"WARNING: GloVe matrix {mat.shape} does not match the "
                f"BUTD embedding {emb.shape}; keeping random init"
            )
            return
        p["w_emb"]["embedding"] = mat.astype(emb.dtype)
        self.params = shard_params(self.mesh, p)

    def _encode(self, ds: GQADataset, *, train: bool = False) -> EncodedGQA:
        image2caps = None
        image_source = None
        if self.cfg.model.backbone == "caps":
            with open(
                os.path.join(self.cfg.data.data_root, "image2caps.json")
            ) as f:
                image2caps = json.load(f)
        if self.cfg.model.backbone == "vilt":
            from rgqa_tpu.data.images import GQAImageSource, PixelPack

            # Prefer a pre-decoded PixelPack (prepare_data --pack_pixels):
            # serving reads uint8 rows off a memmap instead of paying
            # ~25 ms/image of JPEG decode on the host core per epoch.
            size = self.cfg.model.vilt_image_size
            mode = self.cfg.data.vilt_resize
            img_root = os.path.join(self.cfg.data.data_root, "images")
            pack_dir = os.path.join(
                self.cfg.data.data_root, f"pixels_{size}_{mode}"
            )
            # Train-time randaug (the reference ViLT dataset's
            # pixelbert_randaug transform, gqa_data.py:341) needs raw
            # images — pre-resized pack rows can't be photometrically
            # augmented, so the TRAIN split keeps the JPEG source while
            # eval splits may still ride the pack.
            randaug = train and getattr(self.cfg.data, "vilt_randaug", True)
            image_source = None
            if not randaug and os.path.isfile(
                os.path.join(pack_dir, "meta.json")
            ):
                cand = PixelPack(pack_dir)
                # Only a pack built from THIS image root substitutes for
                # decoding it (stale/foreign packs are silently-wrong
                # pixels, not a cache hit).
                if cand.matches_source(img_root):
                    image_source = cand
            if image_source is None:
                image_source = GQAImageSource(
                    os.path.join(self.cfg.data.data_root, "images"),
                    size=size,
                    mode=mode,
                )
        encoded = EncodedGQA(
            ds,
            self.features,
            tokenizer=self.tokenizer,
            max_text_len=self.cfg.model.max_text_len,
            backbone=self.cfg.model.backbone,
            butd_word2idx=self.butd_word2idx,
            image2caps=image2caps,
            keep_uq_target=self.cfg.model.uq_as_class,
            image_source=image_source,
            pixel_wire=getattr(self.cfg.data, "pixel_wire", "f32"),
            pixel_patch_size=self.cfg.model.vilt_patch_size,
        )
        if (
            train
            and self.cfg.model.backbone == "vilt"
            and getattr(self.cfg.data, "vilt_randaug", True)
        ):
            # Per-batch photometric randaug (reference pixelbert_randaug):
            # gather_batch threads this generator into the image loads.
            # Eval/scoring splits leave it None — deterministic pixels.
            encoded.image_augment_rng = np.random.default_rng(
                self.cfg.train.seed
            )
        return encoded

    def _init_params(self):
        batch = example_batch(self.model_cfg, batch_size=2, seed=0)
        args = self._forward_args(batch)
        params = self.model.init(jax.random.PRNGKey(self.cfg.train.seed), *args)[
            "params"
        ]
        return shard_params(self.mesh, params)

    def _forward_args(self, batch):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.cfg.model.backbone == "butd":
            return (b["token_ids"], b["feats"], b["boxes"])
        if self.cfg.model.backbone == "vilt":
            return (b["input_ids"], b["input_mask"], b["pixels"])
        if self.cfg.model.backbone == "caps":
            return (b["input_ids"], b["input_mask"], b["segment_ids"])
        return (
            b["input_ids"], b["input_mask"], b["segment_ids"],
            b["feats"], b["boxes"],
        )

    def _load_initial_weights(self):
        cfg = self.cfg
        enc = cfg.model.encoder
        if cfg.load:
            self.load(cfg.load)
        elif cfg.load_lxmert_qa and cfg.model.backbone == "lxmert":
            # The reference's standard finetune init (--loadLXMERTQA,
            # run/gqa_conf_finetune.bash): encoder + answer-head transplant
            # by answer string from the QA-pretrained checkpoint.
            from rgqa_tpu.checkpoint import load_lxmert_qa
            from rgqa_tpu.pretrain.answer_table import AnswerTable

            path = cfg.load_lxmert_qa
            if not path.endswith(".pth") and os.path.exists(path + "_LXRT.pth"):
                path = path + "_LXRT.pth"  # reference's "%s_LXRT.pth" suffix
            table = None
            for cand in (
                os.path.join(cfg.data.data_root, "all_ans.json"),
                "data/lxmert/all_ans.json",
            ):
                if os.path.exists(cand):
                    table = AnswerTable(path=cand)
                    break
            if table is None:
                print(
                    "WARNING: all_ans.json not found — loading encoder + "
                    "answer-head transform only, no per-answer transplant"
                )
                self.params, missing, _ = import_lxmert_gqa(
                    np_params(self.params), path,
                    l_layers=enc.l_layers, x_layers=enc.x_layers,
                    r_layers=enc.r_layers, from_pretrain=True,
                )
            else:
                self.params, loaded, zeroed = load_lxmert_qa(
                    np_params(self.params), path,
                    self.label2ans,
                    src_ans2id=table.ans2id_map(),
                    convert_ans=table.convert_ans,
                    l_layers=enc.l_layers, x_layers=enc.x_layers,
                    r_layers=enc.r_layers,
                )
                print(
                    f"Loaded {loaded} answers from LXRTQA pre-training "
                    f"and {zeroed} not"
                )
            self.params = shard_params(self.mesh, self.params)
        elif cfg.load_lxmert and cfg.model.backbone == "lxmert":
            self.params, missing, _ = import_lxmert_gqa(
                np_params(self.params), cfg.load_lxmert,
                l_layers=enc.l_layers, x_layers=enc.x_layers,
                r_layers=enc.r_layers, from_pretrain=True,
            )
            print(f"Loaded LXMERT encoder ({len(missing)} keys left at init)")
            self.params = shard_params(self.mesh, self.params)
        elif cfg.load_lxmert and cfg.model.backbone == "uniter":
            self.params, missing, _ = import_uniter_gqa(
                np_params(self.params), cfg.load_lxmert
            )
            print(f"Loaded UNITER encoder ({len(missing)} keys left at init)")
            self.params = shard_params(self.mesh, self.params)
        elif cfg.load_bert and cfg.model.backbone == "caps":
            # Pretrained-BERT init for the Q-C matcher (the reference's
            # BertModel.from_pretrained starting point, caps.py:17); the
            # match head stays at its random init like logit_fc.
            from rgqa_tpu.checkpoint import import_bert_caps

            self.params, missing, _ = import_bert_caps(
                np_params(self.params), cfg.load_bert,
                num_layers=enc.num_layers,
            )
            print(f"Loaded BERT encoder ({len(missing)} keys left at init)")
            self.params = shard_params(self.mesh, self.params)

    # ------------------------------------------------------------------
    # Training (gqa_conf.py:140-243)
    # ------------------------------------------------------------------

    def _validate_exact(self):
        """Per-epoch validation on the exact feed, regardless of
        ``--feed_int8``: validation picks the BEST checkpoint, and a
        quantized feed could flip near-tied epochs — the flag's contract
        is transport-only on *eval links* (config.py ``feed_int8``)."""
        if getattr(self.cfg.data, "feed_int8", False) and not getattr(
            self, "_int8_train_noted", False
        ):
            self._int8_train_noted = True
            print(
                "--feed_int8 is eval-only transport: per-epoch validation "
                "and BEST selection feed exact",
                flush=True,
            )
        self._feed_exact = True
        try:
            return self.evaluate(self.valid_set)
        finally:
            self._feed_exact = False

    def _record_chart(self, quesid2score, qids, scores, labels):
        """Accumulate per-question cartography rows (``--chart``)."""
        for qid, s, l in zip(qids, scores, labels):
            datum = self.dataset.id2datum[qid]
            quesid2score[qid] = (
                float(s), datum.get("label"), self.label2ans[int(l)]
            )

    def _epoch_end(
        self, epoch, state, epoch_start, last_loss, history, best_valid,
        quesid2score, *, extra_save=None,
    ) -> float:
        """Shared end-of-epoch bookkeeping for the single-loader trainers
        (reference log format: ``gqa.py:214-230``): history + log.log +
        chart pickle, validation with BEST (and ``--save_all`` EPOCH_n)
        checkpoints.  ``extra_save(tag)`` persists strategy-specific
        sibling state (e.g. the adversarial CLIP tower) whenever the
        model checkpoint is saved.  Returns the updated best_valid."""
        tcfg = self.cfg.train
        last_loss = float(last_loss)
        history["loss"].append(last_loss)
        log_str = (
            f"\nEpoch {epoch}: Train Loss {last_loss:.2f} "
            f"({time.time() - epoch_start:.1f}s)\n"
        )
        self.params = state.params
        if self.valid_set is not None:
            valid = self._validate_exact()
            history["valid"].append(valid)
            if valid > best_valid:
                best_valid = valid
                self.save("BEST", state, async_save=True)
                if extra_save is not None:
                    extra_save("BEST")
            log_str += (
                f"Epoch {epoch}: Valid {valid * 100:.2f}\n"
                f"Epoch {epoch}: Best {best_valid * 100:.2f}\n"
            )
        if tcfg.save_all:
            self.save(f"EPOCH_{epoch}", state, async_save=True)
            if extra_save is not None:
                extra_save(f"EPOCH_{epoch}")
        print(log_str, end="", flush=True)
        with open(os.path.join(self.output, "log.log"), "a") as f:
            f.write(log_str)
        if tcfg.chart:
            with open(
                os.path.join(self.output, "chart", f"epoch_{epoch}.pkl"),
                "wb",
            ) as f:
                pickle.dump(
                    quesid2score, f, protocol=pickle.HIGHEST_PROTOCOL
                )
        return best_valid

    def train(self, resume: Optional[str] = None) -> dict:
        """Train per the configured strategy.

        ``resume`` names a checkpoint saved by :meth:`save` (e.g. "LAST")
        to restore *including optimizer state and step counter* — true
        resume, which the reference lacks entirely (SURVEY.md §5).
        Set ``RGQA_PROFILE_DIR`` to capture a ``jax.profiler`` trace of the
        first training steps.
        """
        if (
            self.cfg.train.update_weight_model
            and self.cfg.train.strategy != "weight"
        ):
            # BEFORE any strategy dispatch: the flag must never be
            # silently dropped (tests pin this warning).
            import warnings

            warnings.warn(
                "--update_weight_model only applies with --strategy "
                f"weight (got --strategy {self.cfg.train.strategy}); the "
                "CLIP weight model will NOT be trained",
                RuntimeWarning,
                stacklevel=2,
            )
        if self.cfg.train.strategy in ("resampling", "poem", "woods"):
            if getattr(self.cfg.train, "train_chunk", 1) > 1:
                print(
                    "--train_chunk ignored for the min-max strategies "
                    "(dual-loader loop)", flush=True,
                )
            return self.train_minmax()
        if (
            self.cfg.train.strategy == "weight"
            and self.cfg.train.update_weight_model
        ):
            if getattr(self.cfg.train, "train_chunk", 1) > 1:
                print(
                    "--train_chunk ignored with --update_weight_model "
                    "(joint model+CLIP step)", flush=True,
                )
            return self.train_weight_model(resume)
        cfg = self.cfg
        tcfg = cfg.train
        assert self.train_set is not None
        n_batches = len(self.train_set) // tcfg.batch_size
        t_total = max(n_batches * tcfg.epochs, 1)
        tx = make_optimizer(tcfg.optim, t_total)
        state = create_train_state(self.params, tx)
        if resume:
            restored = load_checkpoint(self.output, resume, template=state)
            state = state.replace(
                step=restored["step"],
                params=restored["params"],
                opt_state=restored["opt_state"],
            )

        profile_dir = os.environ.get("RGQA_PROFILE_DIR")
        profiled = False

        # --train_chunk K: scan K optimizer steps per device dispatch
        # (remote/tunneled chips pay a synchronous round trip per
        # dispatch — docs/kernels.md "Dispatch anatomy").  The step is
        # then built donate=False (the scan carry owns the buffers; the
        # chunk runner donates the outer state instead).  distill_online
        # is excluded: its step closes over the teacher params, which
        # would embed as compile-payload constants inside the chunk jit.
        chunk = max(1, int(getattr(tcfg, "train_chunk", 1)))
        if tcfg.strategy == "distill_online" and chunk > 1:
            print(
                "--train_chunk ignored for distill_online (the teacher "
                "params would embed as compile constants)", flush=True,
            )
            chunk = 1

        teacher_params = None
        if tcfg.strategy == "distill_online":
            from rgqa_tpu.train.online_distill import make_online_distill_step

            assert cfg.teacher_path, "--teacher_path required for distill_online"
            teacher = GQARunner(
                cfg.replace(load=cfg.teacher_path, output=cfg.output + "/teacher",
                            train=dataclasses_replace(tcfg, strategy="conf")),
                init_train=False,
            )
            teacher_params = teacher.params
            inner = make_online_distill_step(
                self.forward,
                teacher.forward,
                lam=tcfg.lam,
                mixup_mode=tcfg.mixup_mode or "mixup_v1",
                mixup_alpha=tcfg.mixup_alpha,
                mixup_beta=tcfg.mixup_beta,
                lam1=tcfg.lam1,
                lam2=tcfg.lam2,
                grad_clip=tcfg.optim.grad_clip,
            )

            def step(state, batch, rng):
                return inner(state, teacher_params, batch, rng)

        elif tcfg.strategy == "adv":
            from rgqa_tpu.train.adversarial import AdvConfig, make_adv_train_step

            hidden = self.model_cfg.encoder.hidden_size
            step = make_adv_train_step(
                self.forward,
                lambda b: (*b["input_ids"].shape, hidden),
                AdvConfig(
                    steps=tcfg.adv_steps,
                    lr_txt=tcfg.adv_lr_txt,
                    lr_img=tcfg.adv_lr_img,
                    max_norm=tcfg.adv_max_norm,
                    kl_weight=tcfg.adv_kl_weight,
                    norm_type=tcfg.adv_norm_type,
                ),
                grad_clip=tcfg.optim.grad_clip,
                donate=chunk == 1,
            )
        else:
            step = make_train_step(
                self.forward,
                loss=tcfg.loss,
                weighted_rp=tcfg.strategy == "weight",
                sample_pair=tcfg.sample_pair,
                mixup_mode=tcfg.mixup_mode,
                mixup_alpha=tcfg.mixup_alpha,
                mixup_beta=tcfg.mixup_beta,
                lam1=tcfg.lam1,
                lam2=tcfg.lam2,
                energy=cfg.ood.scorer == "energy" and tcfg.m_in != 0,
                m_in=tcfg.m_in,
                m_out=tcfg.m_out,
                branched=cfg.model.branched or cfg.model.branched_layers,
                binary=tcfg.strategy in ("separate", "caption"),
                uq_as_class=cfg.model.uq_as_class,
                grad_clip=tcfg.optim.grad_clip,
                donate=chunk == 1,
            )
        chunk_run = make_chunked_train_step(step) if chunk > 1 else None

        if tcfg.chart:
            os.makedirs(os.path.join(self.output, "chart"), exist_ok=True)

        similarity = self._weight_similarity() if tcfg.strategy == "weight" else None
        rng = np.random.default_rng(tcfg.seed)
        key = jax.random.PRNGKey(tcfg.seed)
        best_valid = 0.0
        history = {"loss": [], "valid": []}
        record_chart = self._record_chart

        for epoch in range(tcfg.epochs):
            quesid2score = {}
            last_loss = float("nan")
            epoch_start = time.time()
            it = device_prefetch(
                batch_iterator(
                    self.train_set, tcfg.batch_size,
                    shuffle=True, rng=rng, drop_last=True,
                ),
                self.mesh,
            )
            pend: list = []  # (qids, batch) awaiting a chunked dispatch

            for qids, batch, _ in it:
                if similarity is not None:
                    shift = int(rng.integers(1, len(qids)))
                    neg_qids = qids[-shift:] + qids[:-shift]  # np.roll order
                    sims = similarity(qids, neg_qids)
                    w = np.exp(
                        (sims - sims.max()) / self.cfg.ood.temperature
                    )
                    batch = dict(batch)
                    batch["neg_shift"] = jnp.asarray(shift, jnp.int32)
                    batch["neg_weights"] = jnp.asarray(
                        w / w.sum(), jnp.float32
                    )
                if chunk > 1:
                    # K steps per dispatch; the per-step key splits run
                    # INSIDE the chunked jit (a host split is its own
                    # dispatch round trip), producing bitwise the same
                    # key sequence as the per-step loop — trajectories
                    # are identical (pinned in tests/test_runner.py).
                    pend.append((qids, batch))
                    if len(pend) < chunk:
                        continue
                    batches = tuple(b for _, b in pend)
                    if profile_dir and not profiled and epoch == 0:
                        with jax.profiler.trace(profile_dir):
                            state, key, auxs = chunk_run(state, batches, key)
                            # np.asarray: on axon block_until_ready
                            # returns early; only a host transfer syncs.
                            np.asarray(auxs["loss"])
                        profiled = True
                    else:
                        state, key, auxs = chunk_run(state, batches, key)
                    if tcfg.chart:
                        scores = np.asarray(auxs["score"])
                        labels = np.asarray(auxs["label"])
                        for gi, (gqids, _) in enumerate(pend):
                            record_chart(
                                quesid2score, gqids, scores[gi], labels[gi]
                            )
                    last_loss = auxs["loss"][-1]
                    pend = []
                    continue
                key, sub = jax.random.split(key)
                if profile_dir and not profiled and epoch == 0:
                    with jax.profiler.trace(profile_dir):
                        state, aux = step(state, batch, sub)
                        np.asarray(aux["loss"])  # host transfer = real sync
                    profiled = True
                else:
                    state, aux = step(state, batch, sub)
                if tcfg.chart:
                    record_chart(
                        quesid2score, qids,
                        np.asarray(aux["score"]), np.asarray(aux["label"]),
                    )
                last_loss = aux["loss"]
            # Partial final group: run the remaining steps per-dispatch
            # (padding a TRAIN group would apply spurious updates).
            for gqids, batch in pend:
                key, sub = jax.random.split(key)
                state, aux = step(state, batch, sub)
                if tcfg.chart:
                    record_chart(
                        quesid2score, gqids,
                        np.asarray(aux["score"]), np.asarray(aux["label"]),
                    )
                last_loss = aux["loss"]
            best_valid = self._epoch_end(
                epoch, state, epoch_start, last_loss, history, best_valid,
                quesid2score,
            )

        self.save("LAST", state)
        wait_for_saves()
        return history

    def train_weight_model(self, resume: Optional[str] = None) -> dict:
        """CLIP-weighted RP with an adversarially-trained weight model
        (``gqa_weight.py --update_weight_model``): per step, negative-pair
        weights come from the CURRENT CLIP params; the VQA model minimizes
        ``0.5*(pos + weighted neg)`` while CLIP maximizes the weighted
        negative loss (Adam lr 1e-5, clip 5.0 — ``gqa_weight.py:228-238``).

        TPU-native: both towers' fwd+bwd and both optimizer updates run in
        ONE jit (``make_weighted_clip_train_step``); anchor images are
        decoded ONCE into a uint8 disk memmap and normalized per batch in
        the prefetch thread, overlapping device compute.  Checkpoints:
        every model tag gets a ``<tag>_clip`` sibling (CLIP params + Adam
        state — ``resume`` restores both sides of the min-max), and the
        final tower is exported as a reloadable ``clip_params/`` dir that
        a later ``--strategy weight --clip_path <output>/clip_params`` run
        scores with (:meth:`_export_clip_params`).
        """
        import optax

        from rgqa_tpu.data.images import GQAImageSource
        from rgqa_tpu.scorers.clip import ClipScorer
        from rgqa_tpu.train import make_weighted_clip_train_step

        cfg = self.cfg
        tcfg = cfg.train
        assert self.train_set is not None
        clip_path = cfg.ood.clip_path
        image_root = os.path.join(cfg.data.data_root, "images")
        if not clip_path or not os.path.isdir(image_root):
            raise RuntimeError(
                "--update_weight_model needs --clip_path (local CLIP "
                f"checkpoint) and raw images under {image_root} — the CLIP "
                "towers are trained, so there is no overlap/uniform "
                "fallback for this mode (gqa_weight.py:80-81)."
            )
        scorer = ClipScorer(
            clip_path, backend="jax", batch_size=tcfg.batch_size,
            use_bf16=tcfg.use_bf16,
        )
        clip_model, ccfg = scorer.model, scorer.cfg
        from rgqa_tpu.models.clip import ClipModel

        def clip_similarity(clip_params, ids, mask, pixels):
            if pixels.dtype == jnp.uint8:
                # uint8 anchor-pixel wire: normalize inside the joint
                # train-step jit (ops/pixels.py; 1/4 the f32 feed bytes).
                from rgqa_tpu.ops.pixels import clip_normalize_jnp

                pixels = clip_normalize_jnp(pixels)
            sim = clip_model.apply(
                {"params": clip_params}, ids, mask, pixels,
                method=ClipModel.cosine,
            )
            # Frozen scale copy (gqa_weight.py:82-83: .data.exp(), no grad).
            scale = jnp.exp(
                jax.lax.stop_gradient(
                    clip_params["logit_scale"].astype(jnp.float32)
                )
            )
            return sim * scale

        n_batches = len(self.train_set) // tcfg.batch_size
        t_total = max(n_batches * tcfg.epochs, 1)
        state = create_train_state(self.params, make_optimizer(tcfg.optim, t_total))
        # torch.optim.Adam defaults (param.py get_optimizer('adam'), lr 1e-5,
        # weight_decay 0 — gqa_weight.py:105).
        clip_state = create_train_state(scorer.params, optax.adam(1e-5))
        if resume:
            restored = load_checkpoint(self.output, resume, template=state)
            state = state.replace(
                step=restored["step"], params=restored["params"],
                opt_state=restored["opt_state"],
            )
            # The adversary resumes too: each model tag has a sibling
            # <tag>_clip checkpoint (params + Adam state) — without it the
            # min-max trajectory would silently restart the CLIP side.
            clip_name = f"{resume}_clip"
            if os.path.isdir(os.path.join(self.output, clip_name)):
                rc = load_checkpoint(
                    self.output, clip_name, template=clip_state
                )
                clip_state = clip_state.replace(
                    step=rc["step"], params=rc["params"],
                    opt_state=rc["opt_state"],
                )
            else:
                import warnings

                warnings.warn(
                    f"resume {resume!r}: no {clip_name} checkpoint — the "
                    "CLIP weight model restarts from --clip_path and the "
                    "min-max trajectory will diverge from an "
                    "uninterrupted run",
                    RuntimeWarning,
                    stacklevel=2,
                )
        step = make_weighted_clip_train_step(
            self.forward,
            clip_similarity,
            temperature=cfg.ood.temperature,
            grad_clip=tcfg.optim.grad_clip,
        )

        source = GQAImageSource(image_root)
        from PIL import Image

        from rgqa_tpu.scorers.clip import clip_resize_crop

        # Decode-once pixel cache: each anchor JPEG is decoded + resized
        # ONE time across all epochs (on this one-core host a per-epoch
        # re-decode can starve the TPU step).  uint8 post-crop rows live
        # in a disk memmap (~150 KB/image at 224px — f32 in RAM would be
        # 4x and GQA-scale doesn't fit); rows ship as uint8 and the
        # normalize runs inside the train-step jit (clip_similarity).
        uniq = sorted(
            {self.dataset.id2datum[q]["img_id"] for q in self.train_set.question_ids}
        )
        img_row = {img_id: i for i, img_id in enumerate(uniq)}
        s = ccfg.image_size
        # Scratch for this run only (the `cached` map doesn't persist, so
        # a leftover file could never be trusted) — removed after the
        # epoch loop; at GQA scale it is ~10 GB of dead disk otherwise.
        pixel_cache_path = os.path.join(self.output, "clip_pixels_u8.npy")
        pixel_cache = np.lib.format.open_memmap(
            pixel_cache_path,
            mode="w+", dtype=np.uint8, shape=(len(uniq), s, s, 3),
        )
        cached = np.zeros(len(uniq), bool)

        def anchor_pixels(img_id: str) -> np.ndarray:
            row = img_row[img_id]
            if not cached[row]:
                with Image.open(source.path(img_id)) as im:
                    pixel_cache[row] = clip_resize_crop(im, s)
                cached[row] = True
            return pixel_cache[row]

        def add_clip_inputs(it):
            """Prefetch-thread batch augmentation: anchor pixels + anchor
            CLIP tokens (negatives are formed in-jit by the neg_shift
            roll, pairing each positive image with a rolled question)."""
            for qids, batch, real in it:
                sents = [self.dataset.id2datum[q]["sent"] for q in qids]
                ids, mask = scorer.tokenizer.encode_batch(
                    sents, ccfg.max_text_len
                )
                u8 = np.stack([
                    anchor_pixels(self.dataset.id2datum[q]["img_id"])
                    for q in qids
                ])
                # Ship the cached uint8 rows directly — clip_similarity
                # normalizes in-jit, so the prefetch thread skips the
                # f32 normalize AND the wire carries 1/4 the bytes.
                batch = dict(
                    batch,
                    pixels=u8,
                    clip_ids=ids,
                    clip_mask=mask,
                )
                yield qids, batch, real

        if tcfg.chart:
            os.makedirs(os.path.join(self.output, "chart"), exist_ok=True)
        rng = np.random.default_rng(tcfg.seed)
        key = jax.random.PRNGKey(tcfg.seed)
        best_valid = 0.0
        history = {"loss": [], "valid": []}
        for epoch in range(tcfg.epochs):
            quesid2score = {}
            last_loss = float("nan")
            epoch_start = time.time()
            it = device_prefetch(
                add_clip_inputs(
                    batch_iterator(
                        self.train_set, tcfg.batch_size,
                        shuffle=True, rng=rng, drop_last=True,
                    )
                ),
                self.mesh,
            )
            for qids, batch, _ in it:
                shift = int(rng.integers(1, len(qids)))
                batch = dict(batch)
                batch["neg_shift"] = jnp.asarray(shift, jnp.int32)
                key, sub = jax.random.split(key)
                state, clip_state, aux = step(state, clip_state, batch, sub)
                if tcfg.chart:
                    self._record_chart(
                        quesid2score, qids,
                        np.asarray(aux["score"]), np.asarray(aux["label"]),
                    )
                last_loss = aux["loss"]

            def save_clip(tag):
                # Sibling adversary checkpoint: resume restores it so the
                # min-max trajectory continues, not restarts.
                save_checkpoint(
                    self.output, f"{tag}_clip", clip_state, async_save=True
                )

            best_valid = self._epoch_end(
                epoch, state, epoch_start, last_loss, history, best_valid,
                quesid2score, extra_save=save_clip,
            )
        del pixel_cache
        os.remove(pixel_cache_path)
        self.save("LAST", state)
        save_checkpoint(self.output, "LAST_clip", clip_state)
        self._export_clip_params(clip_path, clip_state.params)
        wait_for_saves()
        return history

    def _export_clip_params(self, src_clip_path: str, params) -> str:
        """Write the trained CLIP tower as a RELOADABLE checkpoint dir
        (``<output>/clip_params``): the source HF dir's ``config.json`` +
        tokenizer files plus the params as an orbax tree under
        ``jax_params/`` — so a later ``--strategy weight --clip_path
        <output>/clip_params`` run scores with the trained adversary
        (``ClipScorer`` loads ``jax_params`` in preference to the torch
        ``pytorch_model.bin``)."""
        import shutil

        out = os.path.join(self.output, "clip_params")
        os.makedirs(out, exist_ok=True)
        for name in (
            "config.json", "vocab.json", "merges.txt", "tokenizer.json"
        ):
            src = os.path.join(src_clip_path, name)
            dst = os.path.join(out, name)
            # --clip_path may BE a previous run's export (continued
            # adversarial training with the same --output): the files are
            # already in place; shutil.copy would raise SameFileError.
            if os.path.exists(src) and not (
                os.path.exists(dst) and os.path.samefile(src, dst)
            ):
                shutil.copy(src, dst)
        save_checkpoint(out, "jax_params", params)
        return out

    def _weight_similarity(self):
        """Image-question similarity for the CLIP-weighted RP strategy
        (``gqa_weight.py``).  Prefers a local CLIP checkpoint + raw images;
        falls back to caption/question word overlap (captions stand in for
        the image content in image-free environments), else uniform."""
        clip_sim = self._clip_weight_similarity()
        if clip_sim is not None:
            return clip_sim
        caps_path = os.path.join(self.cfg.data.data_root, "image2caps.json")
        image2caps = {}
        if os.path.exists(caps_path):
            with open(caps_path) as f:
                image2caps = json.load(f)

        def overlap_similarity(anchor_qids, neg_qids):
            sims = np.zeros(len(anchor_qids), np.float32)
            for i, (aq, nq) in enumerate(zip(anchor_qids, neg_qids)):
                img_id = self.dataset.id2datum[aq]["img_id"]
                cap = " ".join(image2caps.get(img_id, [""])).lower().split()
                sent = self.dataset.id2datum[nq]["sent"].lower().split()
                if cap and sent:
                    sims[i] = len(set(cap) & set(sent)) / len(set(sent))
            return sims

        if image2caps:
            return overlap_similarity
        # No CLIP checkpoint and no captions: the strategy degrades to a
        # plain RP run (all-zero similarity -> uniform weights).  That is
        # NOT what --strategy weight promises, so be loud about it
        # (reference gqa_weight.py always has CLIP; this env may not).
        import warnings

        warnings.warn(
            "--strategy weight: no CLIP checkpoint (--clip_path) and no "
            f"{caps_path} found - negative-pair weights fall back to "
            "UNIFORM, making this a plain RP run. Provide a local CLIP "
            "checkpoint or an image2caps.json for real similarity "
            "weighting.",
            RuntimeWarning,
            stacklevel=2,
        )
        return lambda a, n: np.zeros(len(a), np.float32)  # uniform weights

    def _clip_weight_similarity(self):
        """CLIP anchor-image x negative-question similarity
        (``gqa_weight.py:154-186``: normalized embedding inner product *
        ``logit_scale.exp()``, softmaxed by the caller at
        ``--temperature``).  Needs ``--clip_path`` and raw images under
        ``<data_root>/images``; returns None when either is missing."""
        clip_path = self.cfg.ood.clip_path
        image_root = os.path.join(self.cfg.data.data_root, "images")
        if not clip_path or not os.path.isdir(image_root):
            return None
        from PIL import Image

        from rgqa_tpu.data.images import GQAImageSource
        from rgqa_tpu.scorers.clip import ClipScorer

        scorer = ClipScorer(
            clip_path, batch_size=min(self.cfg.train.batch_size, 64)
        )
        source = GQAImageSource(image_root)
        embed_cache: dict[str, np.ndarray] = {}

        def similarity(anchor_qids, neg_qids):
            img_ids = [
                self.dataset.id2datum[q]["img_id"] for q in anchor_qids
            ]
            sents = [self.dataset.id2datum[q]["sent"] for q in neg_qids]
            if scorer.backend != "jax":
                # torch fallback scores per pair; no embedding cache —
                # decode each anchor image exactly once, here.
                imgs = []
                for img_id in img_ids:
                    with Image.open(source.path(img_id)) as im:
                        imgs.append(im.convert("RGB"))
                return scorer.weight_similarity(imgs, sents)
            fresh = [i for i in dict.fromkeys(img_ids) if i not in embed_cache]
            if fresh:
                imgs = []
                for img_id in fresh:
                    with Image.open(source.path(img_id)) as im:
                        imgs.append(im.convert("RGB"))
                for img_id, e in zip(fresh, scorer.image_embeds(imgs)):
                    embed_cache[img_id] = e
            txt = scorer.text_embeds(sents)
            img = np.stack([embed_cache[i] for i in img_ids])
            return np.sum(img * txt, -1) * scorer.logit_scale

        return similarity

    def train_minmax(self) -> dict:
        """Dual-loader min-max training: resampling / POEM / WOODS
        (``gqa_resampling.py`` / ``gqa_poem.py`` / ``gqa_woods.py``).

        Positive batches stream from ``--train_pos``; negative (pseudo-UQ)
        batches are sampled by the adversarially-learned weights.
        """
        from rgqa_tpu.parallel import shard_batch
        from rgqa_tpu.train.dual_loader import (
            NegativeWeights,
            make_minmax_step,
            sample_negative_indices,
        )

        cfg = self.cfg
        tcfg = cfg.train
        pos_ds = GQADataset(cfg.data.data_root, cfg.data.train_pos, add_uq=True)
        neg_ds = GQADataset(cfg.data.data_root, cfg.data.train_neg, add_uq=True)
        pos_set = self._encode(pos_ds, train=True)
        neg_set = self._encode(neg_ds, train=True)
        self.dataset = pos_ds

        n_batches = len(pos_set) // tcfg.batch_size
        t_total = max(n_batches * tcfg.epochs, 1)
        tx = make_optimizer(tcfg.optim, t_total)
        state = create_train_state(self.params, tx)
        weighted = tcfg.strategy != "woods"
        step = make_minmax_step(
            self.forward, weighted=weighted, grad_clip=tcfg.optim.grad_clip
        )
        weights = NegativeWeights(len(neg_set), tcfg.lr_w)

        rng = np.random.default_rng(tcfg.seed)
        key = jax.random.PRNGKey(tcfg.seed)
        best_valid = 0.0
        history = {"loss": [], "valid": []}
        for epoch in range(tcfg.epochs):
            sampling_w = weights.sampling_weights()
            last = float("nan")
            for _, pos, _ in batch_iterator(
                pos_set, tcfg.batch_size, shuffle=True, rng=rng, drop_last=True
            ):
                wids = sample_negative_indices(rng, sampling_w, tcfg.batch_size)
                neg = neg_set.gather_batch(wids)
                key, sub = jax.random.split(key)
                state, w_grads, aux = step(
                    state,
                    weights.values,
                    shard_batch(self.mesh, pos),
                    shard_batch(self.mesh, neg),
                    jnp.asarray(wids),
                    sub,
                )
                if weighted:
                    weights.apply(w_grads)
                last = aux["loss"]
            history["loss"].append(float(last))
            self.params = state.params
            log_str = f"\nEpoch {epoch}: Train Loss {float(last):.2f}\n"
            if self.valid_set is not None:
                valid = self._validate_exact()
                history["valid"].append(valid)
                if valid > best_valid:
                    best_valid = valid
                    self.save("BEST", state, async_save=True)
                log_str += f"Epoch {epoch}: Valid {valid * 100:.2f}\n"
            print(log_str, end="", flush=True)
            with open(os.path.join(self.output, "log.log"), "a") as f:
                f.write(log_str)
        self.save("LAST", state)
        wait_for_saves()
        return history

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    def save(self, name: str, state=None, *, async_save: bool = False) -> str:
        """Per-epoch saves run async (background commit thread) so the
        device keeps training while params serialize; loads and
        wait_for_saves() barrier on them."""
        return save_checkpoint(
            self.output, name,
            state if state is not None else self.params,
            async_save=async_save,
        )

    def load(self, path: str) -> None:
        """Load an orbax checkpoint dir or a reference ``.pth``."""
        if path.endswith(".pth") or os.path.isfile(path):
            enc = self.model_cfg.encoder
            if self.model_cfg.backbone == "lxmert":
                self.params, missing, unused = import_lxmert_gqa(
                    np_params(self.params), path,
                    l_layers=enc.l_layers, x_layers=enc.x_layers,
                    r_layers=enc.r_layers, branched=self.model_cfg.branched,
                )
            elif self.model_cfg.backbone == "uniter":
                self.params, missing, unused = import_uniter_gqa(
                    np_params(self.params), path
                )
            elif self.model_cfg.backbone == "vilt":
                from rgqa_tpu.checkpoint.torch_import import import_vilt_gqa

                self.params, missing, unused = import_vilt_gqa(
                    np_params(self.params), path,
                    num_layers=enc.num_layers,
                )
            elif self.model_cfg.backbone == "butd":
                from rgqa_tpu.checkpoint.torch_import import import_butd_gqa

                self.params, missing, unused = import_butd_gqa(
                    np_params(self.params), path
                )
            elif self.model_cfg.backbone == "caps":
                from rgqa_tpu.checkpoint import import_bert_caps

                self.params, missing, unused = import_bert_caps(
                    np_params(self.params), path,
                    num_layers=enc.num_layers,
                )
            else:
                raise ValueError(
                    f"no torch importer for {self.model_cfg.backbone}"
                )
            if missing:
                print(f"Weights not found in ckpt: {missing[:5]}...")
            if unused:
                print(f"Ckpt weights unused: {unused[:5]}...")
        else:
            directory, name = os.path.split(path.rstrip("/"))
            restored = load_checkpoint(directory or ".", name)
            self.params = restored["params"]
        self.params = shard_params(self.mesh, self.params)


def np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


def _cast_leaf_bf16(x):
    return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x


@jax.jit
def _cast_tree_bf16(params):
    return jax.tree_util.tree_map(_cast_leaf_bf16, params)


def cast_params_bf16(params):
    """f32 leaves -> bf16: the serving convention (no optimizer state ->
    no f32 masters needed; halves per-forward HBM weight traffic and
    resident memory).  Shared by bench.py and cli/serve.py so the
    convention cannot fork.

    Host (numpy) trees cast in-place on host — the cheap path, and the
    one that also halves a subsequent device upload.  Device trees cast
    in ONE jitted dispatch: an eager per-leaf ``astype`` would pay a
    synchronous round trip per leaf on remote/tunneled chips
    (docs/kernels.md "Dispatch anatomy")."""
    leaves = jax.tree_util.tree_leaves(params)
    if all(isinstance(l, np.ndarray) for l in leaves):
        return jax.tree_util.tree_map(_cast_leaf_bf16, params)
    return _cast_tree_bf16(params)
