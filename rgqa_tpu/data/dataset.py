"""GQA / RGQA datasets: question splits, answer vocab, encoded arrays.

TPU-first redesign of the reference data path (``src/tasks/gqa_data.py``):

- questions tokenized **once** at dataset-encode time into fixed-shape
  int32 arrays — no per-batch host WordPiece (the reference re-tokenizes
  every batch, ``src/lxrt/entry.py:109-120``);
- image features come from :class:`rgqa_tpu.data.tsv.PackedFeatures`
  memory-maps, joined by row index;
- targets stay sparse ``(label_idx, label_score)`` per question and are
  scattered into the dense ``(B, num_answers)`` matrix at batch build.

The UQ convention follows ``gqa_conf.get_tuple`` (``gqa_conf.py:34-58``):
``add_uq`` appends an ``'UQ'`` answer class; training targets are built
over ``num_answers`` columns and the trainer slices off the last column
(``target[:, :-1]``) while using it as the ID-row indicator.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Optional, Sequence

import numpy as np

from rgqa_tpu.data.tokenizer import WordPieceTokenizer
from rgqa_tpu.data.tsv import PackedFeatures
from rgqa_tpu.models.uniter import uniter_box_transform

__all__ = [
    "GQADataset",
    "EncodedGQA",
    "normalize_boxes",
    "build_targets",
    "UQ_ANSWER",
    "MAX_LABELS",
]

UQ_ANSWER = "UQ"
MAX_LABELS = 8  # GQA labels are near-singleton; 8 covers VQA's 10-way votes


class GQADataset:
    """Question splits + answer vocabulary (reference ``gqa_data.py:25-67``).

    ``splits`` is a comma-separated list; each resolves to
    ``<root>/<split>.json`` holding rows
    ``{img_id, question_id, sent[, label: {ans: score}]}``.
    """

    def __init__(
        self,
        root: str,
        splits: str,
        *,
        add_uq: bool = False,
        vocab_dir: Optional[str] = None,
    ):
        self.name = splits
        self.splits = splits.split(",")
        self.data: list[dict] = []
        for split in self.splits:
            with open(os.path.join(root, f"{split}.json")) as f:
                self.data.extend(json.load(f))
        self.id2datum = {d["question_id"]: d for d in self.data}

        vdir = vocab_dir or root
        with open(os.path.join(vdir, "trainval_ans2label.json")) as f:
            self.ans2label: dict[str, int] = json.load(f)
        with open(os.path.join(vdir, "trainval_label2ans.json")) as f:
            self.label2ans: list[str] = json.load(f)
        assert len(self.ans2label) == len(self.label2ans)

        if add_uq and UQ_ANSWER not in self.ans2label:
            # gqa_conf.py:36-39 — UQ becomes the last answer class.
            self.ans2label = dict(self.ans2label)
            self.ans2label[UQ_ANSWER] = len(self.ans2label)
            self.label2ans = list(self.label2ans) + [UQ_ANSWER]
        self.num_answers = len(self.ans2label)

    def __len__(self) -> int:
        return len(self.data)

    @classmethod
    def from_rows(
        cls,
        rows: list[dict],
        *,
        ans2label: Mapping[str, int],
        label2ans: Sequence[str],
        name: str = "in_memory",
    ) -> "GQADataset":
        """In-memory dataset over already-loaded rows (reference
        ``GQADataset_v2``, ``gqa_data.py:70-108``) — used by the
        distillation candidate pipeline."""
        ds = cls.__new__(cls)
        ds.name = name
        ds.splits = [name]
        ds.data = list(rows)
        ds.id2datum = {d["question_id"]: d for d in ds.data}
        ds.ans2label = dict(ans2label)
        ds.label2ans = list(label2ans)
        ds.num_answers = len(ds.ans2label)
        return ds

    @property
    def qid2label(self) -> dict[str, Mapping[str, float]]:
        return {
            d["question_id"]: d.get("label", {}) for d in self.data
        }


def normalize_boxes(boxes: np.ndarray, img_h: float, img_w: float) -> np.ndarray:
    """Pixel (x1,y1,x2,y2) -> [0,1] (reference ``gqa_data.py:194-200``)."""
    out = np.asarray(boxes, np.float32).copy()
    out[..., (0, 2)] /= img_w
    out[..., (1, 3)] /= img_h
    return np.clip(out, 0.0, 1.0)


def build_targets(
    label_idx: np.ndarray,
    label_score: np.ndarray,
    num_answers: int,
) -> np.ndarray:
    """Scatter sparse (B, MAX_LABELS) labels into a dense (B, A) target."""
    b = label_idx.shape[0]
    target = np.zeros((b, num_answers), np.float32)
    rows = np.repeat(np.arange(b), label_idx.shape[1])
    cols = label_idx.reshape(-1)
    vals = label_score.reshape(-1)
    keep = cols >= 0
    target[rows[keep], cols[keep]] = vals[keep]
    return target


class EncodedGQA:
    """A dataset fully encoded into fixed-shape arrays.

    Fields (all numpy, length N):
      - ``question_ids``: list[str]
      - ``input_ids / input_mask / segment_ids``: (N, T) int32 (BERT-style
        backbones) or ``token_ids``: (N, 40) int32 (BUTD)
      - ``img_row``: (N,) int32 — row into the feature pack
      - ``label_idx``: (N, MAX_LABELS) int32 (-1 = empty)
      - ``label_score``: (N, MAX_LABELS) float32

    Vision features stay in the memory-mapped pack; per-image boxes are
    precomputed once (normalized 4-d, or the UNITER 7-d pixel transform).
    """

    def __init__(
        self,
        dataset: GQADataset,
        features: PackedFeatures,
        *,
        tokenizer: Optional[WordPieceTokenizer] = None,
        max_text_len: int = 20,
        backbone: str = "lxmert",
        butd_word2idx: Optional[Mapping[str, int]] = None,
        drop_missing_images: bool = True,
        image2caps: Optional[Mapping[str, Sequence[str]]] = None,
        keep_uq_target: bool = False,
        image_source=None,  # GQAImageSource/PixelPack for pixel backbones
        pixel_wire: str = "f32",  # "u8": ship uint8 + rect, normalize in-jit
        pixel_patch_size: int = 32,  # for the rect-derived pad-patch mask
    ):
        self.keep_uq_target = keep_uq_target
        self.image_source = image_source
        if pixel_wire not in ("f32", "u8"):
            raise ValueError(f"pixel_wire must be f32|u8, got {pixel_wire!r}")
        self.pixel_wire = pixel_wire
        self.pixel_patch_size = pixel_patch_size
        # Train-time photometric augmentation (reference ViLT
        # pixelbert_randaug): set by the runner on TRAIN encodings only;
        # None keeps image loads deterministic (every eval surface).
        self.image_augment_rng = None
        self.dataset = dataset
        self.features = features
        self.backbone = backbone
        self.num_answers = dataset.num_answers

        data = [
            d
            for d in dataset.data
            if (d["img_id"] in features) or not drop_missing_images
        ]
        n = len(data)
        self.question_ids = [d["question_id"] for d in data]
        sents = [self._sent(d) for d in data]

        if backbone == "butd":
            from rgqa_tpu.models.butd import tokenize_front_padded

            assert butd_word2idx is not None
            self.token_ids = tokenize_front_padded(sents, butd_word2idx)
        elif image2caps is not None:
            # Q-C caption matching (reference GQACaptionDataset,
            # ``gqa_data.py:402-491``): pair-encode (caption, question).
            assert tokenizer is not None
            caps = [
                " ".join(image2caps.get(d["img_id"], [""])[:1]) for d in data
            ]
            self.input_ids, self.input_mask, self.segment_ids = (
                tokenizer.encode_batch(caps, max_text_len, text_pairs=sents)
            )
        else:
            assert tokenizer is not None
            self.input_ids, self.input_mask, self.segment_ids = (
                tokenizer.encode_batch(sents, max_text_len)
            )

        # TreeMix constituency candidates (reference keeps 'parse' strings
        # in the rows, gqa_data.py:203-228; spliced per batch on the host,
        # gqa_mixup_both.py:47-77).  Precomputed here ONCE into fixed-shape
        # wordpiece-coordinate arrays so the splice runs on device.
        # (BUTD's front-padded word-index encoding has different
        # coordinates; treemix falls back to random windows there.)
        self.parse_spans = None
        self.parse_span_words = None
        self.parse_n_words = None
        if backbone != "butd" and image2caps is None and any(
            d.get("parse") for d in data
        ):
            from rgqa_tpu.data.parse import encode_parse_spans

            (
                self.parse_spans,
                self.parse_span_words,
                self.parse_n_words,
            ) = encode_parse_spans(
                [d.get("parse") for d in data], sents, tokenizer, max_text_len
            )

        self.img_row = np.asarray(
            [features.index[d["img_id"]] for d in data], np.int32
        )
        self.label_idx = np.full((n, MAX_LABELS), -1, np.int32)
        self.label_score = np.zeros((n, MAX_LABELS), np.float32)
        for i, d in enumerate(data):
            label = d.get("label") or {}
            j = 0
            for ans, score in label.items():
                if ans in dataset.ans2label and j < MAX_LABELS:
                    self.label_idx[i, j] = dataset.ans2label[ans]
                    self.label_score[i, j] = score
                    j += 1

        # Precompute per-image position features once per *pack* (cached on
        # the PackedFeatures object — multiple splits share the same pack).
        kind = "uniter7" if backbone == "uniter" else "norm4"
        cache = getattr(features, "_box_cache", None)
        if cache is None:
            cache = {}
            try:
                features._box_cache = cache
            except AttributeError:
                pass
        if kind not in cache:
            if kind == "uniter7":
                cache[kind] = uniter_box_transform(
                    np.asarray(features.boxes)
                ).astype(np.float32)
            else:
                sizes = np.asarray(features.sizes, np.float32)  # (N, 2) h,w
                boxes = np.asarray(features.boxes, np.float32).copy()
                boxes[:, :, (0, 2)] /= sizes[:, None, 1:2]
                boxes[:, :, (1, 3)] /= sizes[:, None, 0:1]
                cache[kind] = np.clip(boxes, 0.0, 1.0)
        self.img_boxes = cache[kind]
        assert self.img_boxes.shape[0] == len(features)

    @staticmethod
    def _sent(datum: dict) -> str:
        return datum.get("sent") or datum.get("question", "")

    def __len__(self) -> int:
        return len(self.question_ids)

    def gather_batch(self, idx: np.ndarray, *, with_target: bool = True) -> dict:
        """Materialize a dense host batch for row indices ``idx``."""
        batch: dict = {}
        if self.backbone == "butd":
            batch["token_ids"] = self.token_ids[idx]
        else:
            batch["input_ids"] = self.input_ids[idx]
            batch["input_mask"] = self.input_mask[idx]
            batch["segment_ids"] = self.segment_ids[idx]
        if self.parse_spans is not None:
            batch["parse_spans"] = self.parse_spans[idx]
            batch["parse_span_words"] = self.parse_span_words[idx]
            batch["parse_n_words"] = self.parse_n_words[idx]
        rows = self.img_row[idx]
        if self.backbone == "vilt":
            ids = [self.features.img_ids[r] for r in rows]
            aug_rng = self.image_augment_rng
            if self.pixel_wire == "u8":
                # uint8 wire: pixels stay uint8 end-to-end on host; the
                # forward adapter normalizes in-jit (zero quantization
                # error, 1/4 the f32 wire bytes) and the pad-patch mask
                # ships as geometry.
                from rgqa_tpu.data.images import (
                    load_image_batch_u8, rect_patch_mask,
                )

                u8, rects = load_image_batch_u8(
                    self.image_source, ids, rng=aug_rng
                )
                batch["pixels_u8"] = u8
                batch["pixel_rect"] = rects
                batch["pixel_mask"] = rect_patch_mask(
                    rects, self.image_source.size, self.pixel_patch_size
                )
            else:
                from rgqa_tpu.data.images import load_image_batch

                batch["pixels"] = load_image_batch(
                    self.image_source, ids, rng=aug_rng
                )
        else:
            batch["feats"] = np.asarray(self.features.features[rows], np.float32)
            batch["boxes"] = self.img_boxes[rows]
        if with_target:
            target = build_targets(
                self.label_idx[idx], self.label_score[idx], self.num_answers
            )
            # Trainers over the UQ-extended vocab slice the UQ column off
            # and use it as the ID indicator (gqa_conf.py:152, gqa_energy.py:122)
            # — unless UQ is trained as a real class (gqa.py get_tuple_uq).
            if (
                not self.keep_uq_target
                and self.dataset.label2ans
                and self.dataset.label2ans[-1] == UQ_ANSWER
            ):
                batch["target"] = target[:, :-1]
                batch["id_mask"] = (target[:, -1] == 0).astype(np.float32)
            else:
                batch["target"] = target
                batch["id_mask"] = np.ones((len(idx),), np.float32)
        return batch
