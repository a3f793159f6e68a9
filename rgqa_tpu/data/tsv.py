"""Faster-RCNN object-feature TSV decoding and packing.

The reference streams features from the bottom-up-attention TSV format
(``src/utils.py:12-54``): rows of
``[img_id, img_h, img_w, objects_id, objects_conf, attrs_id, attrs_conf,
num_boxes, boxes, features]`` with base64-encoded numpy payloads, decoded on
every startup (minutes of host time per run).

The TPU-first design decodes **once** and packs everything into contiguous
``.npy`` arrays under a directory (``pack_obj_tsv``), after which startup is
a memory-map.  A native C++ decoder (``rgqa_tpu.native``) accelerates the
one-time conversion when built; the numpy path below is the portable
fallback and the correctness reference.
"""

from __future__ import annotations

import base64
import csv
import json
import os
import sys
import time
from typing import Iterator

import numpy as np

__all__ = ["OBJ_TSV_FIELDS", "load_obj_tsv", "iter_obj_tsv", "pack_obj_tsv", "PackedFeatures"]

OBJ_TSV_FIELDS = [
    "img_id",
    "img_h",
    "img_w",
    "objects_id",
    "objects_conf",
    "attrs_id",
    "attrs_conf",
    "num_boxes",
    "boxes",
    "features",
]

_B64_SPECS = {
    # field -> (dtype, per-box width; None = scalar per box)
    "objects_id": (np.int64, None),
    "objects_conf": (np.float32, None),
    "attrs_id": (np.int64, None),
    "attrs_conf": (np.float32, None),
    "boxes": (np.float32, 4),
    "features": (np.float32, -1),  # -1: infer feature dim from payload
}


def _decode_row(row: dict) -> dict:
    n = int(row["num_boxes"])
    out = {
        "img_id": row["img_id"],
        "img_h": int(row["img_h"]),
        "img_w": int(row["img_w"]),
        "num_boxes": n,
    }
    for field, (dtype, width) in _B64_SPECS.items():
        buf = np.frombuffer(base64.b64decode(row[field]), dtype=dtype)
        if width is None:
            arr = buf.reshape(n)
        elif width == -1:
            arr = buf.reshape(n, -1)
        else:
            arr = buf.reshape(n, width)
        arr = np.array(arr)  # writable copy
        arr.setflags(write=False)
        out[field] = arr
    return out


def iter_obj_tsv(path: str) -> Iterator[dict]:
    """Stream decoded rows from a bottom-up-attention TSV file."""
    csv.field_size_limit(sys.maxsize)
    with open(path, newline="") as f:
        for row in csv.DictReader(f, OBJ_TSV_FIELDS, delimiter="\t"):
            yield _decode_row(row)


def load_obj_tsv(path: str, topk: int | None = None) -> list[dict]:
    """Load (up to ``topk``) decoded rows; mirrors ``src/utils.py:16-54``."""
    start = time.time()
    data = []
    for i, row in enumerate(iter_obj_tsv(path)):
        data.append(row)
        if topk is not None and len(data) >= topk:
            break
    print(
        f"Loaded {len(data)} images from {path} in {time.time() - start:.1f}s",
        flush=True,
    )
    return data


class _DequantView:
    """f32 array view over an int8-quantized feature pack.

    Dequantizes per indexed access (``q * scale``), so the int8 arrays
    stay memory-mapped at rest — consumers index it exactly like the f32
    ``features.npy`` memmap it replaces."""

    def __init__(self, q, scale):
        self.q, self.scale = q, scale
        self.shape = q.shape
        self.dtype = np.dtype(np.float32)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        q = np.asarray(self.q[idx], np.float32)
        s = np.asarray(self.scale[idx], np.float32)
        return q * s[..., None]


class PackedFeatures:
    """Memory-mapped packed object features keyed by image id.

    Layout on disk (directory):
      - ``features.npy``  (N, num_boxes, feat_dim) float32 — OR, for an
        int8 pack (``prepare_data --int8``, quarter the bytes at rest):
        ``features_q.npy`` (N, num_boxes, feat_dim) int8 +
        ``features_scale.npy`` (N, num_boxes) float32, per-RoI symmetric
        quantization (:func:`rgqa_tpu.data.batching.quantize_feats`);
        ``.features`` then reads through a dequantizing f32 view
      - ``boxes.npy``     (N, num_boxes, 4) float32 (absolute pixel coords)
      - ``objects_id.npy``/``objects_conf.npy``/``attrs_id.npy``/
        ``attrs_conf.npy`` (N, num_boxes)
      - ``sizes.npy``     (N, 2) int32 — (img_h, img_w)
      - ``img_ids.json``  list of image-id strings (row order)
    """

    ARRAYS = ("features", "boxes", "objects_id", "objects_conf", "attrs_id", "attrs_conf", "sizes")

    def __init__(self, directory: str):
        self.directory = directory
        with open(os.path.join(directory, "img_ids.json")) as f:
            self.img_ids: list[str] = json.load(f)
        self.index = {img_id: i for i, img_id in enumerate(self.img_ids)}
        self.int8 = not os.path.exists(
            os.path.join(directory, "features.npy")
        ) and os.path.exists(os.path.join(directory, "features_q.npy"))
        for name in self.ARRAYS:
            if name == "features" and self.int8:
                continue
            setattr(
                self,
                name,
                np.load(os.path.join(directory, f"{name}.npy"), mmap_mode="r"),
            )
        if self.int8:
            self.features_q = np.load(
                os.path.join(directory, "features_q.npy"), mmap_mode="r"
            )
            self.features_scale = np.load(
                os.path.join(directory, "features_scale.npy"), mmap_mode="r"
            )
            self.features = _DequantView(self.features_q, self.features_scale)

    def __len__(self) -> int:
        return len(self.img_ids)

    def __contains__(self, img_id: str) -> bool:
        return img_id in self.index

    def truncate(self, topk: int) -> "PackedFeatures":
        """A view over the first ``topk`` images — the ``--tiny`` (512) /
        ``--fast`` (5000) smoke modes (reference ``gqa_data.py:21-22``)."""
        if topk >= len(self.img_ids):
            return self
        view = object.__new__(PackedFeatures)
        view.directory = self.directory
        view.img_ids = self.img_ids[:topk]
        view.index = {img_id: i for i, img_id in enumerate(view.img_ids)}
        view.int8 = self.int8
        for name in self.ARRAYS:
            if name == "features" and self.int8:
                continue
            setattr(view, name, getattr(self, name)[:topk])
        if self.int8:
            view.features_q = self.features_q[:topk]
            view.features_scale = self.features_scale[:topk]
            view.features = _DequantView(view.features_q, view.features_scale)
        return view

    def row(self, img_id: str) -> dict:
        i = self.index[img_id]
        return {
            "img_id": img_id,
            "img_h": int(self.sizes[i, 0]),
            "img_w": int(self.sizes[i, 1]),
            "features": self.features[i],
            "boxes": self.boxes[i],
            "objects_id": self.objects_id[i],
            "objects_conf": self.objects_conf[i],
            "attrs_id": self.attrs_id[i],
            "attrs_conf": self.attrs_conf[i],
        }


def _save_features(out_dir: str, features: np.ndarray, int8: bool) -> None:
    """Write the feature array — f32, or per-RoI int8 + scales
    (``--int8``: quarter the bytes at rest; the transport quantization
    ``--feed_int8`` applies to a f32 feed round-trips to the same ints)."""
    # Remove the opposite format's files first: re-packing into a
    # directory that held the other layout must not leave stale arrays
    # behind (PackedFeatures prefers features.npy when both exist).
    stale = (
        ("features_q.npy", "features_scale.npy") if not int8
        else ("features.npy",)
    )
    for name in stale:
        path = os.path.join(out_dir, name)
        if os.path.exists(path):
            os.remove(path)
    if not int8:
        np.save(os.path.join(out_dir, "features.npy"), features)
        return
    from rgqa_tpu.data.batching import quantize_feats

    q, scale = quantize_feats(np.asarray(features, np.float32))
    np.save(os.path.join(out_dir, "features_q.npy"), q)
    np.save(os.path.join(out_dir, "features_scale.npy"), scale)


def pack_obj_tsv(
    tsv_path: str,
    out_dir: str,
    topk: int | None = None,
    num_boxes: int = 36,
    feat_dim: int | None = None,
    use_native: bool = True,
    int8: bool = False,
) -> PackedFeatures:
    """One-time TSV → packed-array conversion (the offline converter).

    Rows with a different box count than ``num_boxes`` are padded/truncated
    to the fixed shape (the RGQA pipeline always uses 36 RoIs).  Uses the
    native C++ decoder (``rgqa_tpu.native``) when buildable; the numpy
    path below is the portable fallback and correctness reference.

    ``int8`` stores features as per-RoI int8 + f32 scales (4x smaller at
    rest; ``PackedFeatures.features`` dequantizes on access).  Intended
    for serving/eval deployments — the ~0.4% per-element quantization
    error applies to EVERYTHING read from the pack, unlike the
    transport-only ``--feed_int8``.
    """
    if use_native:
        try:
            from rgqa_tpu import native

            if feat_dim is None:
                first = next(iter_obj_tsv(tsv_path))
                feat_dim = first["features"].shape[1]
            arrays = native.decode_obj_tsv_native(
                tsv_path, topk=topk, num_boxes=num_boxes, feat_dim=feat_dim
            )
            img_ids = arrays.pop("img_ids")
            os.makedirs(out_dir, exist_ok=True)
            _save_features(out_dir, arrays.pop("features"), int8)
            for name, arr in arrays.items():
                np.save(os.path.join(out_dir, f"{name}.npy"), arr)
            with open(os.path.join(out_dir, "img_ids.json"), "w") as f:
                json.dump(img_ids, f)
            return PackedFeatures(out_dir)
        except Exception as e:
            print(f"native TSV decoder unavailable ({e}); using numpy path")

    rows = []
    for i, row in enumerate(iter_obj_tsv(tsv_path)):
        rows.append(row)
        if topk is not None and len(rows) >= topk:
            break
    if not rows:
        raise ValueError(f"no rows decoded from {tsv_path}")

    n = len(rows)
    feat_dim = rows[0]["features"].shape[1]
    features = np.zeros((n, num_boxes, feat_dim), dtype=np.float32)
    boxes = np.zeros((n, num_boxes, 4), dtype=np.float32)
    objects_id = np.zeros((n, num_boxes), dtype=np.int64)
    objects_conf = np.zeros((n, num_boxes), dtype=np.float32)
    attrs_id = np.zeros((n, num_boxes), dtype=np.int64)
    attrs_conf = np.zeros((n, num_boxes), dtype=np.float32)
    sizes = np.zeros((n, 2), dtype=np.int32)
    img_ids = []
    for i, row in enumerate(rows):
        k = min(row["num_boxes"], num_boxes)
        features[i, :k] = row["features"][:k]
        boxes[i, :k] = row["boxes"][:k]
        objects_id[i, :k] = row["objects_id"][:k]
        objects_conf[i, :k] = row["objects_conf"][:k]
        attrs_id[i, :k] = row["attrs_id"][:k]
        attrs_conf[i, :k] = row["attrs_conf"][:k]
        sizes[i] = (row["img_h"], row["img_w"])
        img_ids.append(row["img_id"])

    os.makedirs(out_dir, exist_ok=True)
    _save_features(out_dir, features, int8)
    for name, arr in [
        ("boxes", boxes),
        ("objects_id", objects_id),
        ("objects_conf", objects_conf),
        ("attrs_id", attrs_id),
        ("attrs_conf", attrs_conf),
        ("sizes", sizes),
    ]:
        np.save(os.path.join(out_dir, f"{name}.npy"), arr)
    with open(os.path.join(out_dir, "img_ids.json"), "w") as f:
        json.dump(img_ids, f)
    return PackedFeatures(out_dir)
