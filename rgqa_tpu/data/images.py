"""Raw-image pipeline for ViLT / CLIP paths.

Rebuild of the reference image datasets (``GQAImageDataset``
``gqa_data.py:253-330``, ``GQAViLTDataset`` :333-399) and the pixelbert
transform (``src/vilt/transforms/pixelbert.py``): load JPEGs, resize,
normalize to [-1, 1] (pixelbert's ``inception_normalize``:
(x - 0.5) / 0.5).

The reference resizes the SHORTER side to ``size`` (longer capped at
size*1333/800, floored to /32) and zero-pads each *batch* to its max
H/W (``gqa_data.py:385-399``) — dynamic shapes.  Here shapes stay static
(one compiled program) with two modes, quantified in
``docs/vilt_images.md``:

- ``mode="pad"`` (default): longer side -> ``size``, center-pad to
  (size, size).  Keeps the whole image; objects render ~25-33% smaller
  than the reference checkpoints saw; pad patches are masked out of
  attention by the model (``ViltForGQA.patch_valid_mask``).
- ``mode="crop"``: shorter side -> ``size``, center crop.  Exact
  reference patch scale and zero pad patches, at the cost of the
  off-center crop margin (typically 25% of the longer side).

RandAugment (the ``pixelbert_randaug`` train transform) is a light
PIL-based subset: the train-time policy samples from
{identity, rotate, brightness, contrast, sharpness, posterize} — the ops
that apply to VQA images (no geometric shears that would break RoI
alignment assumptions).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "pixelbert_transform",
    "pixelbert_u8",
    "pixelbert_normalize",
    "rect_patch_mask",
    "load_image_batch",
    "load_image_batch_u8",
    "GQAImageSource",
    "PixelPack",
    "pack_pixels",
    "randaug",
]


def _resize_keep_ratio(img, size: int, *, by: str = "longer"):
    from PIL import Image

    w, h = img.size
    scale = size / (max(w, h) if by == "longer" else min(w, h))
    return img.resize(
        (max(1, int(round(w * scale))), max(1, int(round(h * scale)))),
        Image.BICUBIC,
    )


def randaug(img, rng: np.random.Generator, n_ops: int = 2):
    """Light RandAugment over photometric PIL ops."""
    from PIL import ImageEnhance, ImageOps

    ops = [
        lambda im, m: im,
        lambda im, m: im.rotate(m * 10 - 5),
        lambda im, m: ImageEnhance.Brightness(im).enhance(0.7 + 0.6 * m),
        lambda im, m: ImageEnhance.Contrast(im).enhance(0.7 + 0.6 * m),
        lambda im, m: ImageEnhance.Sharpness(im).enhance(0.7 + 0.6 * m),
        lambda im, m: ImageOps.posterize(im, 4 + int(m * 4)),
    ]
    for _ in range(n_ops):
        op = ops[int(rng.integers(len(ops)))]
        img = op(img, float(rng.random()))
    return img


def pixelbert_u8(
    img,
    size: int = 384,
    *,
    rng: Optional[np.random.Generator] = None,
    mode: str = "pad",
) -> tuple[np.ndarray, np.ndarray]:
    """PIL image -> ``(u8 (size, size, 3), rect (4,) int32)``.

    The decode-side half of :func:`pixelbert_transform`: resize (+
    optional randaug) but NO normalization — pixels stay uint8, the
    exact wire/at-rest form (4x smaller than f32, 2x smaller than bf16).
    ``rect = (top, left, h, w)`` marks the real-pixel rectangle; pad
    bytes are zero but the *normalize* must zero them (a uint8 can't
    represent the post-normalize 0.0 — it sits at 127.5/255), so the
    rect travels with the pixels and the consumer re-zeros in-jit
    (:func:`rgqa_tpu.ops.pixels.pixelbert_normalize_jnp`).
    """
    img = img.convert("RGB")
    if rng is not None:
        img = randaug(img, rng)
    if mode not in ("pad", "crop"):
        raise ValueError(f"mode must be pad|crop, got {mode!r}")
    img = _resize_keep_ratio(
        img, size, by="longer" if mode == "pad" else "shorter"
    )
    arr = np.asarray(img, np.uint8)
    h, w = arr.shape[:2]
    if mode == "crop":
        top, left = (h - size) // 2, (w - size) // 2
        out = arr[top : top + size, left : left + size]
        return out, np.asarray([0, 0, size, size], np.int32)
    out = np.zeros((size, size, 3), np.uint8)
    top, left = (size - h) // 2, (size - w) // 2
    out[top : top + h, left : left + w] = arr
    return out, np.asarray([top, left, h, w], np.int32)


def pixelbert_normalize(u8: np.ndarray, rect: np.ndarray) -> np.ndarray:
    """Host inverse of the u8 split: uint8 + rect -> float32 in [-1, 1]
    with pad pixels exactly 0.0 (inception_normalize + zero pad).  The
    in-jit twin lives in ``rgqa_tpu.ops.pixels``; both compute
    ``(u8/255 - 0.5) / 0.5`` in f32, so the u8 wire adds zero
    quantization error (<= 1-ulp jit reassociation only; see
    ops/pixels.py)."""
    arr = (np.asarray(u8, np.float32) / 255.0 - 0.5) / 0.5
    size = arr.shape[-3]
    top, left, h, w = (int(v) for v in rect)
    if (top, left, h, w) != (0, 0, size, size):
        mask = np.zeros(arr.shape[:-1] + (1,), np.float32)
        mask[..., top : top + h, left : left + w, :] = 1.0
        arr = arr * mask
    return arr


def pixelbert_transform(
    img,
    size: int = 384,
    *,
    rng: Optional[np.random.Generator] = None,
    mode: str = "pad",
) -> np.ndarray:
    """PIL image -> (size, size, 3) float32 in [-1, 1].

    ``mode="pad"``: longer side -> size, center-pad with zeros (the
    model masks pad patches).  ``mode="crop"``: shorter side -> size
    (the reference MinMaxResize scale), center crop — every pixel real.
    """
    u8, rect = pixelbert_u8(img, size, rng=rng, mode=mode)
    return pixelbert_normalize(u8, rect)


def rect_patch_mask(
    rects: np.ndarray, size: int, patch_size: int
) -> np.ndarray:
    """(B, 4) rects -> (B, n_patches) uint8 patch-validity mask.

    A patch is valid iff it intersects the real-pixel rect — exactly
    ``ViltForGQA.patch_valid_mask``'s content rule (any pixel of the
    patch real), computed from geometry instead of pixel values so the
    quantized wire never has to reconstruct it (pinned equal in
    tests/test_images.py)."""
    rects = np.asarray(rects, np.int64).reshape(-1, 4)
    n = size // patch_size
    grid = np.arange(n) * patch_size  # patch start coordinates
    top, left, h, w = rects[:, 0:1], rects[:, 1:2], rects[:, 2:3], rects[:, 3:4]
    # patch [g, g+p) intersects [a, a+l) iff g < a+l and g+p > a
    rows = (grid[None, :] < top + h) & (grid[None, :] + patch_size > top)
    cols = (grid[None, :] < left + w) & (grid[None, :] + patch_size > left)
    return (rows[:, :, None] & cols[:, None, :]).reshape(
        len(rects), n * n
    ).astype(np.uint8)


class GQAImageSource:
    """Image loader keyed by img_id (reference GQAImageDataset)."""

    def __init__(self, img_root: str, size: int = 384, mode: str = "pad"):
        self.img_root = img_root
        self.size = size
        self.mode = mode

    def path(self, img_id: str) -> str:
        return os.path.join(self.img_root, f"{img_id}.jpg")

    def __contains__(self, img_id: str) -> bool:
        return os.path.exists(self.path(img_id))

    def load(self, img_id: str, *, rng=None) -> np.ndarray:
        from PIL import Image

        with Image.open(self.path(img_id)) as img:
            return pixelbert_transform(img, self.size, rng=rng, mode=self.mode)

    def load_u8(self, img_id: str, *, rng=None):
        from PIL import Image

        with Image.open(self.path(img_id)) as img:
            return pixelbert_u8(img, self.size, rng=rng, mode=self.mode)


class PixelPack:
    """Pre-decoded uint8 pixel store (``prepare_data --pack_pixels``).

    The JPEG-decode + resize half of the pixelbert transform runs ONCE at
    pack time; serving reads (size, size, 3) uint8 rows straight off a
    memory-map (~440 KB/image at 384px vs ~25 ms/image of PIL work on a
    one-core host — the difference between host-decode-bound and
    wire-bound image serving, docs/kernels.md "Image production").
    Drop-in for :class:`GQAImageSource` (same load/load_u8/contains
    surface; ``rng`` is rejected — augmentation needs raw images).
    """

    def __init__(self, pack_dir: str):
        self.dir = pack_dir
        with open(os.path.join(pack_dir, "meta.json")) as f:
            meta = json.load(f)
        self.size = int(meta["size"])
        self.mode = meta["mode"]  # None for transforms without a mode (clip)
        # "pixelbert" (ViLT rows, pad/crop + rect) or "clip" (CLIP
        # shortest-edge resize + center crop; rect always full).
        self.transform = meta.get("transform", "pixelbert")
        # Absolute source image root the pack was built from — consumers
        # auto-detecting a pack must check it matches the images they
        # claim to score (a stale/foreign pack silently substituting
        # different bytes would be undetectable otherwise).
        self.img_root = meta.get("img_root")
        self.img_ids = meta["img_ids"]
        self.index = {g: i for i, g in enumerate(self.img_ids)}
        n = len(self.img_ids)
        self.pixels = np.memmap(
            os.path.join(pack_dir, "pixels_u8.bin"),
            np.uint8, "r", shape=(n, self.size, self.size, 3),
        )
        self.rects = np.memmap(
            os.path.join(pack_dir, "rects.bin"), np.int32, "r", shape=(n, 4)
        )

    def matches_source(self, image_root: str) -> bool:
        """True iff this pack was built from ``image_root``."""
        return self.img_root is not None and (
            os.path.abspath(image_root) == self.img_root
        )

    def __contains__(self, img_id: str) -> bool:
        return img_id in self.index

    def load_u8(self, img_id: str, *, rng=None):
        if rng is not None:
            raise ValueError(
                "PixelPack rows are pre-resized; train-time randaug needs "
                "a GQAImageSource over raw images"
            )
        row = self.index[img_id]
        return self.pixels[row], self.rects[row]

    def load(self, img_id: str, *, rng=None) -> np.ndarray:
        if self.transform != "pixelbert":
            raise ValueError(
                f"{self.transform!r} pack rows use their consumer's "
                "normalize (ClipScorer takes the uint8 rows directly); "
                "pixelbert_normalize does not apply"
            )
        return pixelbert_normalize(*self.load_u8(img_id, rng=rng))


def pack_pixels(
    img_root: str,
    out_dir: str,
    *,
    size: int = 384,
    mode: Optional[str] = "pad",
    transform: str = "pixelbert",
    img_ids: Optional[Sequence[str]] = None,
) -> PixelPack:
    """Decode every JPEG under ``img_root`` once into a :class:`PixelPack`.

    ``transform="pixelbert"`` stores ViLT rows (pad/crop + rect);
    ``"clip"`` stores CLIP rows (shortest-edge bicubic + center crop at
    ``size``, HF CLIPImageProcessor semantics) with a full rect — the
    decode-side half of the CLIP pipeline, consumed as uint8 by the
    jitted scorer."""
    if transform == "clip":
        mode = None  # clip has one geometry: shortest-edge + center crop
        from PIL import Image

        from rgqa_tpu.scorers.clip import clip_resize_crop

        def load_u8(img_id):
            with Image.open(
                os.path.join(img_root, f"{img_id}.jpg")
            ) as im:
                return (
                    clip_resize_crop(im, size),
                    np.asarray([0, 0, size, size], np.int32),
                )
    elif transform == "pixelbert":
        source = GQAImageSource(img_root, size=size, mode=mode)
        load_u8 = source.load_u8
    else:
        raise ValueError(f"transform must be pixelbert|clip, got {transform!r}")
    if img_ids is None:
        img_ids = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(img_root)
            if f.lower().endswith(".jpg")
        )
    img_ids = list(img_ids)
    os.makedirs(out_dir, exist_ok=True)
    px = np.memmap(
        os.path.join(out_dir, "pixels_u8.bin"),
        np.uint8, "w+", shape=(len(img_ids), size, size, 3),
    )
    rects = np.memmap(
        os.path.join(out_dir, "rects.bin"), np.int32, "w+",
        shape=(len(img_ids), 4),
    )
    for i, img_id in enumerate(img_ids):
        px[i], rects[i] = load_u8(img_id)
    px.flush()
    rects.flush()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {"size": size, "mode": mode, "transform": transform,
             "img_root": os.path.abspath(img_root), "img_ids": img_ids},
            f,
        )
    return PixelPack(out_dir)


def load_image_batch(
    source, img_ids: Sequence[str], *, rng=None
) -> np.ndarray:
    return np.stack([source.load(i, rng=rng) for i in img_ids])


def load_image_batch_u8(
    source, img_ids: Sequence[str], *, rng=None
) -> tuple[np.ndarray, np.ndarray]:
    """Batch of (pixels uint8 (B, S, S, 3), rects (B, 4)) — the wire form
    of the pixel feed (``--pixel_wire u8``)."""
    pairs = [source.load_u8(i, rng=rng) for i in img_ids]
    return (
        np.stack([p[0] for p in pairs]),
        np.stack([p[1] for p in pairs]),
    )
