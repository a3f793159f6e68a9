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

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["pixelbert_transform", "load_image_batch", "GQAImageSource", "randaug"]


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
    img = img.convert("RGB")
    if rng is not None:
        img = randaug(img, rng)
    if mode not in ("pad", "crop"):
        raise ValueError(f"mode must be pad|crop, got {mode!r}")
    img = _resize_keep_ratio(
        img, size, by="longer" if mode == "pad" else "shorter"
    )
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    h, w = arr.shape[:2]
    if mode == "crop":
        top, left = (h - size) // 2, (w - size) // 2
        return arr[top : top + size, left : left + size]
    out = np.zeros((size, size, 3), np.float32)
    top, left = (size - h) // 2, (size - w) // 2
    out[top : top + h, left : left + w] = arr
    return out


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


def load_image_batch(
    source: GQAImageSource, img_ids: Sequence[str], *, rng=None
) -> np.ndarray:
    return np.stack([source.load(i, rng=rng) for i in img_ids])
