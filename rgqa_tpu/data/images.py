"""Raw-image pipeline for ViLT / CLIP paths.

Rebuild of the reference image datasets (``GQAImageDataset``
``gqa_data.py:253-330``, ``GQAViLTDataset`` :333-399) and the pixelbert
transform (``src/vilt/transforms``): load JPEGs, resize so the longer side
is ``size`` (ViLT pads to square at batch time — here shapes stay static
by center-padding each image to (size, size)), normalize to [-1, 1]
(pixelbert's ``inception_normalize``: (x - 0.5) / 0.5).

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


def _resize_keep_ratio(img, size: int):
    from PIL import Image

    w, h = img.size
    scale = size / max(w, h)
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
    img, size: int = 384, *, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """PIL image -> (size, size, 3) float32 in [-1, 1], center-padded."""
    img = img.convert("RGB")
    if rng is not None:
        img = randaug(img, rng)
    img = _resize_keep_ratio(img, size)
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    h, w = arr.shape[:2]
    out = np.zeros((size, size, 3), np.float32)
    top, left = (size - h) // 2, (size - w) // 2
    out[top : top + h, left : left + w] = arr
    return out


class GQAImageSource:
    """Image loader keyed by img_id (reference GQAImageDataset)."""

    def __init__(self, img_root: str, size: int = 384):
        self.img_root = img_root
        self.size = size

    def path(self, img_id: str) -> str:
        return os.path.join(self.img_root, f"{img_id}.jpg")

    def __contains__(self, img_id: str) -> bool:
        return os.path.exists(self.path(img_id))

    def load(self, img_id: str, *, rng=None) -> np.ndarray:
        from PIL import Image

        with Image.open(self.path(img_id)) as img:
            return pixelbert_transform(img, self.size, rng=rng)


def load_image_batch(
    source: GQAImageSource, img_ids: Sequence[str], *, rng=None
) -> np.ndarray:
    return np.stack([source.load(i, rng=rng) for i in img_ids])
