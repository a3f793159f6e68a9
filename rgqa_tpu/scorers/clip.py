"""CLIP image-question similarity scorers.

Rebuild of the CLIP rejection score (``src/tasks/gqa_clip.py:76-110``:
``logits_per_image / logit_scale.exp()`` = cosine similarity of image and
question embeddings) and the CLIP-weighted loss helper
(``src/tasks/gqa_weight.py:80-128``).

The reference downloads ``openai/clip-vit-base-patch32`` from the Hub; in
a zero-egress environment weights must already exist locally, so the model
path is explicit and loading is lazy.  For pipelines that only need *a*
similarity scorer (tests, synthetic runs), any callable
``(images, texts) -> scores`` plugs in.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["ClipScorer", "clip_loss_weights"]


class ClipScorer:
    """Image-text similarity via a local HF CLIP checkpoint."""

    def __init__(self, model_path: str = "openai/clip-vit-base-patch32"):
        try:
            from transformers import CLIPModel, CLIPProcessor

            self.model = CLIPModel.from_pretrained(
                model_path, local_files_only=True
            )
            self.processor = CLIPProcessor.from_pretrained(
                model_path, local_files_only=True
            )
        except Exception as e:  # no local weights in zero-egress envs
            raise RuntimeError(
                "CLIP weights not available locally; download "
                f"{model_path!r} beforehand or inject a custom scorer"
            ) from e
        self.model.eval()

    def scores(self, images, texts: Sequence[str]) -> np.ndarray:
        """Cosine similarity per (image, text) pair
        (``gqa_clip.py:96-104``: logits_per_image / logit_scale.exp())."""
        import torch

        inputs = self.processor(
            text=list(texts), images=images, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            out = self.model(**inputs)
            sim = out.logits_per_image / self.model.logit_scale.exp()
        return sim.diagonal().cpu().numpy()


def clip_loss_weights(
    similarities: np.ndarray, temperature: float = 1.0
) -> np.ndarray:
    """Per-sample loss weights from CLIP similarity
    (``gqa_weight.py``): softmax-normalized within the batch, scaled so the
    mean weight is 1 (keeps the loss magnitude comparable)."""
    s = np.asarray(similarities, np.float64) / temperature
    e = np.exp(s - s.max())
    w = e / e.sum()
    return (w * len(w)).astype(np.float32)
