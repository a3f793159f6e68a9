"""UNITER: single-stream text+image transformer.

Rebuild of the reference UNITER path (``src/uniter/modeling.py:560-655``,
``src/uniter/uniter.py``): text embeddings and RoI-feature embeddings (with
the 7-d box-geometry transform from ``src/tasks/gqa_data.py:240-250``) are
concatenated into one token stream through a 12-layer BERT encoder; pooled
CLS feeds the GQA answer head.  Reuses the shared transformer blocks — no
vendored BERT copy.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.lxmert import AnswerHead
from rgqa_tpu.models.transformer import (
    EncoderLayer,
    LayerNorm,
    Pooler,
    TextEmbeddings,
    dense_init,
    mask_to_bias,
)
from rgqa_tpu.ops.dropout import HiddenDropout

__all__ = ["UniterModel", "UniterForGQA", "uniter_box_transform"]


def uniter_box_transform(boxes: np.ndarray) -> np.ndarray:
    """(x1, y1, x2, y2) RoI boxes -> UNITER's 7-d position feature.

    Matches ``_uniterBoxes`` (reference ``gqa_data.py:240-250``) exactly,
    including its quirks: output columns are (y1, x1, y2, x2, w, h, w*h)
    — cols 4/5 really are x2-x1 then y2-y1 — and the reference feeds it
    *unnormalized pixel* boxes (the /img_w norm only runs on the non-UNITER
    branch, ``gqa_data.py:194-200``).
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    out = np.zeros(boxes.shape[:-1] + (7,), dtype=np.float32)
    out[..., 0] = boxes[..., 1]  # y1
    out[..., 1] = boxes[..., 0]  # x1
    out[..., 2] = boxes[..., 3]  # y2
    out[..., 3] = boxes[..., 2]  # x2
    out[..., 4] = out[..., 3] - out[..., 1]  # width  (x2 - x1)
    out[..., 5] = out[..., 2] - out[..., 0]  # height (y2 - y1)
    out[..., 6] = out[..., 4] * out[..., 5]  # area
    return out


class UniterImageEmbeddings(nn.Module):
    """RoI feature + 7-d position embeddings (``modeling.py:594-612``)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img_feat, img_pos, type_embeddings, *, deterministic=True):
        c = self.cfg
        im = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="img_linear",
            dtype=self.dtype,
        )(img_feat)
        im = LayerNorm(eps=c.layer_norm_eps, name="img_ln")(im)
        pos = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="pos_linear",
            dtype=self.dtype,
        )(img_pos)
        pos = LayerNorm(eps=c.layer_norm_eps, name="pos_ln")(pos)
        x = im + pos + type_embeddings
        x = LayerNorm(eps=c.layer_norm_eps, name="ln")(x)
        return HiddenDropout(c.hidden_dropout)(x, deterministic=deterministic)


class UniterModel(nn.Module):
    """Single-stream encoder returning the pooled CLS representation."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embeddings = TextEmbeddings(c, self.dtype)
        self.img_embeddings = UniterImageEmbeddings(c, self.dtype)
        self.layers = [
            EncoderLayer(c, self.dtype, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]
        self.pooler = Pooler(c, self.dtype)

    def __call__(
        self,
        input_ids,
        input_mask,
        segment_ids,
        img_feats,
        img_pos,
        img_mask=None,
        *,
        deterministic: bool = True,
        use_fused: Optional[bool] = None,
    ) -> dict[str, Any]:
        b, n_obj = img_feats.shape[:2]
        if img_mask is None:
            img_mask = jnp.ones((b, n_obj), dtype=input_mask.dtype)

        text = self.embeddings(
            input_ids, segment_ids, deterministic=deterministic
        )
        # Image tokens carry token-type 1 through the *text* type table
        # (reference ``modeling.py:621-623``).
        img_type_ids = jnp.ones((b, n_obj), dtype=jnp.int32)
        type_emb = self.embeddings.type_embed(img_type_ids)
        img = self.img_embeddings(
            img_feats, img_pos, type_emb, deterministic=deterministic
        )

        stream = jnp.concatenate([text, img], axis=1)
        bias = mask_to_bias(
            jnp.concatenate([input_mask, img_mask], axis=1), self.dtype
        )
        for layer in self.layers:
            stream, _ = layer(
                stream, bias=bias, deterministic=deterministic,
                use_fused=use_fused,
            )
        return {"stream": stream, "pooled": self.pooler(stream)}


class UniterForGQA(nn.Module):
    """UNITER + GQA answer head (reference ``uniter.py:15-75``)."""

    cfg: EncoderConfig
    num_answers: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.uniter = UniterModel(self.cfg, self.dtype)
        self.answer_head = AnswerHead(
            self.num_answers, self.cfg.hidden_size, self.dtype
        )

    def __call__(
        self, input_ids, input_mask, segment_ids, img_feats, img_pos, **kw
    ) -> dict[str, Any]:
        enc = self.uniter(
            input_ids, input_mask, segment_ids, img_feats, img_pos, **kw
        )
        return {
            "logits": self.answer_head(enc["pooled"]),
            "pooled": enc["pooled"],
        }
