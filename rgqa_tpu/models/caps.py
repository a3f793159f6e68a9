"""Caption-question matcher (the Q-C rejection scorer's model).

Rebuild of ``src/caps/caps.py:14-65``: a text-only BERT over the pair
``[CLS] caption [SEP] question [SEP]`` whose pooled CLS feeds a single
match logit.  The reference wraps HF ``BertModel``; here it's the shared
transformer blocks — the same encoder code path as LXMERT/UNITER.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.transformer import (
    EncoderLayer,
    Pooler,
    TextEmbeddings,
    dense_init,
    mask_to_bias,
)

__all__ = ["CaptionMatcher"]


class CaptionMatcher(nn.Module):
    """Single-stream text-pair encoder with a 1-logit match head."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embeddings = TextEmbeddings(c, self.dtype)
        self.layers = [
            EncoderLayer(c, self.dtype, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]
        self.pooler = Pooler(c, self.dtype)
        self.match_head = nn.Dense(
            1, kernel_init=dense_init, name="match_head", dtype=self.dtype
        )

    def __call__(
        self,
        input_ids,
        input_mask,
        segment_ids,
        *,
        deterministic: bool = True,
        use_fused: Optional[bool] = None,
    ) -> dict[str, Any]:
        bias = mask_to_bias(input_mask, self.dtype)
        x = self.embeddings(
            input_ids, segment_ids, deterministic=deterministic
        )
        for layer in self.layers:
            x, _ = layer(
                x, bias=bias, deterministic=deterministic, use_fused=use_fused
            )
        pooled = self.pooler(x)
        return {"logits": self.match_head(pooled)[:, 0], "pooled": pooled}

    def match_prob(self, input_ids, input_mask, segment_ids, **kw):
        out = self(input_ids, input_mask, segment_ids, **kw)
        return nn.sigmoid(out["logits"])
