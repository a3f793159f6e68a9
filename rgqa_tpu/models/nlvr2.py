"""NLVR2: two-image reasoning model (reference ``src/tasks/nlvr2_model.py``).

Each example pairs one sentence with two images; both (sentence, image)
pairs run through the shared LXMERT encoder (images folded into the batch
axis), the two pooled vectors concatenate to a 2H feature, and a
GELU+LayerNorm head emits 2 logits (``nlvr2_model.py:18-52``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.lxmert import LxmertModel
from rgqa_tpu.models.transformer import LayerNorm, dense_init, gelu

__all__ = ["Nlvr2Model"]


class Nlvr2Model(nn.Module):
    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lxmert = LxmertModel(self.cfg, self.dtype)
        h2 = self.cfg.hidden_size * 2
        self.fc1 = nn.Dense(h2, kernel_init=dense_init, dtype=self.dtype)
        self.ln = LayerNorm(eps=self.cfg.layer_norm_eps)
        self.fc2 = nn.Dense(2, kernel_init=dense_init, dtype=self.dtype)

    def __call__(
        self,
        input_ids,
        input_mask,
        segment_ids,
        feats,   # (B, 2, K, F)
        boxes,   # (B, 2, K, 4)
        *,
        deterministic: bool = True,
        **kw,
    ) -> dict[str, Any]:
        b, img_num, k, f = feats.shape
        assert img_num == 2

        # Fold images into the batch axis; duplicate the sentence per image
        # (nlvr2_model.py:40-45).
        def dup(x):
            return jnp.repeat(x, 2, axis=0)

        enc = self.lxmert(
            dup(input_ids), dup(input_mask), dup(segment_ids),
            feats.reshape(b * 2, k, f), boxes.reshape(b * 2, k, -1),
            deterministic=deterministic, **kw,
        )
        pooled = enc["pooled"].reshape(b, -1)  # (B, 2H)
        h = gelu(self.fc1(pooled))
        h = self.ln(h)
        logits = self.fc2(h)
        return {"logits": logits, "pooled": pooled}
