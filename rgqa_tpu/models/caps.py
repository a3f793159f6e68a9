"""Caption-question matcher (the Q-C rejection scorer's model).

Rebuild of ``src/caps/caps.py:14-65``: a text-only BERT over the pair
``[CLS] caption [SEP] question [SEP]``.  The reference wraps HF
``BertModel`` and feeds the **raw CLS hidden state** (not the tanh pooler
output, ``caps.py:58-64``) through a 2-layer GELU/LayerNorm head
(``logit_fc``, ``caps.py:23-28``) to one match logit.  Here the encoder
is the shared transformer blocks — the same code path as LXMERT/UNITER —
with the same head structure; the (otherwise unused) BERT pooler is kept
so pretrained checkpoints import completely and the Mahalanobis scorer
has its pooled feature.

Initialize from a local ``bert-base-uncased`` state_dict via
``checkpoint.import_bert_caps`` (the reference's
``BertModel.from_pretrained``, ``caps.py:17``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.transformer import (
    EncoderLayer,
    LayerNorm,
    Pooler,
    TextEmbeddings,
    dense_init,
    gelu,
    mask_to_bias,
)

__all__ = ["CaptionMatcher"]


class MatchHead(nn.Module):
    """Reference ``logit_fc``: Linear(h, 2h) -> GeLU -> BertLayerNorm ->
    Linear(2h, 1) over the CLS hidden (``caps.py:23-28``)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cls_hidden):
        h = nn.Dense(
            self.hidden_size * 2, kernel_init=dense_init, name="dense",
            dtype=self.dtype,
        )(cls_hidden)
        h = gelu(h)
        h = LayerNorm(eps=1e-12, name="ln")(h)
        return nn.Dense(
            1, kernel_init=dense_init, name="logits", dtype=self.dtype
        )(h)


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
        self.match_head = MatchHead(c.hidden_size, self.dtype)

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
        # Head input is the raw CLS hidden, the reference's
        # last_hidden_state[:, 0] (caps.py:58-64); "pooled" stays the
        # BERT tanh pooler output (scorer feature space).
        logits = self.match_head(x[:, 0])[:, 0]
        return {"logits": logits, "pooled": self.pooler(x)}

    def match_prob(self, input_ids, input_mask, segment_ids, **kw):
        out = self(input_ids, input_mask, segment_ids, **kw)
        return nn.sigmoid(out["logits"])
