"""LXMERT: cross-modality transformer encoder + GQA / pretraining heads.

TPU-native re-design of the reference LXMERT stack
(``src/lxrt/modeling.py:520-1031``): 9 language layers, 5 object-relation
(vision self-attention) layers, 5 cross-modal layers over (text tokens,
36 RoI features).  All shapes static; the short text+vision sequences are
processed by the shared fused-attention kernels.

Forks eliminated (SURVEY.md §7.1): adversarial input deltas
(``src/lxrt_adv``) are the ``txt_delta`` / ``img_delta`` arguments;
attention-prob output (``src/lxrt_vis``) is ``output_probs``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.transformer import (
    AttentionBlock,  # noqa: F401  (re-exported for introspection)
    CrossModalLayer,
    EncoderLayer,
    LayerNorm,
    Pooler,
    TextEmbeddings,
    dense_init,
    gelu,
    mask_to_bias,
)
from rgqa_tpu.ops.dropout import HiddenDropout

__all__ = ["LxmertModel", "LxmertForGQA", "LxmertPretraining", "AnswerHead"]

LxmertConfigLike = EncoderConfig


class VisualFeatEncoder(nn.Module):
    """RoI-feature + box-geometry projection, averaged
    (reference ``modeling.py:491-517`` — note the ``(x + y) / 2``)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, *, deterministic: bool = True):
        c = self.cfg
        x = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="feat_proj",
            dtype=self.dtype,
        )(feats)
        x = LayerNorm(eps=c.layer_norm_eps, name="feat_ln")(x)
        y = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="box_proj",
            dtype=self.dtype,
        )(boxes)
        y = LayerNorm(eps=c.layer_norm_eps, name="box_ln")(y)
        out = (x + y) / 2
        return HiddenDropout(c.hidden_dropout)(out, deterministic=deterministic)


class LxmertModel(nn.Module):
    """The L/R/X encoder returning (lang_seq, visn_seq, pooled)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embeddings = TextEmbeddings(c, self.dtype)
        self.visual = VisualFeatEncoder(c, self.dtype)
        self.lang_layers = [
            EncoderLayer(c, self.dtype, name=f"lang_{i}")
            for i in range(c.l_layers)
        ]
        self.visn_layers = [
            EncoderLayer(c, self.dtype, name=f"visn_{i}")
            for i in range(c.r_layers)
        ]
        self.x_layers = [
            CrossModalLayer(c, self.dtype, name=f"x_{i}")
            for i in range(c.x_layers)
        ]
        self.pooler = Pooler(c, self.dtype)

    def __call__(
        self,
        input_ids,
        input_mask,
        segment_ids=None,
        feats=None,
        boxes=None,
        visn_mask=None,
        *,
        txt_delta: Optional[jnp.ndarray] = None,
        img_delta: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_probs: bool = False,
        use_fused: Optional[bool] = None,
    ) -> dict[str, Any]:
        lang_bias = mask_to_bias(input_mask, self.dtype)
        visn_bias = (
            mask_to_bias(visn_mask, self.dtype) if visn_mask is not None else None
        )
        kw = dict(deterministic=deterministic, use_fused=use_fused)

        lang = self.embeddings(
            input_ids, segment_ids, delta=txt_delta, deterministic=deterministic
        )
        if img_delta is not None:
            feats = feats + img_delta.astype(feats.dtype)
        visn = self.visual(feats, boxes, deterministic=deterministic)

        for layer in self.lang_layers:
            lang, _ = layer(lang, bias=lang_bias, **kw)
        for layer in self.visn_layers:
            visn, _ = layer(visn, bias=visn_bias, **kw)

        all_probs = []
        lang_layers = []
        for layer in self.x_layers:
            lang, visn, probs = layer(
                lang, lang_bias, visn, visn_bias, output_probs=output_probs, **kw
            )
            lang_layers.append(lang)
            if output_probs:
                all_probs.append(probs)

        pooled = self.pooler(lang)
        out = {
            "lang": lang,
            "visn": visn,
            "pooled": pooled,
            # Per-x-layer language features — the multi-level OOD taps of
            # the reference's gqa_branched_layer.py fork (:103-110).
            "lang_layers": lang_layers,
        }
        if output_probs:
            out["x_attention_probs"] = all_probs
        return out


class AnswerHead(nn.Module):
    """2-layer GELU/LN classifier head (reference ``gqa_model.py:20-27``,
    ``modeling.py`` BertVisualAnswerHead)."""

    num_answers: int
    hidden_size: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        h = nn.Dense(
            self.hidden_size * 2, kernel_init=dense_init, name="dense",
            dtype=self.dtype,
        )(pooled)
        h = gelu(h)
        h = LayerNorm(name="ln")(h)
        return nn.Dense(
            self.num_answers, kernel_init=dense_init, name="logits",
            dtype=self.dtype,
        )(h)


class LxmertForGQA(nn.Module):
    """LXMERT + GQA answer head (and optional confidence branch).

    Returns ``{"logits", "pooled"[, "conf"]}`` — the pooled feature serves
    the Mahalanobis scorer (reference ``gqa_model.py:46-75``) and ``conf``
    the branched-confidence strategies (``gqa_model_branched.py:28-51``).
    """

    cfg: EncoderConfig
    num_answers: int
    branched: bool = False
    # Layer-tapped confidence branch (reference gqa_branched_layer.py:48-60):
    # per-x-layer CLS -> tanh projection -> concat -> 1 logit.
    branched_layers: bool = False
    project_size: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lxmert = LxmertModel(self.cfg, self.dtype)
        self.answer_head = AnswerHead(
            self.num_answers, self.cfg.hidden_size, self.dtype
        )
        if self.branched:
            self.conf_head = AnswerHead(1, self.cfg.hidden_size, self.dtype)
        if self.branched_layers:
            self.projectors = [
                nn.Dense(
                    self.project_size, kernel_init=dense_init,
                    name=f"proj_{i}", dtype=self.dtype,
                )
                for i in range(self.cfg.x_layers)
            ]
            self.layer_conf = nn.Dense(
                1, kernel_init=dense_init, name="layer_conf", dtype=self.dtype
            )

    def __call__(
        self,
        input_ids,
        input_mask,
        segment_ids,
        feats,
        boxes,
        **kw,
    ) -> dict[str, Any]:
        enc = self.lxmert(
            input_ids, input_mask, segment_ids, feats, boxes, **kw
        )
        out = {
            "logits": self.answer_head(enc["pooled"]),
            "pooled": enc["pooled"],
        }
        if self.branched:
            out["conf"] = self.conf_head(enc["pooled"])[:, 0]
        if self.branched_layers:
            taps = [
                jnp.tanh(proj(lang[:, 0]))
                for proj, lang in zip(self.projectors, enc["lang_layers"])
            ]
            out["conf"] = self.layer_conf(jnp.concatenate(taps, axis=-1))[:, 0]
        if "x_attention_probs" in enc:
            out["x_attention_probs"] = enc["x_attention_probs"]
        return out


class MLMHead(nn.Module):
    """Masked-LM head: transform + decode onto the tied word embedding.

    Reference BertLMPredictionHead (``modeling.py:601-625``): dense + GELU +
    LN, then a decoder sharing the embedding matrix plus a free bias.
    """

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, word_embedding):
        c = self.cfg
        h = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="dense", dtype=self.dtype
        )(hidden)
        h = gelu(h)
        h = LayerNorm(eps=c.layer_norm_eps, name="ln")(h)
        bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,))
        return h @ word_embedding.T.astype(h.dtype) + bias


class VisualObjHead(nn.Module):
    """Masked-object prediction heads: shared transform, one decoder per
    visual loss (reference BertVisualObjHead, ``modeling.py:628-650``)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        c = self.cfg
        h = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="dense", dtype=self.dtype
        )(hidden)
        h = gelu(h)
        h = LayerNorm(eps=c.layer_norm_eps, name="ln")(h)
        return {
            "obj": nn.Dense(
                c.obj_vocab_size, kernel_init=dense_init, name="decoder_obj",
                dtype=self.dtype,
            )(h),
            "attr": nn.Dense(
                c.attr_vocab_size, kernel_init=dense_init, name="decoder_attr",
                dtype=self.dtype,
            )(h),
            "feat": nn.Dense(
                c.visual_feat_dim, kernel_init=dense_init, name="decoder_feat",
                dtype=self.dtype,
            )(h),
        }


class LxmertPretraining(nn.Module):
    """LXMERT with pretraining heads (reference ``modeling.py:889-1002``).

    Outputs raw logits for each pretraining task; the losses live in
    ``rgqa_tpu.train.pretrain``.  ``matched`` logits also back the
    LXMERT-match rejection scorer (``forward_match``,
    ``modeling.py:991-1002``).
    """

    cfg: EncoderConfig
    num_answers: int = 9500
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.lxmert = LxmertModel(self.cfg, self.dtype)
        self.mlm_head = MLMHead(self.cfg, self.dtype)
        self.obj_head = VisualObjHead(self.cfg, self.dtype)
        self.matched_head = nn.Dense(
            2, kernel_init=dense_init, name="matched_head", dtype=self.dtype
        )
        self.answer_head = AnswerHead(
            self.num_answers, self.cfg.hidden_size, self.dtype
        )

    def __call__(
        self, input_ids, input_mask, segment_ids, feats, boxes, **kw
    ) -> dict[str, Any]:
        enc = self.lxmert(
            input_ids, input_mask, segment_ids, feats, boxes, **kw
        )
        word_emb = self.lxmert.embeddings.word_table
        return {
            "mlm": self.mlm_head(enc["lang"], word_emb),
            "visn": self.obj_head(enc["visn"]),
            "matched": self.matched_head(enc["pooled"]),
            "qa": self.answer_head(enc["pooled"]),
            "pooled": enc["pooled"],
        }

    def match_score(self, input_ids, input_mask, segment_ids, feats, boxes, **kw):
        """Cross-modal match probability (the ``lxrcap`` rejection scorer,
        reference ``gqa_lxrcap.py:98-120``)."""
        out = self(input_ids, input_mask, segment_ids, feats, boxes, **kw)
        return nn.softmax(out["matched"], axis=-1)[:, 1]
