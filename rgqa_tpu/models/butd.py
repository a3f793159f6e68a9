"""BUTD (bottom-up top-down attention) VQA model.

Rebuild of the reference BUTD backbone (``src/butd/butd.py:107-221``):
GloVe-300 word embeddings -> 1-layer GRU-1024 -> product-fusion attention
over 36 RoIs (features concatenated with box geometry, 2052-d) ->
elementwise question*image fusion -> 2-layer weight-norm ReLU classifier.

The GRU runs as a ``lax.scan`` with a hoisted input projection
(``rgqa_tpu.ops.gru``); weight-norm layers use a scalar gain like torch's
``weight_norm(..., dim=None)``.

Variants folded in as flags: ``branched`` adds the confidence head
(``GQABUTD_branched``, ``butd.py:224-352``); the joint representation is
always returned for the Mahalanobis scorer (``GQABUTD_maha``,
``butd.py:355-469``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rgqa_tpu.ops.gru import gru_scan

__all__ = ["ButdForGQA", "WeightNormDense"]

MAX_GQA_LENGTH = 40  # reference butd.py:6


class WeightNormDense(nn.Module):
    """Dense layer with scalar weight normalization.

    torch ``weight_norm(nn.Linear(...), dim=None)`` semantics: the weight is
    ``g * v / ||v||_F`` with a single scalar gain ``g``.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.features, in_dim),
        )
        g = self.param("g", nn.initializers.ones, ())
        w = (g / jnp.linalg.norm(v)) * v
        y = x @ w.T.astype(x.dtype)
        if self.use_bias:
            y = y + self.param("b", nn.initializers.zeros, (self.features,))
        return y


class ProductFusionAttention(nn.Module):
    """Softmax attention over RoIs via projected elementwise product
    (reference ``butd.py:76-104``)."""

    hidden: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, image_features, question_emb, *, deterministic=True):
        img = nn.relu(WeightNormDense(self.hidden, name="image_proj")(image_features))
        q = nn.relu(WeightNormDense(self.hidden, name="question_proj")(question_emb))
        joint = img * q[:, None, :]
        joint = nn.Dropout(self.dropout)(joint, deterministic=deterministic)
        logits = WeightNormDense(1, name="linear")(joint)
        return nn.softmax(logits, axis=1)


class ButdForGQA(nn.Module):
    """GRU + top-down attention GQA model.

    Inputs are *front-padded* token-index sequences (reference
    ``butd.py:180-193``): padding index = vocab size (one past the last
    word), GloVe rows loaded for real words.  Returns
    ``{"logits", "pooled"[, "conf"][, "attention"]}``.
    """

    vocab_size: int  # number of real words (padding idx == vocab_size)
    num_answers: int
    embed_dim: int = 300
    hidden: int = 1024
    visual_dim: int = 2048
    branched: bool = False
    attention_dropout: float = 0.2
    answer_dropout: float = 0.5

    def setup(self):
        self.w_emb = nn.Embed(self.vocab_size + 1, self.embed_dim)
        d = self.embed_dim
        h = self.hidden
        self.gru_w_ih = self.param(
            "gru_w_ih", nn.initializers.uniform(scale=1 / np.sqrt(h)), (3 * h, d)
        )
        self.gru_w_hh = self.param(
            "gru_w_hh", nn.initializers.uniform(scale=1 / np.sqrt(h)), (3 * h, h)
        )
        self.gru_b_ih = self.param("gru_b_ih", nn.initializers.zeros, (3 * h,))
        self.gru_b_hh = self.param("gru_b_hh", nn.initializers.zeros, (3 * h,))
        self.att = ProductFusionAttention(h, self.attention_dropout)
        self.q_project = WeightNormDense(h)
        self.img_project = WeightNormDense(h)
        self.ans_fc1 = WeightNormDense(2 * h)
        self.ans_fc2 = WeightNormDense(self.num_answers)
        self.ans_dropout = nn.Dropout(self.answer_dropout)
        if self.branched:
            self.conf_fc1 = WeightNormDense(2 * h)
            self.conf_fc2 = WeightNormDense(1)

    def __call__(
        self,
        token_ids,
        feats,
        boxes,
        *,
        deterministic: bool = True,
        output_attention: bool = False,
    ) -> dict[str, Any]:
        b = token_ids.shape[0]
        w = self.w_emb(token_ids)
        h0 = jnp.zeros((b, self.hidden), w.dtype)
        outs, _ = gru_scan(
            w, h0, self.gru_w_ih, self.gru_w_hh, self.gru_b_ih, self.gru_b_hh
        )
        # Front-padded sequences: the last timestep is the question summary
        # (reference butd.py:66-68).
        q_enc = outs[:, -1]

        image_features = jnp.concatenate([feats, boxes], axis=2)  # (B,K,2052)
        att = self.att(image_features, q_enc, deterministic=deterministic)
        img_enc = jnp.sum(image_features * att, axis=1)

        q_repr = nn.relu(self.q_project(q_enc))
        img_repr = nn.relu(self.img_project(img_enc))
        joint = q_repr * img_repr

        hdn = self.ans_dropout(
            nn.relu(self.ans_fc1(joint)), deterministic=deterministic
        )
        out: dict[str, Any] = {"logits": self.ans_fc2(hdn), "pooled": joint}
        if self.branched:
            c = self.ans_dropout(
                nn.relu(self.conf_fc1(joint)), deterministic=deterministic
            )
            out["conf"] = self.conf_fc2(c)[:, 0]
        if output_attention:
            out["attention"] = att
        return out


def tokenize_front_padded(
    sentences, word2idx: dict[str, int], max_len: int = MAX_GQA_LENGTH
) -> np.ndarray:
    """BUTD's front-padded index tokenizer (reference ``butd.py:180-193``
    + ``preprocess.py:30-42``): lowercase, strip punctuation-ish chars,
    split possessives, pad in front with the padding index."""
    pad_idx = len(word2idx)
    out = np.full((len(sentences), max_len), pad_idx, dtype=np.int32)
    for i, sent in enumerate(sentences):
        toks = butd_split(sent)
        ids = [word2idx.get(t, pad_idx) for t in toks][:max_len]
        if ids:
            out[i, -len(ids):] = ids
    return out


def build_glove_matrix(
    word2idx: dict[str, int], glove_path: str, dim: int = 300
) -> np.ndarray:
    """GloVe embedding matrix for a word dict
    (reference ``butd/preprocess.py:54-123``): rows for known words from
    the GloVe text file, zeros elsewhere; one extra all-zero padding row.
    Load into ``ButdForGQA`` params at ``w_emb/embedding``."""
    out = np.zeros((len(word2idx) + 1, dim), np.float32)
    with open(glove_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            word = parts[0]
            if word in word2idx and len(parts) == dim + 1:
                out[word2idx[word]] = np.asarray(parts[1:], np.float32)
    return out


def butd_split(sentence: str) -> list[str]:
    """The reference's ad-hoc word splitter (``preprocess.py:30-42``)."""
    s = (
        sentence.lower()
        .replace(",", "")
        .replace("?", "")
        .replace("'s", " 's")
    )
    return s.split()
