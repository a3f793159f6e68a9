"""On-device BERT/LXMERT masking (vectorized ``jax.random``).

Faithful to the reference's per-token probabilities
(``lxmert_pretrain.py:71-132``): with rate r, a token is selected for
prediction; selected tokens become [MASK] (80%), a random vocab id (10%),
or stay (10%).  RoI features zero (80%), swap with a random feature from
the pool (10%), or stay (10%).  Unselected positions carry label -1
(ignored by the CE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mask_words", "mask_objects", "matched_swap"]


def mask_words(
    rng,
    input_ids,
    maskable,
    *,
    mask_rate: float,
    vocab_size: int,
    mask_id: int,
):
    """Returns (masked_ids, lm_labels) with -1 at unpredicted positions.

    ``maskable`` is a {0,1} mask excluding [CLS]/[SEP]/padding — the
    reference masks only the inner WordPieces
    (``lxmert_pretrain.py:150-160``).
    """
    r_sel, r_kind, r_rand = jax.random.split(rng, 3)
    shape = input_ids.shape
    selected = (jax.random.uniform(r_sel, shape) < mask_rate) & (maskable > 0)
    kind = jax.random.uniform(r_kind, shape)
    random_ids = jax.random.randint(r_rand, shape, 0, vocab_size)
    replacement = jnp.where(
        kind < 0.8,
        jnp.full(shape, mask_id, input_ids.dtype),
        jnp.where(kind < 0.9, random_ids.astype(input_ids.dtype), input_ids),
    )
    masked_ids = jnp.where(selected, replacement, input_ids)
    lm_labels = jnp.where(selected, input_ids, -1)
    return masked_ids, lm_labels


def mask_objects(rng, feats, pool):
    """Returns (masked_feats, feat_mask) for the visual losses.

    ``pool`` (N, D) supplies the 10% random-feature swaps (the reference
    draws from the whole dataset, ``lxmert_data.py:138-144``; a large
    random subset is an unbiased stand-in).
    """
    r_sel, r_kind, r_pick = jax.random.split(rng, 3)
    b, k, d = feats.shape
    selected = jax.random.uniform(r_sel, (b, k)) < 0.15
    kind = jax.random.uniform(r_kind, (b, k))
    picks = jax.random.randint(r_pick, (b, k), 0, pool.shape[0])
    random_feats = pool[picks]
    masked = jnp.where(
        (selected & (kind < 0.8))[..., None],
        0.0,
        jnp.where((selected & (kind >= 0.8) & (kind < 0.9))[..., None],
                  random_feats.astype(feats.dtype), feats),
    )
    return masked, selected.astype(jnp.float32)


def matched_swap(rng, input_ids, input_mask, segment_ids, ans):
    """Cross-modal matching negatives: for ~half the rows, replace the
    *sentence* with another row's (images stay), label matched=0 and
    disable the QA answer (``lxmert_data.py:171-178`` + the convert step).

    On-device equivalent of the host rejection loop: roll text by a random
    offset; different row == different image w.h.p. in a shuffled batch.
    """
    r_flip, r_shift = jax.random.split(rng)
    b = input_ids.shape[0]
    flip = jax.random.bernoulli(r_flip, 0.5, (b,))
    shift = jax.random.randint(r_shift, (), 1, b)

    def roll(x):
        return jnp.roll(x, shift, axis=0)

    out_ids = jnp.where(flip[:, None], roll(input_ids), input_ids)
    out_mask = jnp.where(flip[:, None], roll(input_mask), input_mask)
    out_seg = jnp.where(flip[:, None], roll(segment_ids), segment_ids)
    matched = 1 - flip.astype(jnp.int32)
    out_ans = jnp.where(flip, -1, ans)
    return out_ids, out_mask, out_seg, matched, out_ans
