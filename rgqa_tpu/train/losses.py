"""Jittable training losses for the RGQA strategies.

Each matches a reference driver's loss bit-for-bit in expectation, but is
expressed over static shapes with mask weights instead of boolean row
indexing (data-dependent shapes don't jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bce_answer_loss",
    "mce_answer_loss",
    "energy_of_logits",
    "energy_regularizer",
    "branched_loss",
    "weighted_bce_answer_loss",
]


def _masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bce_answer_loss(logits, targets, row_mask=None):
    """Per-answer binary CE, scaled by the answer count.

    Reference: ``nn.BCEWithLogitsLoss()(logit, target) * logit.size(1)``
    (``gqa_conf.py:197-199``) — i.e. mean over batch of the per-example
    class *sum*.  ``row_mask`` selects rows (branched trainer's
    ``logit[id_inds]``, ``gqa_branched.py:137-139``).
    """
    per_elem = optax_sigmoid_bce(logits, targets)
    per_row = jnp.mean(per_elem, axis=-1)
    return _masked_mean(per_row, row_mask) * logits.shape[-1]


def optax_sigmoid_bce(logits, targets):
    """Stable element-wise BCE-with-logits (same form torch uses)."""
    # max(x, 0) - x*z + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mce_answer_loss(logits, targets, row_mask=None):
    """Softmax CE vs. argmax target, scaled by answer count
    (``--mceLoss``, ``gqa_conf.py:194-196``)."""
    labels = jnp.argmax(targets, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _masked_mean(per_row, row_mask) * logits.shape[-1]


def energy_of_logits(logits, mce: bool = False):
    """The free energy ``E_f`` (``gqa_energy.py:129-135``): logsumexp under
    the MCE loss, else the sum of softplus over answers."""
    if mce:
        return jax.scipy.special.logsumexp(logits, axis=-1)
    return jnp.sum(jax.nn.softplus(logits), axis=-1)


def energy_regularizer(logits, id_mask, m_in: float, m_out: float, mce: bool = False):
    """Energy hinge regularizer (``gqa_energy.py:137-138``):

    ``0.1 * (mean_id relu(-E - m_in)^2 + mean_ood relu(m_out + E)^2)``
    with ``id_mask`` = 1 for answerable rows (UQ column zero).
    """
    e = energy_of_logits(logits, mce=mce)
    id_term = _masked_mean(jnp.square(jax.nn.relu(-e - m_in)), id_mask)
    ood_term = _masked_mean(jnp.square(jax.nn.relu(m_out + e)), 1.0 - id_mask)
    return 0.1 * (id_term + ood_term)


def branched_loss(logits, conf_logit, targets, id_mask, mce: bool = False):
    """Two-headed loss (``gqa_branched.py:130-143``): answer loss on ID rows
    plus BCE(sigmoid(conf), is-ID) over all rows."""
    if mce:
        ans = mce_answer_loss(logits, targets, row_mask=id_mask)
    else:
        ans = bce_answer_loss(logits, targets, row_mask=id_mask)
    conf_bce = optax_sigmoid_bce(conf_logit, id_mask.astype(conf_logit.dtype))
    return ans + jnp.mean(conf_bce)


def weighted_bce_answer_loss(logits, targets, row_weights):
    """Per-row weighted BCE (resampling / POEM / CLIP-weight trainers,
    ``gqa_resampling.py:184-200``)."""
    per_elem = optax_sigmoid_bce(logits, targets)
    per_row = jnp.mean(per_elem, axis=-1) * logits.shape[-1]
    w = row_weights.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1e-8)
