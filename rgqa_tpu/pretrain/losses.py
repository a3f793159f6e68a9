"""Multi-task pretraining losses (reference ``modeling.py:922-989``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["VISUAL_LOSS_CONFIG", "pretrain_loss", "masked_ce", "smooth_l1"]

# key -> (loss kind, weight)  — reference VisualConfig.visual_loss_config
# (modeling.py:158-162): weight = 1/0.15 for all three.
VISUAL_LOSS_CONFIG = {
    "obj": ("ce", 1 / 0.15),
    "attr": ("ce", 1 / 0.15),
    "feat": ("l2", 1 / 0.15),
}


def masked_ce(logits, labels):
    """CrossEntropy(ignore_index=-1): mean over non-ignored elements."""
    num_classes = logits.shape[-1]
    flat_logits = logits.reshape(-1, num_classes)
    flat_labels = labels.reshape(-1)
    valid = flat_labels >= 0
    safe = jnp.where(valid, flat_labels, 0)
    logp = jax.nn.log_softmax(flat_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def smooth_l1(pred, target):
    """Element-wise SmoothL1 (beta=1), torch semantics."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def pretrain_loss(
    outputs: dict,
    *,
    lm_labels=None,
    matched=None,
    obj_labels=None,
    attr_labels=None,
    feat_target=None,
    feat_mask=None,
    ans=None,
    tasks=("mask_lm", "matched", "obj", "attr", "feat", "qa"),
) -> tuple[jnp.ndarray, dict]:
    """Sum of the active task losses; returns (total, per-task dict).

    ``outputs`` is ``LxmertPretraining.__call__``'s dict; visual CE/L2
    losses are weighted by the RoI ``feat_mask`` then scaled 1/0.15
    (``modeling.py:954-974``).
    """
    total = 0.0
    parts = {}
    if "mask_lm" in tasks and lm_labels is not None:
        parts["mask_lm"] = masked_ce(outputs["mlm"], lm_labels)
    if "matched" in tasks and matched is not None:
        parts["matched"] = masked_ce(outputs["matched"], matched)
    if feat_mask is not None:
        visn = outputs["visn"]
        if "obj" in tasks and obj_labels is not None:
            ce = _per_roi_ce(visn["obj"], obj_labels)
            parts["obj"] = jnp.mean(ce * feat_mask) * VISUAL_LOSS_CONFIG["obj"][1]
        if "attr" in tasks and attr_labels is not None:
            ce = _per_roi_ce(visn["attr"], attr_labels)
            parts["attr"] = jnp.mean(ce * feat_mask) * VISUAL_LOSS_CONFIG["attr"][1]
        if "feat" in tasks and feat_target is not None:
            l2 = jnp.mean(
                smooth_l1(visn["feat"].astype(jnp.float32), feat_target), axis=-1
            )
            parts["feat"] = jnp.mean(l2 * feat_mask) * VISUAL_LOSS_CONFIG["feat"][1]
    if "qa" in tasks and ans is not None:
        parts["qa"] = masked_ce(outputs["qa"], ans)
    for v in parts.values():
        total = total + v
    return total, parts


def _per_roi_ce(logits, labels):
    """Per-position CE with no reduction (labels >= 0 assumed valid)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.maximum(labels, 0)
    return -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
