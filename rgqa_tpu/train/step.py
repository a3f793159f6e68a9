"""Jitted SPMD train / eval step factories.

One compiled function per (backbone, strategy): forward + loss + global
clip-by-norm 5.0 + BertAdam update, with the RP pseudo-UQ augmentation and
the mixup-RoI augmentation running *on device* inside the same jit —
replacing the reference's per-batch host Python loops
(``gqa_conf.py:155-170``).

All steps are written against the uniform forward adapter from
``rgqa_tpu.models.zoo`` and a dict batch sharded over the mesh's ``data``
axis; gradient all-reduce falls out of the batch sharding.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rgqa_tpu.train.losses import (
    bce_answer_loss,
    branched_loss,
    energy_regularizer,
    mce_answer_loss,
    optax_sigmoid_bce,
    weighted_bce_answer_loss,
)
from rgqa_tpu.train.state import TrainState

__all__ = [
    "make_train_step",
    "make_eval_step",
    "global_norm_clip",
    "rp_augment",
    "mixup_augment",
]


def global_norm_clip(grads, max_norm: float):
    """Global clip-by-norm (reference ``clip_grad_norm_(params, 5.)``,
    ``gqa_conf.py:201``)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads)


def rp_augment(batch: dict, rng: jax.Array) -> dict:
    """Random-pairing pseudo-UQ negatives, on device (``gqa_conf.py:155-170``).

    The reference doubles the batch by pairing each *image* with a question
    sampled from a different image (rejection loop on host).  Here: roll the
    text fields by a random offset in [1, B-1] — a different batch row is a
    different image with probability ~1 for shuffled batches — keep vision
    fields, and append with zero targets.
    """
    text_keys = [k for k in ("input_ids", "input_mask", "segment_ids", "token_ids") if k in batch]
    vis_keys = [k for k in ("feats", "boxes", "pixels") if k in batch]
    first = batch[text_keys[0]]
    b = first.shape[0]
    shift = jax.random.randint(rng, (), 1, b)

    out = dict(batch)
    for k in text_keys:
        out[k] = jnp.concatenate([batch[k], jnp.roll(batch[k], shift, axis=0)], 0)
    for k in vis_keys:
        out[k] = jnp.concatenate([batch[k], batch[k]], 0)
    out["target"] = jnp.concatenate(
        [batch["target"], jnp.zeros_like(batch["target"])], 0
    )
    if "id_mask" in batch:
        out["id_mask"] = jnp.concatenate(
            [batch["id_mask"], jnp.zeros_like(batch["id_mask"])], 0
        )
    return out


def mixup_augment(
    batch: dict,
    rng: jax.Array,
    alpha: float,
    beta: float,
    mode: str,
    *,
    uq_as_class: bool = False,
) -> dict:
    """Mixup-RoI pseudo-UQ augmentation (reference ``gqa_mixup_vis.py``).

    RoI-level *swap*, not convex blending (``:134-181``): per appended row,
    draw ``prop ~ Beta(alpha, beta)``, keep ``floor(prop * N)`` random RoIs
    from the anchor image and take the rest from a different image
    (``mixup_v3``: zeros instead of the other image's features; boxes
    always come from the partner on swapped slots).  Targets:
    ``prop * target`` for v1/v3, zero for v2.  The question text is the
    anchor's (``sent + sent``).  ``perturb`` mode instead shuffles the
    *boxes* across RoI slots with unchanged features, zero target
    (``:124-133``).

    Host rejection loops become device ops: the partner is a random batch
    roll; the kept subset is the bottom-``floor(prop*N)`` ranks of i.i.d.
    uniforms (exact subset size, like the reference's shuffled prefix).
    """
    out = dict(batch)
    text_keys = [k for k in ("input_ids", "input_mask", "segment_ids", "token_ids") if k in batch]
    feats, boxes, target = batch["feats"], batch["boxes"], batch["target"]
    b, n = feats.shape[:2]

    if mode.startswith("treemix"):
        # Language mixup (gqa_mixup_lang.py): splice a partner question's
        # token window into the anchor question; vision unchanged.
        prop_rng, pos_rng, roll_rng = jax.random.split(rng, 3)
        prop = jax.random.beta(prop_rng, alpha, beta, (b,))
        ids = batch["input_ids"]
        t = ids.shape[1]
        shift = jax.random.randint(roll_rng, (), 1, b)
        span = jnp.floor(prop * (t - 2)).astype(jnp.int32)  # keep [CLS]/[SEP]
        start = 1 + (
            jax.random.uniform(pos_rng, (b,))
            * jnp.maximum(t - 2 - span, 1).astype(jnp.float32)
        ).astype(jnp.int32)
        pos = jnp.arange(t)[None, :]
        in_span = (pos >= start[:, None]) & (pos < (start + span)[:, None])
        mixed = {}
        for k in text_keys:
            partner = jnp.roll(batch[k], shift, axis=0)
            mixed[k] = jnp.where(in_span, partner, batch[k])
        for k in text_keys:
            out[k] = jnp.concatenate([batch[k], mixed[k]], 0)
        out["feats"] = jnp.concatenate([feats, feats], 0)
        out["boxes"] = jnp.concatenate([boxes, boxes], 0)
        if mode == "treemix_v2":
            pet_target = jnp.zeros_like(target)
        else:  # treemix_v1: answer mass shrinks with the swapped fraction
            pet_target = target * (1.0 - prop)[:, None]
        out["target"] = jnp.concatenate([target, pet_target], 0)
        if "id_mask" in batch:
            out["id_mask"] = jnp.concatenate(
                [batch["id_mask"], jnp.zeros_like(batch["id_mask"])], 0
            )
        return out

    for k in text_keys:
        out[k] = jnp.concatenate([batch[k], batch[k]], 0)

    if mode == "perturb":
        perm_rng, _ = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)
        pet_boxes = boxes[:, perm, :]
        out["feats"] = jnp.concatenate([feats, feats], 0)
        out["boxes"] = jnp.concatenate([boxes, pet_boxes], 0)
        pet_target = jnp.zeros_like(target)
    elif mode.startswith("weighted_sum"):
        # Convex RoI-feature blend (gqa_distill_online.py:175-200):
        # pet = prop * anchor + (1-prop) * partner; boxes stay the anchor's.
        prop_rng, roll_rng = jax.random.split(rng)
        prop = jax.random.beta(prop_rng, alpha, beta, (b, 1, 1))
        shift = jax.random.randint(roll_rng, (), 1, b)
        pet_feats = prop * feats + (1.0 - prop) * jnp.roll(feats, shift, 0)
        out["feats"] = jnp.concatenate([feats, pet_feats], 0)
        out["boxes"] = jnp.concatenate([boxes, boxes], 0)
        prop2 = prop[:, 0, 0]
        if mode == "weighted_sum_v2":
            pet_target = jnp.zeros_like(target)
        else:
            pet_target = target * prop2[:, None]
    else:
        prop_rng, sub_rng, roll_rng = jax.random.split(rng, 3)
        prop = jax.random.beta(prop_rng, alpha, beta, (b,))
        # Exact floor(prop*N)-subset via uniform ranks.
        u = jax.random.uniform(sub_rng, (b, n))
        ranks = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
        keep = ranks < jnp.floor(prop[:, None] * n)  # (B, N) from anchor
        shift = jax.random.randint(roll_rng, (), 1, b)
        neg_feats = jnp.roll(feats, shift, axis=0)
        neg_boxes = jnp.roll(boxes, shift, axis=0)
        base = jnp.zeros_like(feats) if mode == "mixup_v3" else neg_feats
        pet_feats = jnp.where(keep[..., None], feats, base)
        pet_boxes = jnp.where(keep[..., None], boxes, neg_boxes)
        out["feats"] = jnp.concatenate([feats, pet_feats], 0)
        out["boxes"] = jnp.concatenate([boxes, pet_boxes], 0)
        if uq_as_class:
            # OOD-finetune targets (gqa_ood.py:146-155): real-answer mass
            # scales by prop; the UQ column takes 1-prop (or 1 when the
            # anchor was already UQ) — v2 puts everything on UQ.
            anchor_uq = target[:, -1:]
            if mode == "mixup_v2":
                pet_target = jnp.concatenate(
                    [jnp.zeros_like(target[:, :-1]), jnp.ones_like(anchor_uq)], 1
                )
            else:
                real = target[:, :-1] * prop[:, None]
                uq_col = jnp.where(anchor_uq > 0, 1.0, (1.0 - prop)[:, None])
                pet_target = jnp.concatenate([real, uq_col], 1)
        elif mode == "mixup_v2":
            pet_target = jnp.zeros_like(target)
        else:  # mixup_v1 / mixup_v3 / legacy 'vis'
            pet_target = target * prop[:, None]

    out["target"] = jnp.concatenate([target, pet_target], 0)
    if "id_mask" in batch:
        # Appended rows are pseudo-UQ (not pure ID rows).
        out["id_mask"] = jnp.concatenate(
            [batch["id_mask"], jnp.zeros_like(batch["id_mask"])], 0
        )
    return out


def make_train_step(
    forward: Callable,
    *,
    loss: str = "bce",
    sample_pair: bool = False,
    mixup_mode: Optional[str] = None,
    mixup_alpha: float = 1.0,
    mixup_beta: float = 1.0,
    energy: bool = False,
    m_in: float = 25.0,
    m_out: float = 0.0,
    branched: bool = False,
    weighted: bool = False,
    weighted_rp: bool = False,
    binary: bool = False,
    uq_as_class: bool = False,
    grad_clip: float = 5.0,
    donate: bool = True,
):
    """Compile a full train step: augment -> forward -> loss -> clip -> update.

    Returns ``step(state, batch, rng) -> (state, aux)`` where ``aux`` holds
    the scalar loss plus per-row (score, label) for cartography charts
    (``gqa_conf.py:204-215``).
    """

    def weighted_rp_loss(params, batch, rng):
        """CLIP-weighted RP (``gqa_weight.py:130-245``): anchor images paired
        with questions rolled by the host-chosen ``neg_shift`` (so the host
        could compute similarity weights for exactly these pairs); loss =
        0.5 * (pos BCE + similarity-weighted negative BCE)."""
        r1, r2 = jax.random.split(rng)
        out_pos = forward(params, batch, deterministic=False, rng=r1)
        lp = out_pos["logits"].astype(jnp.float32)
        k = lp.shape[-1]
        loss_pos = jnp.mean(optax_sigmoid_bce(lp, batch["target"])) * k

        neg = dict(batch)
        shift = batch["neg_shift"]
        for key in ("input_ids", "input_mask", "segment_ids", "token_ids"):
            if key in batch:
                neg[key] = jnp.roll(batch[key], shift, axis=0)
        out_neg = forward(params, neg, deterministic=False, rng=r2)
        ln = out_neg["logits"].astype(jnp.float32)
        per_row = jnp.mean(
            optax_sigmoid_bce(ln, jnp.zeros_like(ln)), axis=-1
        ) * k
        w = batch["neg_weights"].astype(jnp.float32)
        loss_neg = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1e-8)
        total = 0.5 * (loss_pos + loss_neg)
        probs = jax.nn.sigmoid(lp)
        return total, {
            "loss": total,
            "score": jnp.max(probs, axis=-1),
            "label": jnp.argmax(probs, axis=-1),
        }

    def loss_fn(params, batch, rng):
        if weighted_rp:
            return weighted_rp_loss(params, batch, rng)
        drop_rng, aug_rng = jax.random.split(rng)
        if sample_pair:
            batch = rp_augment(batch, aug_rng)
        elif mixup_mode:
            batch = mixup_augment(
                batch, aug_rng, mixup_alpha, mixup_beta, mixup_mode,
                uq_as_class=uq_as_class,
            )
        out = forward(params, batch, deterministic=False, rng=drop_rng)
        logits = out["logits"].astype(jnp.float32)
        if logits.ndim == 1:  # single-logit heads (caps matcher)
            logits = logits[:, None]
        target = batch["target"]
        id_mask = batch.get("id_mask")

        if binary:
            # Separate-detector / caption-matcher training: a single logit
            # against the is-answerable indicator (gqa_separate.py:117-157,
            # gqa_caption.py:112-121).
            logit1 = logits[:, 0] if logits.ndim == 2 else logits
            per_row = optax_sigmoid_bce(logit1, id_mask.astype(jnp.float32))
            total = jnp.mean(per_row)
        elif branched:
            total = branched_loss(
                logits, out["conf"].astype(jnp.float32), target, id_mask,
                mce=(loss == "mce"),
            )
        elif weighted:
            total = weighted_bce_answer_loss(logits, target, batch["row_weights"])
        elif loss == "mce":
            total = mce_answer_loss(logits, target)
        else:
            total = bce_answer_loss(logits, target)
        if energy:
            total = total + energy_regularizer(
                logits, id_mask, m_in, m_out, mce=(loss == "mce")
            )

        probs = jax.nn.sigmoid(logits)
        aux = {
            "loss": total,
            "score": jnp.max(probs, axis=-1),
            "label": jnp.argmax(probs, axis=-1),
        }
        return total, aux

    def step(state: TrainState, batch: dict, rng: jax.Array):
        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params, batch, rng)
        if grad_clip and grad_clip > 0:
            grads = global_norm_clip(grads, grad_clip)
        return state.apply_gradients(grads), aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(forward: Callable, *, with_logits: bool = False):
    """Compile an inference step returning (label idx, MSP score[, logits]).

    The MSP score is max-sigmoid (``gqa_conf.py:326``); scorers needing more
    (energy top-2, ODIN, Mahalanobis, ...) build their own jitted functions
    in ``rgqa_tpu.scorers``.
    """

    def step(params, batch):
        out = forward(params, batch, deterministic=True)
        logits = out["logits"].astype(jnp.float32)
        if logits.ndim == 1:
            logits = logits[:, None]
        probs = jax.nn.sigmoid(logits)
        res = {
            "label": jnp.argmax(probs, axis=-1),
            "score": jnp.max(probs, axis=-1),
        }
        if "conf" in out:
            res["conf"] = jax.nn.sigmoid(out["conf"].astype(jnp.float32))
        if "pooled" in out:
            res["pooled"] = out["pooled"].astype(jnp.float32)
        if with_logits:
            res["logits"] = logits
        return res

    return jax.jit(step)
