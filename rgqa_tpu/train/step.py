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

import functools
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
    "make_weighted_clip_train_step",
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
    vis_keys = [
        k
        for k in ("feats", "boxes", "pixels", "pixels_u8", "pixel_rect",
                  "pixel_mask")
        if k in batch
    ]
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


def _treemix_augment(
    batch: dict,
    rng: jax.Array,
    alpha: float,
    beta: float,
    mode: str,
    lam1: float,
    lam2: float,
) -> dict:
    """Constituency-aware language mixup (reference ``gqa_mixup_both.py``).

    When the batch carries precomputed parse spans
    (``EncodedGQA.parse_spans``), the splice follows the reference's
    ``mix_trees`` (``:47-77``): a random anchor subtree whose word-ratio
    lies in (lam2, lam1) is replaced by a random partner subtree — the
    partner's ratio is also measured against the *anchor's* length, the
    reference's quirk (``:58-61``).  Rows without a usable parse (or
    batches without spans) fall back to a random token window of
    Beta(alpha, beta) width.  Everything runs on device: span choice is a
    masked Gumbel argmax, the splice is two gathers + selects.
    """
    out = dict(batch)
    text_keys = [
        k for k in ("input_ids", "segment_ids", "token_ids") if k in batch
    ]
    ids = batch.get("input_ids", batch.get("token_ids"))
    b, t = ids.shape
    target = batch["target"]
    (prop_rng, pos_rng, roll_rng, pick_a_rng, pick_p_rng) = jax.random.split(
        rng, 5
    )
    shift = jax.random.randint(roll_rng, (), 1, b)
    pos = jnp.arange(t)[None, :]

    # Fallback: random window, spliced at the same coordinates on both
    # sides (the pre-parse behavior; also the path for BUTD's
    # front-padded encoding).
    prop = jax.random.beta(prop_rng, alpha, beta, (b,))
    span_f = jnp.floor(prop * (t - 2)).astype(jnp.int32)
    start_f = 1 + (
        jax.random.uniform(pos_rng, (b,))
        * jnp.maximum(t - 2 - span_f, 1).astype(jnp.float32)
    ).astype(jnp.int32)
    s1, l1, s2, l2 = start_f, span_f, start_f, span_f
    lab = 1.0 - prop  # v1 target weight for fallback rows

    if "parse_spans" in batch:
        spans = batch["parse_spans"].astype(jnp.int32)  # (B, K, 2)
        sw = batch["parse_span_words"].astype(jnp.float32)  # (B, K)
        nw = batch["parse_n_words"].astype(jnp.float32)  # (B,)
        p_spans = jnp.roll(spans, shift, axis=0)
        p_sw = jnp.roll(sw, shift, axis=0)
        nw_safe = jnp.maximum(nw, 1.0)[:, None]
        ratio_a = sw / nw_safe
        valid_a = (spans[..., 0] >= 0) & (ratio_a > lam2) & (ratio_a < lam1)
        # Reference quirk: partner ratio measured vs the ANCHOR's length.
        ratio_p = p_sw / nw_safe
        valid_p = (p_spans[..., 0] >= 0) & (ratio_p > lam2) & (ratio_p < lam1)

        def masked_pick(rng_, valid):
            g = jax.random.gumbel(rng_, valid.shape)
            return jnp.argmax(jnp.where(valid, g, -jnp.inf), axis=1)

        ka = masked_pick(pick_a_rng, valid_a)
        kp = masked_pick(pick_p_rng, valid_p)
        ok = jnp.any(valid_a, 1) & jnp.any(valid_p, 1) & (nw > 0)

        def pick(arr, k):
            return jnp.take_along_axis(arr, k[:, None, None], axis=1)[:, 0]

        sa, ea = pick(spans, ka)[:, 0], pick(spans, ka)[:, 1]
        sp, ep = pick(p_spans, kp)[:, 0], pick(p_spans, kp)[:, 1]
        s1 = jnp.where(ok, sa, s1)
        l1 = jnp.where(ok, ea - sa, l1)
        s2 = jnp.where(ok, sp, s2)
        l2 = jnp.where(ok, ep - sp, l2)
        # Reference label (mix_trees:70-76): words kept / new length.
        l1w = jnp.take_along_axis(sw, ka[:, None], 1)[:, 0]
        l2w = jnp.take_along_axis(p_sw, kp[:, None], 1)[:, 0]
        new_words = jnp.maximum(nw - l1w + l2w, 1.0)
        lab = jnp.where(ok, (new_words - l2w) / new_words, lab)

    take_p = (pos >= s1[:, None]) & (pos < (s1 + l2)[:, None])
    take_suffix = pos >= (s1 + l2)[:, None]
    idx_p = jnp.clip(s2[:, None] + pos - s1[:, None], 0, t - 1)
    idx_s = jnp.clip(pos - l2[:, None] + l1[:, None], 0, t - 1)
    mixed = {}
    for k in text_keys:
        a = batch[k]
        p = jnp.roll(batch[k], shift, axis=0)
        from_p = jnp.take_along_axis(p, idx_p, axis=1)
        from_s = jnp.take_along_axis(a, idx_s, axis=1)
        mixed[k] = jnp.where(take_p, from_p, jnp.where(take_suffix, from_s, a))
    if "input_mask" in batch:
        len_a = jnp.sum(batch["input_mask"].astype(jnp.int32), axis=1)
        new_len = jnp.clip(len_a - l1 + l2, 0, t)
        mixed["input_mask"] = (pos < new_len[:, None]).astype(
            batch["input_mask"].dtype
        )
    for k in (*text_keys, *(["input_mask"] if "input_mask" in batch else [])):
        out[k] = jnp.concatenate([batch[k], mixed[k]], 0)
    for k in ("feats", "boxes", "pixels", "pixels_u8", "pixel_rect",
              "pixel_mask"):
        if k in batch:
            out[k] = jnp.concatenate([batch[k], batch[k]], 0)
    if mode.endswith("_v1"):
        # treemix_v1: answer mass shrinks with the swapped word fraction.
        pet_target = target * lab[:, None]
    else:  # treemix / treemix_v2 / treemix_both: zero (the committed
        # reference path, gqa_mixup_both.py:193-196)
        pet_target = jnp.zeros_like(target)
    out["target"] = jnp.concatenate([target, pet_target], 0)
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
    lam1: float = 0.5,
    lam2: float = 0.05,
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

    if mode == "treemix_both":
        # gqa_mixup_both.py:180-230: flip a coin per batch between the
        # constituency sentence splice and the RoI-window image mixup
        # (both append pseudo-UQ rows of identical shapes -> lax.cond).
        coin_rng, aug_rng = jax.random.split(rng)
        coin = jax.random.bernoulli(coin_rng)
        return jax.lax.cond(
            coin,
            lambda: _treemix_augment(
                batch, aug_rng, alpha, beta, "treemix_v2", lam1, lam2
            ),
            lambda: mixup_augment(
                batch, aug_rng, alpha, beta, "mixup_v2",
                uq_as_class=uq_as_class,
            ),
        )
    if mode.startswith("treemix"):
        return _treemix_augment(batch, rng, alpha, beta, mode, lam1, lam2)

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
    lam1: float = 0.5,
    lam2: float = 0.05,
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
        r1, r2 = (
            jax.random.wrap_key_data(
                jax.random.bits(r, (4,), jnp.uint32), impl="rbg"
            )
            for r in jax.random.split(rng)
        )
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
        # Dropout masks draw bits over every hidden activation; route
        # them through the hardware RNG (rbg) instead of threefry —
        # augmentation draws keep the original key chain.
        drop_rng = jax.random.wrap_key_data(
            jax.random.bits(drop_rng, (4,), jnp.uint32), impl="rbg"
        )
        if sample_pair:
            batch = rp_augment(batch, aug_rng)
        elif mixup_mode:
            batch = mixup_augment(
                batch, aug_rng, mixup_alpha, mixup_beta, mixup_mode,
                uq_as_class=uq_as_class, lam1=lam1, lam2=lam2,
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


def make_weighted_clip_train_step(
    forward: Callable,
    clip_similarity: Callable,
    *,
    temperature: float = 1.0,
    grad_clip: float = 5.0,
    clip_grad_clip: float = 5.0,
    donate: bool = True,
):
    """Joint min-max step for ``--strategy weight --update_weight_model``
    (``gqa_weight.py:125-238``): the VQA model minimizes
    ``0.5 * (pos BCE + CLIP-weighted negative BCE)`` while the CLIP weight
    model is trained to MAXIMIZE the weighted negative loss
    (``loss_w = -loss_neg``, Adam lr 1e-5, both grads clipped by norm 5.0).

    TPU-native formulation: instead of the reference's two backward passes
    (``loss.backward(retain_graph=True)`` then ``loss_w.backward()``), one
    ``jax.grad`` over a sum of the two objectives with cross-terms
    ``stop_gradient``-ed — exact because the negative-pair weights depend
    only on CLIP params and the per-row losses only on model params, so
    each objective's gradient w.r.t. the *other* param set is zero.  The
    whole min-max (both towers' fwd+bwd, both optimizer updates) runs in a
    single jit dispatch.

    ``clip_similarity(clip_params, ids, mask, pixels) -> (B,)`` must return
    the logit_scale-scaled similarity (``gqa_weight.py:184-186``; the scale
    is a frozen copy per ``gqa_weight.py:82-83`` — fold the stop_gradient
    inside).  The batch carries ``pixels`` (anchor images, CLIP-preprocessed)
    and ``clip_ids``/``clip_mask`` (anchor questions, CLIP-tokenized);
    negatives reuse the model path's ``neg_shift`` roll so the CLIP pair
    (pos image, rolled question) is exactly the model's negative pair.

    Returns ``step(state, clip_state, batch, rng) -> (state, clip_state,
    aux)``.
    """

    def joint_loss(params, clip_params, batch, rng):
        r1, r2 = (
            jax.random.wrap_key_data(
                jax.random.bits(r, (4,), jnp.uint32), impl="rbg"
            )
            for r in jax.random.split(rng)
        )
        shift = batch["neg_shift"]
        # Negative-pair weights from the CURRENT CLIP params: positive
        # images x rolled (negative) questions, softmax over the batch at
        # --temperature (gqa_weight.py:154-186).
        sim = clip_similarity(
            clip_params,
            jnp.roll(batch["clip_ids"], shift, axis=0),
            jnp.roll(batch["clip_mask"], shift, axis=0),
            batch["pixels"],
        ).astype(jnp.float32)
        w = jax.nn.softmax(sim / temperature)

        out_pos = forward(params, batch, deterministic=False, rng=r1)
        lp = out_pos["logits"].astype(jnp.float32)
        k = lp.shape[-1]
        loss_pos = jnp.mean(optax_sigmoid_bce(lp, batch["target"])) * k

        neg = dict(batch)
        for key in ("input_ids", "input_mask", "segment_ids", "token_ids"):
            if key in batch:
                neg[key] = jnp.roll(batch[key], shift, axis=0)
        out_neg = forward(params, neg, deterministic=False, rng=r2)
        ln = out_neg["logits"].astype(jnp.float32)
        per_row = jnp.mean(
            optax_sigmoid_bce(ln, jnp.zeros_like(ln)), axis=-1
        ) * k

        # Model objective: weights are data (no model->weights edge).
        wd = jax.lax.stop_gradient(w)
        loss_neg = jnp.sum(per_row * wd) / jnp.maximum(jnp.sum(wd), 1e-8)
        loss_model = 0.5 * (loss_pos + loss_neg)
        # CLIP objective: per-row losses are data (no clip->logits edge).
        pr = jax.lax.stop_gradient(per_row)
        loss_clip = -jnp.sum(pr * w) / jnp.maximum(jnp.sum(w), 1e-8)

        probs = jax.nn.sigmoid(lp)
        aux = {
            "loss": loss_model,
            "loss_w": -loss_clip,
            "score": jnp.max(probs, axis=-1),
            "label": jnp.argmax(probs, axis=-1),
        }
        return loss_model + loss_clip, aux

    def step(state: TrainState, clip_state: TrainState, batch, rng):
        (g_model, g_clip), aux = jax.grad(
            joint_loss, argnums=(0, 1), has_aux=True
        )(state.params, clip_state.params, batch, rng)
        if grad_clip and grad_clip > 0:
            g_model = global_norm_clip(g_model, grad_clip)
        if clip_grad_clip and clip_grad_clip > 0:
            g_clip = global_norm_clip(g_clip, clip_grad_clip)
        return state.apply_gradients(g_model), clip_state.apply_gradients(
            g_clip
        ), aux

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_chunked_train_step(step):
    """Run K train steps in ONE device dispatch.

    On remote/tunneled chips a jit dispatch is a synchronous round trip
    (docs/kernels.md "Dispatch anatomy"), so a per-step train loop pays
    the wire once per optimizer step; scanning K steps inside one jit
    pays it once per K (``--train_chunk``, the training analogue of
    ``--eval_chunk``).  ``step`` must be built with ``donate=False``
    (the scan carry owns the state buffers); the outer jit donates the
    incoming state instead, so memory use matches the per-step loop.

    Returns ``run(state, batches, key) -> (state, key', stacked_aux)``
    where ``batches`` is a TUPLE of K same-shape device batch dicts
    (stacked inside the jit) and ``key`` is the loop's PRNG key: the
    scan performs the per-step ``key, sub = jax.random.split(key)``
    ITSELF — bitwise the sequence the per-step loop draws, so
    trajectories are identical (pinned in tests/test_runner.py) — and
    returns the advanced key for the caller's tail steps.  Doing the
    splits in-jit matters: each host-side ``split`` is its own dispatch
    round trip, which would re-pay per step what the chunking saves.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batches, key):
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches
        )

        def body(carry, b):
            st, k = carry
            k, sub = jax.random.split(k)
            st, aux = step(st, b, sub)
            return (st, k), aux

        (state, key), auxs = jax.lax.scan(body, (state, key), stacked)
        return state, key, auxs

    return run


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
