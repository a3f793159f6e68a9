"""VILLA-style adversarial training (reference ``src/tasks/gqa_adv.py``).

PGD in embedding space: text deltas added to the summed word embeddings
pre-LayerNorm, image deltas added to the RoI features (the hooks the
reference implements as the ``src/lxrt_adv`` model fork; here they are the
``txt_delta`` / ``img_delta`` forward arguments).  Per batch:

1. clean forward -> reference distribution;
2. ``adv_steps`` inner iterations: loss = (BCE + w_kl * symmetric KL to the
   clean distribution) / adv_steps; parameter grads accumulate across
   iterations; deltas take a normalized-gradient *ascent* step with l2/linf
   projection (``gqa_adv.py:138-218``);
3. one optimizer update from the accumulated grads (+ global clip 5.0).

The whole procedure — including the inner loop — is one jitted function
(``lax.fori_loop``), where the reference re-enters Python per step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from rgqa_tpu.train.losses import bce_answer_loss
from rgqa_tpu.train.step import global_norm_clip

__all__ = ["AdvConfig", "make_adv_train_step"]


class AdvConfig(NamedTuple):
    steps: int = 3
    lr_txt: float = 1e-3
    lr_img: float = 1e-3
    max_norm: float = 0.0
    kl_weight: float = 1.5
    norm_type: str = "l2"  # l2 | linf
    modality: tuple = ("text", "image")


def _normalize_step(grad, lr, norm_type):
    flat = grad.reshape(grad.shape[0], -1)
    if norm_type == "l2":
        denorm = jnp.maximum(jnp.linalg.norm(flat, axis=1), 1e-8)
    else:
        denorm = jnp.maximum(jnp.max(jnp.abs(flat), axis=1), 1e-8)
    return lr * grad / denorm.reshape(-1, *([1] * (grad.ndim - 1)))


def _project(delta, max_norm, norm_type):
    if max_norm <= 0:
        return delta
    if norm_type == "linf":
        return jnp.clip(delta, -max_norm, max_norm)
    flat = delta.reshape(delta.shape[0], -1)
    norm = jnp.linalg.norm(flat, axis=1)
    scale = jnp.where(norm > max_norm, max_norm / jnp.maximum(norm, 1e-8), 1.0)
    return delta * scale.reshape(-1, *([1] * (delta.ndim - 1)))


def make_adv_train_step(
    forward: Callable,
    txt_delta_shape_of: Callable[[dict], tuple],
    cfg: AdvConfig = AdvConfig(),
    *,
    grad_clip: float = 5.0,
    donate: bool = True,
):
    """Build the jitted VILLA step.

    ``txt_delta_shape_of(batch)`` returns the (B, T, H) shape of the text
    embedding delta (hidden size is a model property the step can't see).
    """

    def symmetric_kl(logits, gt_logits):
        p = jax.nn.softmax(gt_logits, axis=-1)
        logp = jax.nn.log_softmax(gt_logits, axis=-1)
        q = jax.nn.softmax(logits, axis=-1)
        logq = jax.nn.log_softmax(logits, axis=-1)
        kl_pq = p * (logp - logq)  # KL(p||q), torch kl_div(logq, p)
        kl_qp = q * (logq - logp)
        return jnp.mean(kl_pq + kl_qp) * logits.shape[-1]

    def step(state, batch, rng):
        target = batch["target"]
        clean = forward(state.params, batch, deterministic=True)
        gt_logits = jax.lax.stop_gradient(clean["logits"].astype(jnp.float32))

        txt_shape = txt_delta_shape_of(batch)
        img_shape = batch["feats"].shape

        def inner_loss(params, d_txt, d_img, drop_rng):
            out = forward(
                params,
                batch,
                deterministic=False,
                rng=drop_rng,
                txt_delta=d_txt if "text" in cfg.modality else None,
                img_delta=d_img if "image" in cfg.modality else None,
            )
            logits = out["logits"].astype(jnp.float32)
            bce = bce_answer_loss(logits, target)
            kl = symmetric_kl(logits, gt_logits)
            return (bce + cfg.kl_weight * kl) / cfg.steps

        grad_fn = jax.grad(inner_loss, argnums=(0, 1, 2))
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(i, carry):
            d_txt, d_img, acc = carry
            drop_rng = jax.random.fold_in(rng, i)
            g_params, g_txt, g_img = grad_fn(state.params, d_txt, d_img, drop_rng)
            acc = jax.tree_util.tree_map(jnp.add, acc, g_params)
            # Ascent on the adversarial loss; no update on the final step
            # (gqa_adv.py:170-172).
            last = i == cfg.steps - 1
            if "text" in cfg.modality:
                new_txt = _project(
                    d_txt + _normalize_step(g_txt, cfg.lr_txt, cfg.norm_type),
                    cfg.max_norm, cfg.norm_type,
                )
                d_txt = jnp.where(last, d_txt, new_txt)
            if "image" in cfg.modality:
                new_img = _project(
                    d_img + _normalize_step(g_img, cfg.lr_img, cfg.norm_type),
                    cfg.max_norm, cfg.norm_type,
                )
                d_img = jnp.where(last, d_img, new_img)
            return d_txt, d_img, acc

        d_txt0 = jnp.zeros(txt_shape, jnp.float32)
        d_img0 = jnp.zeros(img_shape, jnp.float32)
        _, _, grads = jax.lax.fori_loop(
            0, cfg.steps, body, (d_txt0, d_img0, zero_grads)
        )
        if grad_clip:
            grads = global_norm_clip(grads, grad_clip)
        new_state = state.apply_gradients(grads)
        probs = jax.nn.sigmoid(gt_logits)
        aux = {
            "loss": bce_answer_loss(gt_logits, target),
            "label": jnp.argmax(probs, axis=-1),
            "score": jnp.max(probs, axis=-1),
        }
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())
