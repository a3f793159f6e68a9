"""Online distillation (reference ``src/tasks/gqa_distill_online.py``).

Train a student with mixup/weighted-sum pseudo rows whose targets are
blended with a frozen teacher's sigmoid predictions:

    outdom = rows with target mass < 1 (the appended pseudo rows)
    target[outdom] = lam * sigmoid(teacher(x)) + (1 - lam) * target[outdom]
    loss = BCE(student(x), target) * K      (``:208-216``)

The whole thing — augmentation, teacher forward, target blend, student
update — runs inside one jitted step; the reference re-enters Python and
does a separate CUDA teacher pass per batch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rgqa_tpu.train.losses import optax_sigmoid_bce
from rgqa_tpu.train.step import global_norm_clip, mixup_augment

__all__ = ["make_online_distill_step"]


def make_online_distill_step(
    student_forward: Callable,
    teacher_forward: Callable,
    *,
    lam: float = 0.5,
    mixup_mode: Optional[str] = "mixup_v1",
    mixup_alpha: float = 1.0,
    mixup_beta: float = 1.0,
    lam1: float = 0.5,
    lam2: float = 0.05,
    grad_clip: float = 5.0,
    donate: bool = True,
):
    """Returns ``step(state, teacher_params, batch, rng) -> (state, aux)``."""

    def loss_fn(params, teacher_params, batch, rng):
        drop_rng, aug_rng = jax.random.split(rng)
        if mixup_mode and mixup_mode != "none":
            batch = mixup_augment(
                batch, aug_rng, mixup_alpha, mixup_beta, mixup_mode,
                lam1=lam1, lam2=lam2,
            )
        target = batch["target"]
        outdom = (jnp.sum(target, axis=-1) < 1.0).astype(jnp.float32)[:, None]

        t_out = teacher_forward(teacher_params, batch, deterministic=True)
        soft = jax.nn.sigmoid(
            jax.lax.stop_gradient(t_out["logits"].astype(jnp.float32))
        )
        target = jnp.where(
            outdom > 0, lam * soft + (1.0 - lam) * target, target
        )

        out = student_forward(params, batch, deterministic=False, rng=drop_rng)
        logits = out["logits"].astype(jnp.float32)
        loss = jnp.mean(optax_sigmoid_bce(logits, target)) * logits.shape[-1]
        probs = jax.nn.sigmoid(logits)
        return loss, {
            "loss": loss,
            "score": jnp.max(probs, axis=-1),
            "label": jnp.argmax(probs, axis=-1),
        }

    def step(state, teacher_params, batch, rng):
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, teacher_params, batch, rng
        )
        if grad_clip:
            grads = global_norm_clip(grads, grad_clip)
        return state.apply_gradients(grads), aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())
