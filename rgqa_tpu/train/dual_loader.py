"""Dual-loader pos/neg trainers: resampling (Yi et al.), POEM, WOODS.

Rebuild of ``src/tasks/gqa_resampling.py`` / ``gqa_poem.py`` (the two are
identical in the committed reference) and ``gqa_woods.py``:

- A learnable weight vector over the pseudo-UQ (negative) training set;
  per-epoch WeightedRandomSampler with ``softplus(w)**0.5``
  (``gqa_resampling.py:162-164``).
- Per batch: ``loss = loss_pos + <normalized w, per-row neg loss>``,
  minimized w.r.t. model params; ``loss_w = -loss_neg`` ascended w.r.t.
  the weights via SGD(momentum=0.9) (``:184-215``).

Note: in the reference, *both* ``loss.backward()`` and
``loss_w.backward()`` accumulate into the weight gradient, so the two
contributions cancel and the committed weight update is a no-op.  This
implementation realizes the intended min-max: model grads from ``loss``
only, weight grads from ``loss_w`` only.

WOODS (``gqa_woods.py:94-157``) degenerates to plain unweighted BCE over
the concatenated pos+neg batch — expressed here as ``weighted=False``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgqa_tpu.train.losses import optax_sigmoid_bce
from rgqa_tpu.train.step import global_norm_clip

__all__ = ["NegativeWeights", "make_minmax_step", "sample_negative_indices"]


class NegativeWeights:
    """Learnable per-negative weights + their SGD-momentum optimizer."""

    def __init__(self, n: int, lr_w: float = 0.1):
        self.values = jnp.zeros((n,), jnp.float32)
        self.tx = optax.sgd(lr_w, momentum=0.9)
        self.opt_state = self.tx.init(self.values)

    def sampling_weights(self) -> np.ndarray:
        """Per-epoch sampler weights: softplus(w)^0.5."""
        return np.asarray(jax.nn.softplus(self.values)) ** 0.5

    def apply(self, grads):
        updates, self.opt_state = self.tx.update(grads, self.opt_state, self.values)
        self.values = optax.apply_updates(self.values, updates)


def sample_negative_indices(rng: np.random.Generator, weights: np.ndarray, size: int) -> np.ndarray:
    p = weights / weights.sum()
    return rng.choice(len(weights), size=size, replace=True, p=p)


def make_minmax_step(
    forward: Callable,
    *,
    weighted: bool = True,
    grad_clip: float = 5.0,
    donate: bool = True,
):
    """Jitted step over (pos batch, neg batch, neg weight slice).

    Returns ``step(state, w_values, pos, neg, wids, rng) ->
    (state, w_grads, aux)`` — the caller owns the weight optimizer (it
    lives outside the sharded train state, like the reference's separate
    ``optim_w``).
    """

    def losses(params, w_values, pos, neg, wids, rng):
        r1, r2 = jax.random.split(rng)
        out_pos = forward(params, pos, deterministic=False, rng=r1)
        out_neg = forward(params, neg, deterministic=False, rng=r2)
        lp = out_pos["logits"].astype(jnp.float32)
        ln = out_neg["logits"].astype(jnp.float32)
        k = lp.shape[-1]
        loss_pos = jnp.mean(optax_sigmoid_bce(lp, pos["target"])) * k
        per_elem = optax_sigmoid_bce(ln, neg["target"])  # (B, K)
        if weighted:
            w = jax.nn.softplus(w_values)
            scale = jnp.mean(jnp.sqrt(w)) / jnp.sqrt(jnp.mean(w))
            row_w = scale * jnp.sqrt(w[wids] / jnp.mean(w))
            loss_neg = jnp.sum(row_w[:, None] * per_elem) / ln.shape[0]
        else:
            loss_neg = jnp.mean(per_elem) * k
        return loss_pos, loss_neg, lp

    def model_loss(params, w_values, pos, neg, wids, rng):
        lp_loss, ln_loss, lp = losses(
            params, jax.lax.stop_gradient(w_values), pos, neg, wids, rng
        )
        return lp_loss + ln_loss, (lp_loss, ln_loss, lp)

    def weight_loss(w_values, params, pos, neg, wids, rng):
        _, ln_loss, _ = losses(params, w_values, pos, neg, wids, rng)
        return -ln_loss

    def step(state, w_values, pos, neg, wids, rng):
        grads, (lp_loss, ln_loss, lp) = jax.grad(model_loss, has_aux=True)(
            state.params, w_values, pos, neg, wids, rng
        )
        if grad_clip:
            grads = global_norm_clip(grads, grad_clip)
        new_state = state.apply_gradients(grads)
        if weighted:
            w_grads = jax.grad(weight_loss)(
                w_values, state.params, pos, neg, wids, rng
            )
        else:
            w_grads = jnp.zeros_like(w_values)
        probs = jax.nn.sigmoid(lp)
        aux = {
            "loss": lp_loss + ln_loss,
            "loss_pos": lp_loss,
            "loss_neg": ln_loss,
            "label": jnp.argmax(probs, axis=-1),
            "score": jnp.max(probs, axis=-1),
        }
        return new_state, w_grads, aux

    return jax.jit(step, donate_argnums=(0,) if donate else ())
