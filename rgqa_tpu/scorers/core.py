"""Jittable rejection scorers: MSP, energy, ODIN, MC-dropout, branched.

Each scorer is a factory taking the backbone's uniform ``forward`` adapter
and returning a jitted ``score_fn(params, batch) -> {"label", "score"}``.
The gradient-at-eval scorers (ODIN; Mahalanobis in ``maha.py``) express the
reference's eval-time ``loss.backward()`` input perturbation
(``gqa_odin.py:93-135``) as one ``jax.grad`` w.r.t. ``(feats, boxes)`` —
fully on device, inside the same jit as the rescoring pass.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from rgqa_tpu.train.losses import optax_sigmoid_bce

__all__ = [
    "make_msp_scorer",
    "make_energy_scorer",
    "make_odin_scorer",
    "make_dropout_scorer",
    "make_branched_scorer",
    "make_match_scorer",
    "ensemble_merge",
]


def make_msp_scorer(forward) -> Callable:
    """Max sigmoid probability (``gqa_conf.py:326``)."""

    @jax.jit
    def score_fn(params, batch):
        out = forward(params, batch, deterministic=True)
        logits = out["logits"].astype(jnp.float32)
        if logits.ndim == 1:  # single-logit heads (caps / separate)
            logits = logits[:, None]
        probs = jax.nn.sigmoid(logits)
        return {
            "label": jnp.argmax(probs, axis=-1),
            "score": jnp.max(probs, axis=-1),
            "probs": probs,
        }

    return score_fn


def make_energy_scorer(forward, *, topk: int = 2) -> Callable:
    """Energy of the top-k logits (``gqa_energy.py:204-206``):
    label from max sigmoid, score = sum softplus(top-2 logits)."""

    @jax.jit
    def score_fn(params, batch):
        out = forward(params, batch, deterministic=True)
        logits = out["logits"].astype(jnp.float32)
        top = jax.lax.top_k(logits, topk)[0]
        return {
            "label": jnp.argmax(logits, axis=-1),
            "score": jnp.sum(jax.nn.softplus(top), axis=-1),
        }

    return score_fn


def make_odin_scorer(
    forward, *, temperature: float = 1e5, noise: float = 1e-4
) -> Callable:
    """ODIN (``gqa_odin.py:93-135``): BCE toward thresholded pseudo-labels,
    sign-gradient perturbation of (feats, boxes) by ``-noise``, rescore with
    temperature-scaled sigmoid."""

    def pseudo_loss(feats, boxes, params, batch):
        b = dict(batch)
        b["feats"], b["boxes"] = feats, boxes
        out = forward(params, b, deterministic=True)
        logits = out["logits"].astype(jnp.float32)
        preds = jax.nn.sigmoid(logits / temperature)
        labels = (preds >= 0.5).astype(jnp.float32)
        loss = optax_sigmoid_bce(logits, jax.lax.stop_gradient(labels))
        # Reference gathers the per-row loss at the max-pred column.
        idx = jnp.argmax(preds, axis=-1)
        picked = jnp.take_along_axis(loss, idx[:, None], axis=-1)[:, 0]
        return jnp.mean(picked)

    @jax.jit
    def score_fn(params, batch):
        feats = batch["feats"].astype(jnp.float32)
        boxes = batch["boxes"].astype(jnp.float32)
        g_feats, g_boxes = jax.grad(pseudo_loss, argnums=(0, 1))(
            feats, boxes, params, batch
        )
        # torch.ge(g, 0) -> {0,1} -> {-1,+1}; x_pt = x - noise * sign01(g).
        sign = lambda g: (jnp.where(g >= 0, 1.0, 0.0) - 0.5) * 2.0
        b = dict(batch)
        b["feats"] = feats - noise * sign(g_feats)
        b["boxes"] = boxes - noise * sign(g_boxes)
        out = forward(params, b, deterministic=True)
        probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32) / temperature)
        return {
            "label": jnp.argmax(probs, axis=-1),
            "score": jnp.max(probs, axis=-1),
        }

    # The sign-gradient perturbation (~1e-4) needs off-lattice f32
    # inputs: a host-side bf16 feed pre-rounds feats onto the bf16 grid
    # and the perturbation then rounds away at the model's input cast.
    # The eval feed checks this flag (eval.ScoringMixin._iter_eval).
    score_fn.needs_f32_inputs = True
    return score_fn


def make_dropout_scorer(forward, seed_list: Sequence[int]) -> Callable:
    """MC-dropout (``gqa_dropout.py:92-118``): answer = majority vote of
    the per-pass argmaxes, score = mean of per-pass max-sigmoid.

    The reference loops over seeds re-enabling dropout modules, one
    dispatch per pass; here the S stochastic passes run as a
    ``lax.scan`` **inside one jitted program** — one dispatch, one
    fetch, and each pass keeps the serving batch size (the measured
    optimum: folding the passes into the batch dimension instead pushed
    the attention kernels onto long grids and their smaller batch
    block, a net loss — docs/kernels.md).  Vote ties break toward the
    first pass's answer (the reference's ``Counter.most_common``
    insertion-order behavior), then toward the lower class index.
    """
    seeds = [int(s) for s in seed_list]
    n_pass = len(seeds)
    # The seed list's values fold into the PRNG key so distinct lists
    # give distinct stochastic draws (the list's *length* sets S).
    # ``rbg`` impl: the hidden-dropout masks draw bits over every
    # (B, seq, hidden) activation — threefry generates those on the VPU
    # at matmul-competitive cost, while rbg uses the hardware RNG.
    key0 = jax.random.key(seeds[0], impl="rbg")
    for s in seeds[1:]:
        key0 = jax.random.fold_in(key0, s)

    @jax.jit
    def score_fn(params, batch):
        def one_pass(_, i):
            out = forward(
                params, batch, deterministic=False,
                rng=jax.random.fold_in(key0, i),
            )
            logits = out["logits"].astype(jnp.float32)
            if logits.ndim == 1:
                logits = logits[:, None]
            probs = jax.nn.sigmoid(logits)
            return None, (jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1))

        _, (labels, maxp) = jax.lax.scan(
            one_pass, None, jnp.arange(n_pass)
        )  # labels/maxp: (S, B)
        first = labels[0]
        # Majority vote without materialising a (B, num_answers) count
        # table: each pass's candidate scores how many passes agree with
        # it (S is tiny, e.g. 5, so the (S, S, B) equality is cheap).
        eq = labels[:, None, :] == labels[None, :, :]  # (S, S, B)
        # Integer tally (x2 so the first-pass half-bonus stays integral):
        # a float epsilon tie-break is BELOW f32 resolution for nearby
        # labels (2.0 - 7e-9 == 2.0 in f32) — do it exactly instead.
        tally2 = 2 * jnp.sum(eq.astype(jnp.int32), axis=0)  # (S, B)
        tally2 = tally2 + (labels == first[None, :]).astype(jnp.int32)
        # Break remaining ties toward the LOWER class index, exactly:
        # lexicographic (tally, -label) packed into one int32 (tally2
        # <= 2S+1, labels < 2^20 for any plausible answer vocab).
        combined = tally2 * (1 << 20) - labels.astype(jnp.int32)
        best_pass = jnp.argmax(combined, axis=0)  # (B,)
        label = jnp.take_along_axis(labels, best_pass[None, :], axis=0)[0]
        return {"label": label, "score": jnp.mean(maxp, axis=0)}

    return score_fn


def make_branched_scorer(forward, *, mix: bool = False) -> Callable:
    """Branched confidence head (``gqa_branched.py:200-215``): score =
    sigmoid(conf), or MSP * sigmoid(conf) with ``--mix_branched_score``."""

    @jax.jit
    def score_fn(params, batch):
        out = forward(params, batch, deterministic=True)
        probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
        conf = jax.nn.sigmoid(out["conf"].astype(jnp.float32))
        msp = jnp.max(probs, axis=-1)
        return {
            "label": jnp.argmax(probs, axis=-1),
            "score": msp * conf if mix else conf,
        }

    return score_fn


def make_match_scorer(forward, answer_forward=None) -> Callable:
    """LXMERT cross-modal match score (``gqa_lxrcap.py:98-120``):
    softmax(matched)[:, 1] from the pretraining head; the answer comes from
    ``answer_forward`` (a finetuned GQA model) when given, else from the
    pretraining QA head."""

    @jax.jit
    def score_fn(params_pair, batch):
        match_params, ans_params = params_pair
        out = forward(match_params, batch, deterministic=True)
        score = jax.nn.softmax(out["matched"].astype(jnp.float32), axis=-1)[:, 1]
        if answer_forward is not None:
            ans_out = answer_forward(ans_params, batch, deterministic=True)
            logits = ans_out["logits"].astype(jnp.float32)
        else:
            logits = out["qa"].astype(jnp.float32)
        return {"label": jnp.argmax(logits, axis=-1), "score": score}

    return score_fn


def ensemble_merge(prob_list, method: str = "mean"):
    """Merge per-model sigmoid vectors (``gqa_ensemble.py:158-176``)."""
    stack = jnp.stack(prob_list)  # (M, B, A)
    if method == "mean":
        merged = jnp.mean(stack, axis=0)
    elif method in ("multiply", "product"):
        merged = jnp.prod(stack, axis=0)
    else:
        raise ValueError(f"unknown ensemble method {method!r}")
    return {
        "label": jnp.argmax(merged, axis=-1),
        "score": jnp.max(merged, axis=-1),
        "probs": merged,
    }
