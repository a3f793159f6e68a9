"""Cheap elementwise dropout for TPU hidden-activation sites.

``flax.linen.Dropout`` draws a uint32 per element via threefry
(``jax.random.bernoulli``); measured on v5e that generator alone costs
3.5x the hardware rbg path, and a full LXMERT forward has ~58
hidden-dropout sites (docs/kernels.md, MC-dropout section).

``cheap_dropout`` compares a **bfloat16 uniform** (exactly 8 mantissa
bits -> uniform over {0, 1/256, ..., 255/256}, native 16-bit VPU lanes —
the measured-fastest mask representation of u8/u32/f32/bf16,
``experiments/rngcost2_exp.py``) against the 1/256-quantized threshold
and derives the keep-scale from that quantized rate, so ``E[out] = x``
holds exactly (e.g. the BERT 0.1 becomes 26/256 = 0.1016; dropout rates
are statistical regularizers, checkpoint-parity eval paths run
deterministic).

The reference relies on torch's CUDA dropout (Philox); this is the
TPU-native counterpart with the same Bernoulli(rate), 1/(1-rate)
semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["cheap_dropout", "HiddenDropout"]


def cheap_dropout(x, rate: float, rng):
    """Inverted dropout at the 1/256-quantized rate, exact expectation.

    The mask compares a **bfloat16 uniform** against the quantized
    threshold: bf16 uniforms carry exactly 8 mantissa bits, so ``u`` is
    uniform over {0, 1/256, ..., 255/256} and ``P(u >= t/256)`` is
    exactly ``(256-t)/256`` — the same Bernoulli as a byte threshold,
    but compared in the VPU's native 16-bit lanes (measured fastest of
    the u8/u32/f32/bf16 mask representations on v5e, docs/kernels.md).
    """
    t = int(round(float(rate) * 256.0))
    if t <= 0:
        return x
    keep_p = (256 - t) / 256.0
    u = jax.random.uniform(rng, x.shape, jnp.bfloat16)
    keep = u >= jnp.bfloat16(t / 256.0)
    return jnp.where(keep, x * (1.0 / keep_p), jnp.zeros_like(x))


class HiddenDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` on hidden activations (no params, so
    checkpoint trees are unchanged); uses the ``dropout`` rng stream."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return cheap_dropout(x, self.rate, self.make_rng("dropout"))
