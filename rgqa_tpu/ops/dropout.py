"""Cheap elementwise dropout for TPU hidden-activation sites.

``flax.linen.Dropout`` draws a uint32 per element via threefry
(``jax.random.bernoulli``); measured on v5e that generator alone costs
3.5x the hardware rbg path, and a full LXMERT forward has ~58
hidden-dropout sites (docs/kernels.md, MC-dropout section).

``cheap_dropout`` compares one random **byte** per element against the
1/256-quantized threshold — the same Bernoulli contract as the
attention kernel's in-kernel byte masks (ops/attention.py) — and
derives the keep-scale from that quantized rate, so ``E[out] = x``
holds exactly (e.g. the BERT 0.1 becomes 26/256 = 0.1016; dropout
rates are statistical regularizers, checkpoint-parity eval paths run
deterministic).

A bf16-uniform comparison was shipped here first and REFUTED: jax's
bf16 uniform carries only 7 explicit mantissa bits, i.e. a 128-value
lattice {k/128}, so odd byte thresholds fell between lattice points —
keep probability off by 1/256 from the scale's assumption (biased
E[out]), and t=255 unreachable (everything dropped while scaling by
256).  Bytes restore the exact 1/256 semantics at half the random bits
of the bf16 draw; mask-application cost is representation-invariant on
v5e anyway (``experiments/rngcost2_exp.py``).

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

    One uint8 draw per element: ``P(byte >= t) = (256-t)/256`` exactly,
    for every ``t`` in [0, 256].  ``rate >= 255.5/256`` quantizes to
    t=256 — nothing can be kept, so the output is zeros (matching
    ``nn.Dropout``'s rate=1.0 behaviour) rather than dividing by a zero
    keep probability.
    """
    t = int(round(float(rate) * 256.0))
    if t <= 0:
        return x
    if t >= 256:
        return jnp.zeros_like(x)
    keep_p = (256 - t) / 256.0
    byte = jax.random.bits(rng, x.shape, jnp.uint8)
    keep = byte >= jnp.uint8(t)
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
