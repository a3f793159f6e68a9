"""GRU question encoder via ``lax.scan``.

TPU-native replacement for the cuDNN GRU the reference uses in BUTD
(``src/butd/butd.py:48-73``).  Follows torch GRU gate semantics exactly
(gate order r, z, n; two bias vectors) so imported checkpoints reproduce:

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

The input projection for all timesteps is computed as one batched matmul
(MXU-friendly); only the recurrent half runs inside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gru_scan"]


def gru_scan(x, h0, w_ih, w_hh, b_ih, b_hh):
    """Run a GRU over ``x`` (B, T, D_in) with initial state ``h0`` (B, H).

    ``w_ih`` (3H, D_in) and ``w_hh`` (3H, H) stack the r/z/n gates in torch
    order; ``b_ih``/``b_hh`` are (3H,).  Returns (outputs (B, T, H),
    final state (B, H)).
    """
    hidden = h0.shape[-1]
    # Hoist the input projection out of the recurrence: one big MXU matmul.
    x_proj = jnp.einsum("btd,gd->btg", x, w_ih) + b_ih  # (B, T, 3H)

    def step(h, xp):
        hp = h @ w_hh.T + b_hh  # (B, 3H)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # scan over time: move T to the leading axis.
    h_final, outs = jax.lax.scan(step, h0, x_proj.transpose(1, 0, 2))
    del hidden
    return outs.transpose(1, 0, 2), h_final
