"""Multi-head attention: XLA reference path + fused Pallas TPU kernel.

The RGQA workloads attend over short sequences (<= 40 text tokens, 36 RoIs),
so unlike long-context flash attention the whole ``(S_q, S_kv)`` score tile
fits in VMEM.  The Pallas kernel therefore fuses QK^T -> bias add -> softmax
-> PV into a single VMEM-resident pass per (batch, head-block), avoiding the
two HBM round-trips XLA sometimes leaves un-fused, and runs the matmuls on
the MXU in one shot.

Numerics match the reference transformer (``src/lxrt/modeling.py:295-347``):
scores scaled by ``1/sqrt(head_dim)``, additive float mask (``-10000`` style)
added before softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgqa_tpu.ops.common import interpret_mode, pallas_enabled

__all__ = ["multi_head_attention", "attention_probs"]


def _mha_xla(q, k, v, bias):
    """Reference path: plain jnp, fully fusable by XLA."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention_probs(q, k, bias):
    """Attention probabilities only (for the visualization path,
    reference ``src/lxrt_vis/modeling.py:320-350``)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def _fused_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    """One (batch*head-block) tile: softmax(q k^T * scale + bias) v.

    Block shapes: q (H_BLK, S_q, D), k/v (H_BLK, S_kv, D),
    bias (H_BLK, S_q, S_kv).  Everything resident in VMEM.
    """
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale + bias_ref[:].astype(jnp.float32)
    # Numerically-stable softmax along the last axis.
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h_block",))
def _mha_pallas(q, k, v, bias, h_block: int = 4):
    """Fused attention over a (B*H / h_block) grid.

    Heads are folded into the batch dimension and processed ``h_block`` at a
    time so each tile carries enough rows to fill MXU/VPU lanes at the small
    sequence lengths RGQA uses.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bh = b * h
    q2 = q.reshape(bh, sq, d)
    k2 = k.reshape(bh, skv, d)
    v2 = v.reshape(bh, skv, d)
    bias2 = jnp.broadcast_to(bias, (b, h, sq, skv)).reshape(bh, sq, skv)

    # Pad the folded batch to a multiple of the head block.
    pad = (-bh) % h_block
    if pad:
        q2 = jnp.pad(q2, ((0, pad), (0, 0), (0, 0)))
        k2 = jnp.pad(k2, ((0, pad), (0, 0), (0, 0)))
        v2 = jnp.pad(v2, ((0, pad), (0, 0), (0, 0)))
        bias2 = jnp.pad(bias2, ((0, pad), (0, 0), (0, 0)))
    n_blocks = q2.shape[0] // h_block

    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=1.0 / math.sqrt(d)),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((h_block, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_block, skv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_block, skv, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_block, sq, skv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (h_block, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q2.shape[0], sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * sq * skv * d * 2,
            bytes_accessed=(q2.size + k2.size + v2.size + bias2.size) * q2.dtype.itemsize,
            transcendentals=bh * sq * skv,
        ),
        interpret=interpret_mode(),
    )(q2, k2, v2, bias2)
    if pad:
        out = out[:bh]
    return out.reshape(b, h, sq, d)


def multi_head_attention(q, k, v, bias=None, *, force_xla: bool = False):
    """``softmax(q k^T / sqrt(d) + bias) v`` over (B, H, S, D) tensors.

    ``bias`` is an additive float mask broadcastable to (B, H, S_q, S_kv)
    (the reference's ``-10000 * (1 - mask)`` convention,
    ``src/lxrt/modeling.py:857-873``).  Dispatches to the fused Pallas
    kernel on TPU unless ``force_xla``.
    """
    if force_xla or not pallas_enabled():
        return _mha_xla(q, k, v, bias)
    if bias is None:
        bias = jnp.zeros((1, 1, 1, 1), dtype=q.dtype)
    return _mha_pallas(q, k, v, bias)
