"""Multi-head attention: XLA reference path + fused Pallas TPU kernel.

RGQA attends over short sequences (<= 40 text tokens, 36 RoIs).  At these
shapes XLA's attention path is dominated by layout changes — the
(B, S, H*D) -> (B, H, S, D) transposes around the batched einsums — and by
poor MXU utilisation on the tiny per-head matmuls, not by FLOPs.  Measured
on v5e (batch 256, 12 heads, d=64): XLA 380 us (20x20 self), 510 us
(36x36 self), 875 us (20x36 cross) per attention op.

The fused kernel therefore operates directly on the **natural Dense output
layout** (B, S, H*D) with a (B, S_kv) additive mask vector: one grid cell
loads a batch-block into VMEM, loops the 12 heads over column slices, and
runs QK^T -> +bias -> softmax -> PV per head entirely VMEM-resident with
f32 accumulation.  No transposes, no (B, H, Sq, Skv) bias materialisation,
no HBM round-trips.  Measured at the shipped block size 32:
212/261/237 us for the same shapes — ~2x on self-attention, 3.4x on
cross-attention (full table: docs/kernels.md).

Long streams (ViLT's 165-185 tokens) on long grids exceed the DEFAULT
16 MiB scoped-VMEM cap at any full-sequence batch block; the forward
then retries the full-sequence grid under a **raised 24 MiB scoped
limit** (``CompilerParams(vmem_limit_bytes)`` — the cap is a compiler
default, not hardware; measured 25-30% over query tiling at ViLT
batch 256-384), and only past that switches to a **query-tiled** grid
(``_fused_qblocked_raw``: same kernel body, extra grid axis over query
blocks — softmax per row block is already complete, so no
online-softmax state is needed) instead of falling back to XLA.

Autodiff: the kernel carries a ``jax.custom_vjp`` whose backward is a
second Pallas kernel (recompute-based: dP = gV^T, dV = P^Tg,
dS = P(dP - rowsum(dP*P)), dQ = scale*dS*K, dK = scale*dS^T*Q) in the
same natural layout — measured +19% on the ODIN/Mahalanobis
grad-at-eval paths vs the XLA backward (2.65k -> 3.15k q/s).  The
backward has its own raised scoped-VMEM tiers (64/80 MiB — its f32
scratch is ~10x the forward's): ViLT's 165-token training backward runs
the kernel 2.3-2.8x faster than the XLA vjp it previously fell back to
(``_fit_bwd_block``).  Gradient parity vs the XLA reference is pinned
in ``tests/test_ops.py``.

Numerics match the reference transformer (``src/lxrt/modeling.py:295-347``):
scores scaled by ``1/sqrt(head_dim)``, additive float mask (``-10000``
style) added before softmax, f32 softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgqa_tpu.ops.common import interpret_mode, pallas_enabled

__all__ = [
    "fused_attention",
    "fused_attention_dropout",
    "multi_head_attention",
    "attention_probs",
    "bias_vector",
]


# ---------------------------------------------------------------------------
# XLA reference paths.
# ---------------------------------------------------------------------------


def _mha_xla(q, k, v, bias):
    """(B, H, S, D)-layout reference path: plain jnp, fully fusable by XLA."""
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


def multi_head_attention(q, k, v, bias=None, *, force_xla: bool = False):
    """``softmax(q k^T / sqrt(d) + bias) v`` over (B, H, S, D) tensors.

    Kept as the 4-D-layout entry point (visualization/dropout paths build
    explicit per-head tensors).  Always XLA: callers on the hot path use
    :func:`fused_attention` on the natural (B, S, H*D) layout instead.
    """
    del force_xla
    return _mha_xla(q, k, v, bias)


def _attention_natural_xla(q, k, v, bias_kv, num_heads):
    """XLA attention on natural (B, S, E) layout — numerics reference for
    the fused kernel and the source of its backward pass."""
    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // num_heads
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, skv, num_heads, d)
    vh = v.reshape(b, skv, num_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
    scores = scores.astype(jnp.float32) + bias_kv[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh.astype(jnp.float32))
    return out.reshape(b, sq, e).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused Pallas kernel.
# ---------------------------------------------------------------------------

_BATCH_BLOCK = 32  # samples per grid cell; best of {8,16,32} on v5e
# Backward holds ~3x the buffers (5 inputs, 4 outputs, f32 probs): block 32
# exceeds the 16 MB VMEM scoped limit (19.4 MB measured); 16 fits and beats
# 8 (ODIN 3152 vs 3084 q/s model-wide).
_BWD_BATCH_BLOCK = 16

# VMEM budget the block-fit loop targets (hardware scoped limit is
# 16 MiB; 15 leaves margin for the estimate's error, which measured
# within ~0.7 MiB on every OOM observed).  The defaults above are the
# measured optima for RGQA's 20/36-token shapes and are kept verbatim
# (the estimate keeps them under budget); longer streams — ViLT's
# 40 text + 145 patch tokens = 185 — halve the block until the
# per-grid-cell footprint fits, or fall back to XLA when none does.
_VMEM_BUDGET = 15 * 2**20

# Raised scoped-VMEM tier for long streams: Mosaic's 16 MiB cap is a
# compiler default, not hardware (v5e has 128 MiB VMEM) —
# ``CompilerParams(vmem_limit_bytes=...)`` raises it per kernel.  Keep the
# raised limit as LOW as fits: the limit itself steers Mosaic's pipelining,
# and higher caps measured slower at the same block (ViLT 165-tok b=384:
# block 8 @24M 1917 us vs @64M 2107 us).  Measured (v5e, bf16, H=12,
# E=768, S=165): full-seq block 8 @24M beats the query-tiled grid 25-30%
# (b=256: 1416 vs 1836 us; b=384: 1917 vs 2426 us), while the short
# LXMERT shapes got NOTHING from bigger raised-limit blocks (36x36 b384:
# block 64 @32M 830 us vs shipped block 32 809 us) — so the raised tier
# only engages when the default-budget fit fails.
_RAISED_VMEM_LIMIT = 24 * 2**20
_RAISED_VMEM_BUDGET = 23 * 2**20  # fit margin under the raised limit

# Raised tiers for the BACKWARD (its f32 scratch is ~10x the forward's, so
# long streams need far more than 24 MiB): ViLT's 165-token block-8
# backward estimates ~55 MiB and measured 2.3-2.8x over the XLA vjp under
# a 64 MiB limit (b=128: 1937 vs 4461 us; b=256: 2907 vs 8146 —
# experiments/bwd_vmem_exp.py); the 185-token pad-mode stream (~68 MiB)
# takes the 80 MiB tier.  Lowest fitting tier ships, per the forward's
# measured limit-steers-pipelining effect.  The short ODIN/Maha shapes
# (36x36 b=384) gained only 2% from raised-limit block 32 (1530 vs
# 1561 us) — not worth diverging from the default-budget path, so as in
# the forward the raised tiers engage ONLY when the default fit fails.
_RAISED_BWD_VMEM_TIERS = (64 * 2**20, 80 * 2**20)


def _fit_bwd_block(b: int, sq: int, skv: int, e: int,
                   itemsize: int) -> tuple[int, int | None]:
    """Backward block + scoped-VMEM limit: the default-budget fit first
    (limit None = Mosaic's 16 MiB default), then block 8 under each raised
    tier.  Returns ``(0, None)`` when nothing fits — callers fall back to
    the XLA vjp."""
    bt = _fit_block(_BWD_BATCH_BLOCK, b, sq, skv, e, itemsize, bwd=True)
    if bt:
        return bt, None
    for limit in _RAISED_BWD_VMEM_TIERS:
        bt = _fit_block(
            8, b, sq, skv, e, itemsize, bwd=True, budget=limit - 2**20
        )
        if bt:
            return bt, limit
    return 0, None


def _fit_block(default: int, b: int, sq: int, skv: int, e: int,
               itemsize: int, *, bwd: bool = False,
               budget: int = _VMEM_BUDGET) -> int:
    """Largest power-of-two block <= default whose VMEM footprint fits.

    Footprint per grid cell ~= the in/out tensor slices
    (q/o rows at sq, k/v rows at skv; backward adds g/dq/dk/dv) plus the
    f32 score/prob scratch the compiler keeps live ((Bt, Sq, Skv) units,
    calibrated against measured scoped-vmem overflows — see ``est``).

    Returns 0 when no lowerable block fits: Mosaic requires the mask
    block's sublane dim (the batch block) be a multiple of 8 or the full
    batch, so blocks < 8 are not an option — callers fall back to the
    XLA path instead."""

    def est(bt):
        # VMEM tiles are (8, 128): the sequence (sublane) dim rounds up
        # to a multiple of 8 (36 -> 40).
        sq_p, skv_p = -(-sq // 8) * 8, -(-skv // 8) * 8
        io = bt * e * itemsize * (
            (3 * sq_p + 4 * skv_p) if bwd else (2 * sq_p + 2 * skv_p)
        )
        # The f32 (Bt, Sq, Skv) score/prob scratch Mosaic keeps live.
        # The bwd multiplier is calibrated against the measured 19.4 MB
        # block-32 backward overflow (io 13.1 MiB + 32 units = 19.375):
        # ~8 logical buffers times the vectorizer's live copies.
        scratch = bt * sq_p * skv_p * 4 * (32 if bwd else 3)
        # Long grids double-buffer the io slices: Mosaic deepens its
        # pipeline once the grid is long enough for per-cell DMA to
        # overlap, roughly doubling the io footprint.  Measured points
        # (v5e): the ViLT 165x165 fwd block-8 kernel runs at 16 cells
        # but hits an 18.23 MB scoped-vmem OOM (= io*2 + scratch) at
        # both 24 and 32 cells, so the fwd deepening starts in (16, 24]
        # — cliff 17.  The backward shows no deepening through the
        # ODIN block-16 config's 24 cells (measured good), so its cliff
        # sits just past that, at 25.  One conservative call: the 36x36
        # fwd block-32 kernel measured OK at 58 cells / OOM at 60
        # (17.36 MB), which cliff 17 halves to 16 — only the refuted
        # MC-dropout batch-fold ever reached such grids.
        # ceil: the caller pads b up to a multiple of bt, so the real
        # grid has ceil(b/bt) cells — floor would under-count by one
        # cell for batches just below a cliff (e.g. 390 rows at bwd
        # block 16 -> 25 cells, exactly the bwd cliff).
        if -(-b // bt) >= (25 if bwd else 17):
            io *= 2
        return io + scratch

    # Candidates: the full default (or batch), then descending powers of
    # two down to 8 — NOT raw halvings of b, which for a batch that is
    # neither a power of two nor a multiple of 8 (e.g. b=12) would skip
    # the Mosaic-lowerable block 8 entirely (12 -> 6 -> 3 -> 1).  A
    # block < 8 is only lowerable as the full batch, so b itself closes
    # the list for tiny batches.
    first = min(default, b)
    cands = [first]
    p = 1 << max(first.bit_length() - 1, 0)
    while p >= 8:
        if p != first:
            cands.append(p)
        p //= 2
    if b < 8 and b not in cands:
        cands.append(b)
    for bt in cands:
        if est(bt) <= budget and (bt % 8 == 0 or bt == b):
            return bt
    return 0


def _fused_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, num_heads, head_dim):
    """One batch-block: per-head VMEM-resident softmax(qk^T*scale + bias)v.

    Block shapes: q (Bt, Sq, H*D), k/v (Bt, Skv, H*D), mask (Bt, Skv) f32
    additive bias.  The head loop unrolls into 2*H small batched matmuls;
    everything stays in VMEM so the only HBM traffic is the block in/out.
    """
    scale = 1.0 / math.sqrt(head_dim)
    bias = m_ref[:][:, None, :]  # (Bt, 1, Skv)
    d = head_dim
    in_dtype = q_ref.dtype
    for h in range(num_heads):
        # Feed the MXU its native input dtype (bf16 at serving time) with
        # f32 accumulation — the same contract XLA's einsum uses.
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        vh = v_ref[:, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(in_dtype)
        o = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _fit_qblock(b: int, sq: int, skv: int, e: int,
                itemsize: int) -> tuple[int, int]:
    """(batch block, query block) for the query-tiled kernel, used when
    no full-sequence batch block fits VMEM (long streams on long grids —
    ViLT's 165-185-token streams at batch >= 192).

    Tiling the QUERY dim needs no online-softmax state: each (bt, qt) row
    block computes its complete softmax over the full skv, so the kernel
    body is unchanged — only the grid grows a q axis.  K/V block indices
    are constant across the q axis (the fast grid dim), so Mosaic keeps
    them VMEM-resident per batch block.  Footprint model matches
    :func:`_fit_block` (io + f32 score scratch, pipeline-deepening
    doubling on long grids).  Returns (0, 0) when nothing fits.
    """

    def est(bt, qt, cells):
        qt_p = -(-qt // 8) * 8
        skv_p = -(-skv // 8) * 8
        io = bt * e * itemsize * (2 * qt_p + 2 * skv_p)
        scratch = bt * qt_p * skv_p * 4 * 3
        if cells >= 17:
            io *= 2
        return io + scratch

    for nsplit in (2, 3, 4, 6, 8):
        qt = -(-(-(-sq // nsplit)) // 8) * 8  # ceil(sq/nsplit) -> mult of 8
        if qt >= sq:
            continue  # that's the full-seq path, already ruled out
        nq = -(-sq // qt)
        for bt in (32, 16, 8):
            bt = min(bt, b)
            if bt % 8 and bt != b:
                continue
            cells = -(-b // bt) * nq
            if est(bt, qt, cells) <= _VMEM_BUDGET:
                return bt, qt
    return 0, 0


def _fwd_plan(
    b: int, sq: int, skv: int, e: int, itemsize: int,
) -> tuple[str | None, int, int | None]:
    """Single source of truth for the forward dispatch ladder — consumed
    by BOTH :func:`fused_attention`'s guard and :func:`_fused_pallas_raw`
    so they cannot diverge.  Returns ``(kind, batch_block, vmem_limit)``:

    1. ``("block", bt, None)`` — full-sequence grid under the default
       16 MiB scoped-VMEM cap;
    2. ``("block", bt, _RAISED_VMEM_LIMIT)`` — full-sequence grid under
       the raised 24 MiB tier (long streams whose deepened-pipeline
       footprint busts the default cap, ViLT 165-185 tok at batch >= 192;
       measured 25-30% over query tiling — docs/kernels.md).  Block
       default 8, not _BATCH_BLOCK: at every measured raised-tier point
       block 8 beat 16/32 (b=256: 1416 vs 1433/1718 us), the bigger
       blocks' extra VMEM pressure buying nothing;
    3. ``("qblock", 0, None)`` — query-tiled grid;
    4. ``(None, 0, None)`` — nothing fits, XLA fallback.
    """
    bt = _fit_block(_BATCH_BLOCK, b, sq, skv, e, itemsize)
    if bt:
        return "block", bt, None
    bt = _fit_block(8, b, sq, skv, e, itemsize, budget=_RAISED_VMEM_BUDGET)
    if bt:
        return "block", bt, _RAISED_VMEM_LIMIT
    if _fit_qblock(b, sq, skv, e, itemsize)[0]:
        return "qblock", 0, None
    return None, 0, None


def _fused_pallas_raw(q, k, v, bias_kv, num_heads):
    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // num_heads
    kind, bt, vmem_limit = _fwd_plan(b, sq, skv, e, q.dtype.itemsize)
    if kind == "qblock":
        return _fused_qblocked_raw(q, k, v, bias_kv, num_heads)
    if kind is None:
        # Unreachable through fused_attention (its guard IS _fwd_plan);
        # direct raw callers get the numerics-identical XLA path.
        return _attention_natural_xla(q, k, v, bias_kv, num_heads)
    pad = (-b) % bt
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        bias_kv = jnp.pad(bias_kv, ((0, pad), (0, 0)))
    rows = q.shape[0]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, num_heads=num_heads, head_dim=d),
        grid=(rows // bt,),
        in_specs=[
            pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, sq, e), q.dtype),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
            if vmem_limit and not interpret_mode()
            else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * num_heads * sq * skv * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=rows * num_heads * sq * skv,
        ),
        interpret=interpret_mode(),
    )(q, k, v, bias_kv)
    if pad:
        out = out[:b]
    return out


def _fused_qblocked_raw(q, k, v, bias_kv, num_heads):
    """Query-tiled forward: grid (batch blocks, q blocks), same kernel
    body (softmax is complete per row block — no accumulator state)."""
    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // num_heads
    bt, qt = _fit_qblock(b, sq, skv, e, q.dtype.itemsize)
    assert bt > 0, "caller must check _fit_qblock before dispatching"
    padb = (-b) % bt
    padq = (-sq) % qt
    if padb or padq:
        q = jnp.pad(q, ((0, padb), (0, padq), (0, 0)))
        k = jnp.pad(k, ((0, padb), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, padb), (0, 0), (0, 0)))
        bias_kv = jnp.pad(bias_kv, ((0, padb), (0, 0)))
    rows, sqp = q.shape[0], q.shape[1]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, num_heads=num_heads, head_dim=d),
        grid=(rows // bt, sqp // qt),
        in_specs=[
            pl.BlockSpec(
                (bt, qt, e), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, skv, e), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, skv, e), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, skv), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bt, qt, e), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, sqp, e), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * num_heads * sqp * skv * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=rows * num_heads * sqp * skv,
        ),
        interpret=interpret_mode(),
    )(q, k, v, bias_kv)
    if padb or padq:
        out = out[:b, :sq]
    return out


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, m_ref, g_ref,
    dq_ref, dk_ref, dv_ref, db_ref,
    *, num_heads, head_dim,
):
    """Recompute-based attention backward, VMEM-resident per batch-block.

    Per head: re-run the (cheap) forward softmax, then
    ``dP = g V^T``, ``dV = P^T g``, ``dS = P (dP - rowsum(dP*P))``,
    ``dQ = scale * dS K``, ``dK = scale * dS^T Q``; the mask-bias grad is
    ``dS/scale`` summed over heads and query rows.  This replaces XLA's
    attention backward — the dominant cost of the ODIN / Mahalanobis
    grad-at-eval passes — with the same natural-layout, transpose-free
    treatment as the forward kernel.
    """
    scale = 1.0 / math.sqrt(head_dim)
    bias = m_ref[:][:, None, :]  # (Bt, 1, Skv)
    d = head_dim
    db_acc = jnp.zeros(m_ref.shape, jnp.float32)
    for h in range(num_heads):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        vh = v_ref[:, :, h * d:(h + 1) * d]
        gh = g_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Bt, Sq, Skv) f32
        # dP = g @ V^T  — contract head_dim.
        dp = jax.lax.dot_general(
            gh, vh.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dV = P^T @ g — contract Sq.
        dv = jax.lax.dot_general(
            p, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds_nb = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        db_acc = db_acc + jnp.sum(ds_nb, axis=1)
        ds = (ds_nb * scale).astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, h * d:(h + 1) * d] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, h * d:(h + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, h * d:(h + 1) * d] = dv.astype(dv_ref.dtype)
    db_ref[:] = db_acc


def _fused_bwd_pallas_raw(q, k, v, bias_kv, g, num_heads, fit=None):
    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // num_heads
    # ``fit``: a precomputed _fit_bwd_block result — _fused_bwd passes its
    # guard's fit down so the two sites cannot diverge.
    bt, vmem_limit = fit or _fit_bwd_block(b, sq, skv, e, q.dtype.itemsize)
    pad = (-b) % bt
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
        bias_kv = jnp.pad(bias_kv, ((0, pad), (0, 0)))
    rows = q.shape[0]
    q_spec = pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, num_heads=num_heads, head_dim=d
        ),
        grid=(rows // bt,),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec, m_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, sq, e), q.dtype),
            jax.ShapeDtypeStruct((rows, skv, e), k.dtype),
            jax.ShapeDtypeStruct((rows, skv, e), v.dtype),
            jax.ShapeDtypeStruct((rows, skv), jnp.float32),
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
            if vmem_limit and not interpret_mode()
            else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * rows * num_heads * sq * skv * d,
            bytes_accessed=(2 * q.size + 3 * k.size) * q.dtype.itemsize * 2,
            transcendentals=rows * num_heads * sq * skv,
        ),
        interpret=interpret_mode(),
    )(q, k, v, bias_kv, g)
    if pad:
        dq, dk, dv, db = dq[:b], dk[:b], dv[:b], db[:b]
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(q, k, v, bias_kv, num_heads):
    return _fused_pallas_raw(q, k, v, bias_kv, num_heads)


def _fused_fwd(q, k, v, bias_kv, num_heads):
    return _fused_pallas_raw(q, k, v, bias_kv, num_heads), (q, k, v, bias_kv)


def _fused_bwd(num_heads, res, g):
    q, k, v, bias_kv = res
    fit = _fit_bwd_block(
        q.shape[0], q.shape[1], k.shape[1], q.shape[-1], q.dtype.itemsize
    )
    if fit[0] == 0:
        # No lowerable backward block at this shape even under the raised
        # scoped-VMEM tiers: differentiate the numerics-identical XLA
        # path instead.
        _, vjp = jax.vjp(
            lambda q_, k_, v_, m_: _attention_natural_xla(
                q_, k_, v_, m_, num_heads
            ),
            q, k, v, bias_kv,
        )
        return vjp(g.astype(q.dtype))
    dq, dk, dv, db = _fused_bwd_pallas_raw(
        q, k, v, bias_kv, g.astype(q.dtype), num_heads, fit=fit
    )
    return dq, dk, dv, db.astype(bias_kv.dtype)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused attention WITH attention-prob dropout (training / MC-dropout).
#
# The reference applies dropout to the softmax probabilities
# (``src/lxrt/modeling.py:343-345``); without a kernel this forces the
# explicit (B, H, Sq, Skv)-probs path every training step and every
# MC-dropout pass.  Here the mask is drawn in-kernel from the TPU PRNG;
# the backward kernel REPLAYS the same seed (same block size, same
# per-head generation order) to reconstruct the identical mask.
# ---------------------------------------------------------------------------

# The dropout mask is regenerated in the backward by seed replay, so both
# kernels must draw identical bits — but they need NOT share a block size:
# bits are keyed per (16-row *sub-block*, head), the backward's block
# granularity.  The forward then runs at the deterministic kernel's block
# 32 (measured: the block-16 penalty on the 34 attention matmuls cost the
# 5-pass MC-dropout scorer ~7 ms/pass) while the backward — whose ~8
# f32 scratch buffers OOM the 16 MB VMEM scope at block 32 — replays at
# its own block 16, reconstructing the same mask sub-block by sub-block.
_DROP_BATCH_BLOCK = 16


# One uint32 PRNG word feeds FOUR heads (one byte each).  The hardware
# RNG's bit throughput is the measured bottleneck of dropout-on forwards
# (~500 MB of mask words per full-model pass at batch 384 when drawing a
# word per (head, prob)); bytes cut that 4x.  The drop rate quantizes to
# 1/256 — the keep-scale uses the quantized probability so E[out] = x
# holds exactly, the same contract as ops/dropout.py's cheap_dropout.
_HEADS_PER_DRAW = 4


def _keep_threshold(rate):
    """(threshold, keep_p) with P(byte >= threshold) = keep_p exactly."""
    t = int(round(min(max(float(rate), 0.0), 1.0) * 256.0))
    return t, (256 - t) / 256.0


def _group_bits(seed0, global_sub, group, ngroups, shape):
    """uint32 mask words for one (sub-block, head-group): an independent
    PRNG stream keyed on (seed, sub-block index, group) so any kernel
    covering the sub-block — forward at block 32, backward at block 16 —
    regenerates identical bits."""
    pltpu.prng_seed(seed0 + global_sub * ngroups + group)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _byte_keep(bits, j, threshold):
    """Head ``j``'s keep-mask: byte ``j`` of each word vs the threshold."""
    byte = (bits >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
    return byte >= jnp.uint32(threshold)


def _fused_drop_kernel(
    q_ref, k_ref, v_ref, m_ref, seed_ref, o_ref,
    *, num_heads, head_dim, rate, sub,
):
    scale = 1.0 / math.sqrt(head_dim)
    bias = m_ref[:][:, None, :]
    d = head_dim
    in_dtype = q_ref.dtype
    bt, sq, _ = q_ref.shape
    skv = k_ref.shape[1]
    nsub = bt // sub
    t, keep_p = _keep_threshold(rate)
    keep_scale = 1.0 / keep_p
    ngroups = -(-num_heads // _HEADS_PER_DRAW)
    bits = [
        jnp.concatenate(
            [
                _group_bits(
                    seed_ref[0], pl.program_id(0) * nsub + i, g, ngroups,
                    (sub, sq, skv),
                )
                for i in range(nsub)
            ],
            axis=0,
        )
        for g in range(ngroups)
    ]
    for h in range(num_heads):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        vh = v_ref[:, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        keep = _byte_keep(
            bits[h // _HEADS_PER_DRAW], h % _HEADS_PER_DRAW, t
        )
        p = jnp.where(keep, p * keep_scale, 0.0).astype(in_dtype)
        o = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _fused_drop_bwd_kernel(
    q_ref, k_ref, v_ref, m_ref, seed_ref, g_ref,
    dq_ref, dk_ref, dv_ref, db_ref,
    *, num_heads, head_dim, rate, sub,
):
    """Backward with seed-replay: regenerates the forward's dropout mask
    per (sub-block, head) — its block size IS the sub-block, so
    ``program_id`` indexes sub-blocks directly."""
    scale = 1.0 / math.sqrt(head_dim)
    bias = m_ref[:][:, None, :]
    d = head_dim
    assert q_ref.shape[0] == sub
    sq = q_ref.shape[1]
    skv = k_ref.shape[1]
    t, keep_p = _keep_threshold(rate)
    keep_scale = 1.0 / keep_p
    ngroups = -(-num_heads // _HEADS_PER_DRAW)
    bits = [
        _group_bits(seed_ref[0], pl.program_id(0), g, ngroups, (sub, sq, skv))
        for g in range(ngroups)
    ]
    db_acc = jnp.zeros(m_ref.shape, jnp.float32)
    for h in range(num_heads):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        vh = v_ref[:, :, h * d:(h + 1) * d]
        gh = g_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        keep = _byte_keep(
            bits[h // _HEADS_PER_DRAW], h % _HEADS_PER_DRAW, t
        )
        p_drop = jnp.where(keep, p * keep_scale, 0.0)
        dp_drop = jax.lax.dot_general(
            gh, vh.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            p_drop, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.where(keep, dp_drop * keep_scale, 0.0)
        ds_nb = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        db_acc = db_acc + jnp.sum(ds_nb, axis=1)
        ds = (ds_nb * scale).astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, h * d:(h + 1) * d] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, h * d:(h + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, h * d:(h + 1) * d] = dv.astype(dv_ref.dtype)
    db_ref[:] = db_acc


def _drop_sub_block(b, sq, skv, e, itemsize):
    """Seed-replay granularity: the backward's block size (its ~8 f32
    scratch buffers set the VMEM bound)."""
    return _fit_block(_DROP_BATCH_BLOCK, b, sq, skv, e, itemsize, bwd=True)


def _drop_call(make_kernel, outs, q, k, v, bias_kv, seed, g=None):
    b, sq, e = q.shape
    skv = k.shape[1]
    # Mask bits are keyed per (sub-block, head): the backward runs at
    # block == sub, the forward at the largest sub-multiple its own
    # (smaller) footprint allows — block 32 at RGQA shapes.
    sub = _drop_sub_block(b, sq, skv, e, q.dtype.itemsize)
    if g is None:
        fwd_fit = _fit_block(_BATCH_BLOCK, b, sq, skv, e, q.dtype.itemsize)
        bt = max((fwd_fit // sub) * sub, sub)
    else:
        bt = sub
    kernel = make_kernel(sub)
    pad = (-b) % bt
    arrays = [q, k, v]
    if g is not None:
        arrays.append(g)
    if pad:
        arrays = [jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in arrays]
        bias_kv = jnp.pad(bias_kv, ((0, pad), (0, 0)))
    rows = arrays[0].shape[0]
    q_spec = pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [q_spec, kv_spec, kv_spec, m_spec, seed_spec]
    if g is not None:
        in_specs.append(q_spec)
        args = (*arrays[:3], bias_kv, seed, arrays[3])
    else:
        args = (*arrays, bias_kv, seed)
    out_specs, out_shapes = outs(bt, rows, sq, skv, e, q.dtype, k.dtype)
    result = pl.pallas_call(
        kernel,
        grid=(rows // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret_mode(),
    )(*args)
    return result, pad, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_drop(q, k, v, bias_kv, seed, num_heads, rate):
    d = q.shape[-1] // num_heads

    def outs(bt, rows, sq, skv, e, qdt, kdt):
        return (
            pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((rows, sq, e), qdt),
        )

    out, pad, b = _drop_call(
        lambda sub: functools.partial(
            _fused_drop_kernel,
            num_heads=num_heads, head_dim=d, rate=rate, sub=sub,
        ),
        outs, q, k, v, bias_kv, seed,
    )
    return out[:b] if pad else out


def _fused_drop_fwd(q, k, v, bias_kv, seed, num_heads, rate):
    return _fused_drop(q, k, v, bias_kv, seed, num_heads, rate), (
        q, k, v, bias_kv, seed,
    )


def _fused_drop_bwd(num_heads, rate, res, g):
    q, k, v, bias_kv, seed = res
    d = q.shape[-1] // num_heads

    def outs(bt, rows, sq, skv, e, qdt, kdt):
        q_spec = pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return (
            (q_spec, kv_spec, kv_spec, m_spec),
            (
                jax.ShapeDtypeStruct((rows, sq, e), qdt),
                jax.ShapeDtypeStruct((rows, skv, e), kdt),
                jax.ShapeDtypeStruct((rows, skv, e), kdt),
                jax.ShapeDtypeStruct((rows, skv), jnp.float32),
            ),
        )

    (dq, dk, dv, db), pad, b = _drop_call(
        lambda sub: functools.partial(
            _fused_drop_bwd_kernel,
            num_heads=num_heads, head_dim=d, rate=rate, sub=sub,
        ),
        outs, q, k, v, bias_kv, seed, g=g.astype(q.dtype),
    )
    if pad:
        dq, dk, dv, db = dq[:b], dk[:b], dv[:b], db[:b]
    return dq, dk, dv, db.astype(bias_kv.dtype), None


_fused_drop.defvjp(_fused_drop_fwd, _fused_drop_bwd)


def fused_attention_dropout(
    q, k, v, bias=None, *, num_heads: int, rate: float, rng,
):
    """Fused attention with in-kernel attention-prob dropout.

    ``rng`` is a JAX PRNG key; each call derives one int32 seed (the
    kernel adds the grid index).  TPU-only — callers fall back to the
    explicit-probs path elsewhere.  The dropout stream differs from
    flax's ``nn.Dropout`` (TPU hardware PRNG vs threefry) but has the
    same quantized (rate, 1/keep_p) Bernoulli semantics.

    Shapes where no lowerable kernel block fits VMEM (long streams on
    long grids) fall back to an XLA explicit-probs path with the same
    quantized-rate contract (threefry stream instead of the TPU PRNG).
    """
    b, sq, e = q.shape
    skv = k.shape[1]
    bias_kv = bias_vector(bias, b, skv)
    # Both kernels must be lowerable: sub (the backward's block / the
    # seed-replay granularity) AND a forward block — the forward's
    # deepening cliff (17) is shorter than the backward's (25), so at
    # some shapes the backward fits while no forward block does.
    if (
        _drop_sub_block(b, sq, skv, e, q.dtype.itemsize) == 0
        or _fit_block(_BATCH_BLOCK, b, sq, skv, e, q.dtype.itemsize) == 0
    ):
        return _attention_dropout_xla(
            q, k, v, bias_kv, num_heads, float(rate), rng
        )
    seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    return _fused_drop(q, k, v, bias_kv, seed, num_heads, float(rate))


def _attention_dropout_xla(q, k, v, bias_kv, num_heads, rate, rng):
    """XLA attention-prob dropout with the kernel's quantized-rate
    contract (drop rate t/256, keep scale 256/(256-t)) for shapes the
    Pallas kernels can't lower."""
    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // num_heads
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, skv, num_heads, d)
    vh = v.reshape(b, skv, num_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
    scores = scores.astype(jnp.float32) + bias_kv[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    t, keep_p = _keep_threshold(rate)
    byte = jax.random.randint(rng, probs.shape, 0, 256, jnp.int32)
    probs = jnp.where(byte >= t, probs / keep_p, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh.astype(jnp.float32))
    return out.reshape(b, sq, e).astype(q.dtype)


def fused_attention(q, k, v, bias=None, *, num_heads: int, force_xla: bool = False):
    """Attention on the natural (B, S, H*D) layout.

    ``bias`` is an additive float mask, ``(B, S_kv)`` or broadcastable
    ``(B, 1, 1, S_kv)`` (the reference's ``-10000 * (1 - mask)``
    convention, ``src/lxrt/modeling.py:857-873``); ``None`` means fully
    visible.  Dispatches to the fused Pallas kernel on TPU unless
    ``force_xla``; differentiable either way.
    """
    b, _, _ = q.shape
    skv = k.shape[1]
    bias_kv = bias_vector(bias, b, skv)
    if force_xla or not pallas_enabled():
        return _attention_natural_xla(q, k, v, bias_kv, num_heads)
    sq = q.shape[1]
    e = q.shape[-1]
    if not _kernel_fits(b, sq, skv, e, q.dtype.itemsize):
        return _attention_natural_xla(q, k, v, bias_kv, num_heads)
    return _fused(q, k, v, bias_kv, num_heads)


def _kernel_fits(b: int, sq: int, skv: int, e: int, itemsize: int) -> bool:
    """True when some forward grid fits — by construction the same
    ladder ``_fused_pallas_raw`` dispatches through (both read
    :func:`_fwd_plan`); tier coverage pinned in ``tests/test_ops.py``."""
    return _fwd_plan(b, sq, skv, e, itemsize)[0] is not None


def bias_vector(bias, b, skv):
    """Normalize an additive mask to the kernels' (B, Skv) f32 form."""
    if bias is None:
        return jnp.zeros((b, skv), jnp.float32)
    if bias.ndim == 4:
        return jnp.broadcast_to(bias[:, 0, 0, :], (b, skv)).astype(jnp.float32)
    return jnp.broadcast_to(bias, (b, skv)).astype(jnp.float32)
