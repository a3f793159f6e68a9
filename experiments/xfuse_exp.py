"""Fusing the x-layer's paired attention ops into single kernel calls.

Each LXMERT cross-modal layer (models/lxmert.py CrossModalLayer) issues
FOUR fused-attention kernel calls per layer: bidirectional cross
attention (20x36 and 36x20 — Q/K/V from the SAME shared projection,
reference ``modeling.py:455-459``) and per-modality self-attention
(20x20 and 36x36).  At batch 384 those four ops cost ~1,007 us/layer
(237+297+212+261, docs/kernels.md) and each call pays its own pipeline
prologue on tiny grids (12 cells at block 32).

Two fusion shapes, measured here before touching the model:

- ``dual``: ONE pallas_call computing both directions of a pair (8 input
  refs, 2 output refs; same per-head math, one grid/pipeline).  No XLA
  concat traffic at all.
- ``cat``: concatenate the two token streams into one 56-token stream
  and run ONE 56x56 kernel with a STATIC structural mask (cross: only
  opposite-modality keys visible — XOR block mask; self: block-diagonal).
  The masked entries hit exp-underflow (exactly 0 in f32), so numerics
  match the separate softmaxes bit-for-bit up to matmul tiling.  For the
  cross pair the model-level form needs NO concat of q/k/v (the shared
  projection runs once on the concatenated hidden states); for the self
  pair the projections differ per modality, so the projected q/k/v must
  be concatenated — ``cat_e2e`` includes that copy cost, ``cat_pure``
  excludes it.

RESULT (v5e over the axon tunnel, 2026-08-19, bf16, B=384, H=12,
E=768, chained-scan us per op-PAIR, best of 3): **REFUTED — the
shipped two-call form wins every variant.**

  cross 20x36+36x20: pair(shipped) 849.9 | dual 930.1 | cat_e2e 1120.7
                     | cat_pure 1179.6
  self  20x20+36x36: pair(shipped) 848.1 | dual 924.2 | cat_e2e 864.9
                     | cat_pure 2640.8

Why: Mosaic double-buffers every block ref, so the dual kernel's 10
refs and the cat kernel's (bt, 56, E) blocks carry ~2x the VMEM of two
lean 4-ref kernels — the standalone cat call at block 32 in fact OOMs
the 16 MiB scoped limit at 21.0 MiB (the in-scan instance compiled at a
smaller block).  Two small grids pipeline better than one fat one; the
per-call "prologue" this experiment hoped to save was already
negligible.  Consistent with the cross-sample-folded-attention and
batch-chunked-sub-call refutations (docs/kernels.md).  Not shipped.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, E = 12, 768
D = E // H
ITERS = 50
B = 384
BT = 32


def _one_head_block(q, k, v, bias, struct=None):
    """softmax(q k^T * scale + bias [+ struct]) v with f32 accumulation."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * (1.0 / (D ** 0.5)) + bias
    if struct is not None:
        s = s + struct
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _dual_kernel(qa, ka, va, ma, qb, kb, vb, mb, oa, ob):
    """Two independent attention ops in ONE grid (one pipeline prologue)."""
    ba = ma[:][:, None, :]
    bb = mb[:][:, None, :]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        oa[:, :, sl] = _one_head_block(
            qa[:, :, sl], ka[:, :, sl], va[:, :, sl], ba
        ).astype(oa.dtype)
        ob[:, :, sl] = _one_head_block(
            qb[:, :, sl], kb[:, :, sl], vb[:, :, sl], bb
        ).astype(ob.dtype)


def dual_pair(qa, ka, va, ma, qb, kb, vb, mb):
    b = qa.shape[0]
    sa, sb = qa.shape[1], qb.shape[1]
    ska, skb = ka.shape[1], kb.shape[1]

    def spec3(s):
        return pl.BlockSpec((BT, s, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def spec2(s):
        return pl.BlockSpec((BT, s), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _dual_kernel,
        grid=(b // BT,),
        in_specs=[
            spec3(sa), spec3(ska), spec3(ska), spec2(ska),
            spec3(sb), spec3(skb), spec3(skb), spec2(skb),
        ],
        out_specs=(spec3(sa), spec3(sb)),
        out_shape=(
            jax.ShapeDtypeStruct((b, sa, E), qa.dtype),
            jax.ShapeDtypeStruct((b, sb, E), qb.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * H * (sa * ska + sb * skb) * D * 2,
            bytes_accessed=2 * 2 * b * E * (sa + sb + ska + skb),
            transcendentals=b * H * (sa * ska + sb * skb),
        ),
    )(qa, ka, va, ma, qb, kb, vb, mb)


def _cat_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, split, mode):
    """56x56 kernel with a static structural mask: ``mode='xor'`` allows
    only opposite-block keys (bidirectional cross), ``'diag'`` only
    same-block keys (two self-atts)."""
    sq = q_ref.shape[1]
    skv = k_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0) < split
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1) < split
    allowed = (row != col) if mode == "xor" else (row == col)
    struct = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None]
    bias = m_ref[:][:, None, :]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        o_ref[:, :, sl] = _one_head_block(
            q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl], bias, struct
        ).astype(o_ref.dtype)


def cat_call(q, k, v, m, split, mode):
    b, s, _ = q.shape

    def spec3(s):
        return pl.BlockSpec((BT, s, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_cat_kernel, split=split, mode=mode),
        grid=(b // BT,),
        in_specs=[
            spec3(s), spec3(s), spec3(s),
            pl.BlockSpec((BT, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec3(s),
        out_shape=jax.ShapeDtypeStruct((b, s, E), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * H * s * s * D * 2,
            bytes_accessed=2 * 2 * b * E * 2 * s,
            transcendentals=b * H * s * s,
        ),
    )(q, k, v, m)


def timed(fn, args, perturb_idx=(0,)):
    """Chained-scan timing: ``fn(*args)`` -> scalar-reducible outputs."""

    @jax.jit
    def loop(*args):
        def body(c, _):
            a = list(args)
            for i in perturb_idx:
                a[i] = a[i] + c.astype(a[i].dtype)
            outs = fn(*a)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            red = sum(jnp.mean(o.astype(jnp.float32)) for o in outs)
            return red * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


def make_inputs(sl, sv, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    mk = lambda k, s: jax.random.normal(k, (B, s, E), jnp.bfloat16)
    return dict(
        ql=mk(ks[0], sl), kl=mk(ks[1], sl), vl=mk(ks[2], sl),
        ml=jnp.zeros((B, sl), jnp.float32),
        qv=mk(ks[3], sv), kv=mk(ks[4], sv), vv=mk(ks[5], sv),
        mv=jnp.zeros((B, sv), jnp.float32),
    )


def main():
    from rgqa_tpu.ops.attention import _fused_pallas_raw

    print(f"devices: {jax.devices()}")
    sl, sv = 20, 36
    X = make_inputs(sl, sv)

    # --- cross pair: lang->vis (Q=lang, KV=vis) + vis->lang ---
    def pair_cross(ql, kv, vv, mv, qv, kl, vl, ml):
        return (
            _fused_pallas_raw(ql, kv, vv, mv, H),
            _fused_pallas_raw(qv, kl, vl, ml, H),
        )

    def dual_cross(ql, kv, vv, mv, qv, kl, vl, ml):
        return dual_pair(ql, kv, vv, mv, qv, kl, vl, ml)

    def cat_cross_e2e(ql, kv, vv, mv, qv, kl, vl, ml):
        q = jnp.concatenate([ql, qv], axis=1)
        k = jnp.concatenate([kl, kv], axis=1)
        v = jnp.concatenate([vl, vv], axis=1)
        m = jnp.concatenate([ml, mv], axis=1)
        o = cat_call(q, k, v, m, sl, "xor")
        return o[:, :sl], o[:, sl:]

    cross_args = (X["ql"], X["kv"], X["vv"], X["mv"],
                  X["qv"], X["kl"], X["vl"], X["ml"])
    print(f"cross pair(shipped) {timed(pair_cross, cross_args, (0, 4)):8.1f} us")
    print(f"cross dual          {timed(dual_cross, cross_args, (0, 4)):8.1f} us")
    print(f"cross cat_e2e       {timed(cat_cross_e2e, cross_args, (0, 4)):8.1f} us")

    # cat_pure: inputs already concatenated (the model-level cross form —
    # shared projection runs once on concat(lang, vis), no extra copies).
    qc = jnp.concatenate([X["ql"], X["qv"]], axis=1)
    kc = jnp.concatenate([X["kl"], X["kv"]], axis=1)
    vc = jnp.concatenate([X["vl"], X["vv"]], axis=1)
    mc = jnp.concatenate([X["ml"], X["mv"]], axis=1)
    print(f"cross cat_pure      "
          f"{timed(lambda q, k, v, m: cat_call(q, k, v, m, sl, 'xor'), (qc, kc, vc, mc)):8.1f} us")

    # --- self pair: 20x20 + 36x36 ---
    def pair_self(ql, kl, vl, ml, qv, kv, vv, mv):
        return (
            _fused_pallas_raw(ql, kl, vl, ml, H),
            _fused_pallas_raw(qv, kv, vv, mv, H),
        )

    def dual_self(ql, kl, vl, ml, qv, kv, vv, mv):
        return dual_pair(ql, kl, vl, ml, qv, kv, vv, mv)

    def cat_self_e2e(ql, kl, vl, ml, qv, kv, vv, mv):
        q = jnp.concatenate([ql, qv], axis=1)
        k = jnp.concatenate([kl, kv], axis=1)
        v = jnp.concatenate([vl, vv], axis=1)
        m = jnp.concatenate([ml, mv], axis=1)
        o = cat_call(q, k, v, m, sl, "diag")
        return o[:, :sl], o[:, sl:]

    self_args = (X["ql"], X["kl"], X["vl"], X["ml"],
                 X["qv"], X["kv"], X["vv"], X["mv"])
    print(f"self  pair(shipped) {timed(pair_self, self_args, (0, 4)):8.1f} us")
    print(f"self  dual          {timed(dual_self, self_args, (0, 4)):8.1f} us")
    print(f"self  cat_e2e       {timed(cat_self_e2e, self_args, (0, 4)):8.1f} us")
    print(f"self  cat_pure      "
          f"{timed(lambda q, k, v, m: cat_call(q, k, v, m, sl, 'diag'), (qc, kc, vc, mc)):8.1f} us")

    # numerics check: dual vs pair, cat vs pair (on-device, bf16 io)
    pa, pb = pair_cross(*cross_args)
    da, db = dual_cross(*cross_args)
    ca, cb = cat_cross_e2e(*cross_args)
    print("cross dual max|d| ",
          float(jnp.max(jnp.abs(pa.astype(jnp.float32) - da.astype(jnp.float32)))),
          float(jnp.max(jnp.abs(pb.astype(jnp.float32) - db.astype(jnp.float32)))))
    print("cross cat  max|d| ",
          float(jnp.max(jnp.abs(pa.astype(jnp.float32) - ca.astype(jnp.float32)))),
          float(jnp.max(jnp.abs(pb.astype(jnp.float32) - cb.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
