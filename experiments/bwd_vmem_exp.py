"""Raised scoped-VMEM limit for the fused attention BACKWARD.

The forward's raised 24 MiB tier (ops/attention.py) reopened two refuted
backward configs:

1. ODIN/Maha grad-at-eval (36x36 self-att, batch 384): block 32 measured
   a 19.4 MB scoped-vmem OOM under the default 16 MiB cap and shipped at
   block 16 — but 19.4 MiB fits a 24 MiB limit.  If block 32 wins, the
   ODIN/Mahalanobis scorers speed up model-wide.
2. ViLT training (165-token streams): no backward block ever fit
   (block-8 estimate ~41 MiB: io 13.8 + 32-buffer f32 scratch 27.6), so
   grads flow through the XLA vjp.  41 MiB still fits v5e's 128 MiB VMEM
   with a 48/64 MiB limit.

Times jax.grad of sum(fused-attention) per config (chained scan in one
jit, single fetch), bf16 inputs, vs the shipped dispatch and the XLA vjp.

RESULT (v5e, 2026-08): SHIPPED as the backward's raised 64/80 MiB tiers
(``_fit_bwd_block`` in ops/attention.py — engages only when the default
fit fails, like the forward's 24 MiB tier).

1. ODIN/Maha 36x36 b=384: block 32 @24M = 1530.3 us vs shipped block 16
   1560.8 (2%); 20x36: 1367.4 vs 1435.7 (5%).  NOT shipped — diverging
   from the default-budget path for 2-5% isn't worth the extra tier
   risk, and the forward's lesson (bigger blocks never won) held.
2. ViLT 165-token backward: block 8 @64M = 1937.2 us at b=128 vs XLA
   vjp 4461.1 (**2.3x**); 2907.2 vs 8146.3 at b=256 (**2.8x**); 48M
   marginally slower (1972.6 / 2914.3).  The 185-token pad-mode stream
   (est ~67.5 MiB) takes the 80M tier: 3501.1 us vs 8889.1 XLA
   (**2.5x**; 72M 3537.4).  SHIPPED — this puts the ViLT *training*
   backward on the fused kernel at every batch/stream length the
   models use.  Model-level: ViLT train step (batch 64 x2 RP)
   147.6 -> 112.2 ms/step (**1.32x**); on-TPU bf16 grad parity vs the
   XLA vjp max_rel ~1.1e-2 (bf16 io precision).
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
ITERS = 30


def bwd_raw(q, k, v, bias, g, bt, vmem_mb):
    from rgqa_tpu.ops.attention import _fused_bwd_kernel

    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // H
    pad = (-b) % bt
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, pad), (0, 0)))
    rows = q.shape[0]
    q_spec = pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, num_heads=H, head_dim=d),
        grid=(rows // bt,),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec, m_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, sq, e), q.dtype),
            jax.ShapeDtypeStruct((rows, skv, e), k.dtype),
            jax.ShapeDtypeStruct((rows, skv, e), v.dtype),
            jax.ShapeDtypeStruct((rows, skv), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * rows * H * sq * skv * d,
            bytes_accessed=(2 * q.size + 3 * k.size) * q.dtype.itemsize * 2,
            transcendentals=rows * H * sq * skv,
        ),
    )(q, k, v, bias, g)
    return dq[:b], dk[:b], dv[:b], db[:b]


def timed(fn, b, s, skv=None):
    skv = skv or s
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, E), jnp.bfloat16)
    k = jax.random.normal(kk, (b, skv, E), jnp.bfloat16)
    v = jax.random.normal(kv, (b, skv, E), jnp.bfloat16)
    g = jax.random.normal(kg, (b, s, E), jnp.bfloat16)
    bias = jnp.zeros((b, skv), jnp.float32)

    @jax.jit
    def loop(q, k, v, bias, g):
        def body(c, _):
            dq, dk, dv, db = fn(q + c.astype(jnp.bfloat16), k, v, bias, g)
            r = (
                jnp.mean(dq.astype(jnp.float32))
                + jnp.mean(dk.astype(jnp.float32))
                + jnp.mean(dv.astype(jnp.float32))
                + jnp.mean(db)
            )
            return r * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    np.asarray(loop(q, k, v, bias, g))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(q, k, v, bias, g))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


def xla_vjp(q, k, v, bias, g):
    from rgqa_tpu.ops.attention import _attention_natural_xla

    _, vjp = jax.vjp(
        lambda q_, k_, v_, m_: _attention_natural_xla(q_, k_, v_, m_, H),
        q, k, v, bias,
    )
    return vjp(g)


def shipped(q, k, v, bias, g):
    from rgqa_tpu.ops.attention import _fused_bwd_pallas_raw

    return _fused_bwd_pallas_raw(q, k, v, bias, g, H)


def main():
    print(f"devices: {jax.devices()}")

    # --- ODIN/Maha shape: 36x36 self-attention, batch 384 ---
    b, s = 384, 36
    us = timed(shipped, b, s)
    print(f"odin36 b={b} shipped(block16)        {us:8.1f} us", flush=True)
    for bt, mb in ((32, 24), (32, 32)):
        try:
            us = timed(
                lambda q, k, v, m, g, bt=bt, mb=mb: bwd_raw(q, k, v, m, g, bt, mb),
                b, s,
            )
            print(f"odin36 b={b} block{bt} vmem={mb}M      {us:8.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"odin36 b={b} block{bt} vmem={mb}M FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
    # 20x36 cross-attention backward (the other ODIN hot shape).
    us = timed(shipped, b, 20, 36)
    print(f"odin20x36 b={b} shipped(block16)     {us:8.1f} us", flush=True)
    for bt, mb in ((32, 24),):
        try:
            us = timed(
                lambda q, k, v, m, g, bt=bt, mb=mb: bwd_raw(q, k, v, m, g, bt, mb),
                b, 20, 36,
            )
            print(f"odin20x36 b={b} block{bt} vmem={mb}M   {us:8.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"odin20x36 b={b} block{bt} vmem={mb}M FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

    # --- ViLT training shape: 165-token stream ---
    s = 165
    for b in (128, 256):
        us = timed(xla_vjp, b, s)
        print(f"vilt b={b} xla-vjp(shipped)       {us:8.1f} us", flush=True)
        for bt, mb in ((8, 48), (8, 64)):
            try:
                us = timed(
                    lambda q, k, v, m, g, bt=bt, mb=mb: bwd_raw(
                        q, k, v, m, g, bt, mb
                    ),
                    b, s,
                )
                print(f"vilt b={b} block{bt} vmem={mb}M        {us:8.1f} us",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"vilt b={b} block{bt} vmem={mb}M FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)



def main_185():
    """Follow-up: ViLT pad-mode stream (185 tokens, pads to 192 sublanes).
    est(block 8) ~67.5 MiB > the 63M budget that covers 165 tokens — does
    a higher tier still beat the XLA vjp?"""
    print(f"devices: {jax.devices()}")
    s = 185
    for b in (256,):
        us = timed(xla_vjp, b, s)
        print(f"vilt185 b={b} xla-vjp(shipped)    {us:8.1f} us", flush=True)
        for bt, mb in ((8, 72), (8, 80)):
            try:
                us = timed(
                    lambda q, k, v, m, g, bt=bt, mb=mb: bwd_raw(
                        q, k, v, m, g, bt, mb
                    ),
                    b, s,
                )
                print(f"vilt185 b={b} block{bt} vmem={mb}M     {us:8.1f} us",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"vilt185 b={b} block{bt} vmem={mb}M FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
