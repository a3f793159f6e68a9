"""Attribute UNITER's MFU gap (50.1% vs CLIP's 78.7% on the same stack).

The backbone roofline table (docs/kernels.md, experiments/mfu_calc.py)
shows UNITER at 98.7 TFLOP/s where CLIP's towers — same kernel library,
comparable sequence lengths (56 vs 50/77) — reach 155.  This experiment
decomposes UNITER's 37.9 ms batch (B=384, bf16) into:

1. the 12 fused 56x56 attention ops (shipped block-32 selection, plus a
   block sweep under raised scoped-VMEM tiers — untried at this shape;
   the 36x36 sweep gained nothing but 56x56 has 2.4x the scores),
2. the XLA attention alternative (is the kernel still winning here?),
3. the LayerNorm chain (28 LN ops at (384, 56, 768)),
4. model-level fused vs force_xla forward.

RESULT (v5e over the axon tunnel, 2026-08-19): recorded in
docs/kernels.md "Backbone roofline (MFU)" — see the printed table.
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
B = 384
S = 56
ITERS = 50


def timed(fn, args, perturb_idx=(0,), iters=ITERS):
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

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e6


def fullseq(q, k, v, bias, bt, vmem_mb=None):
    from rgqa_tpu.ops.attention import _fused_kernel

    b, sq, e = q.shape
    skv = k.shape[1]
    rows = b
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
        if vmem_mb
        else None
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, num_heads=H, head_dim=D),
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
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * H * sq * skv * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=rows * H * sq * skv,
        ),
    )(q, k, v, bias)


def main():
    from rgqa_tpu.ops.attention import (
        _attention_natural_xla,
        _fused_pallas_raw,
    )

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, E), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, E), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, E), jnp.bfloat16)
    m = jnp.zeros((B, S), jnp.float32)

    us = timed(lambda q, k, v, m: _fused_pallas_raw(q, k, v, m, H), (q, k, v, m))
    print(f"att56 shipped(block32)     {us:8.1f} us  (x12 = {us * 12 / 1000:.2f} ms)")
    us = timed(lambda q, k, v, m: _attention_natural_xla(q, k, v, m, H), (q, k, v, m))
    print(f"att56 xla                  {us:8.1f} us")
    for bt, mb in ((16, None), (48, 24), (64, 32), (96, 48), (128, 64)):
        try:
            us = timed(
                lambda q, k, v, m, bt=bt, mb=mb: fullseq(q, k, v, m, bt, mb),
                (q, k, v, m),
            )
            print(f"att56 block {bt:3d} vmem={mb or 16:3}M {us:8.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"att56 block {bt:3d} vmem={mb or 16:3}M FAIL "
                  f"{str(e).splitlines()[0][:80]}", flush=True)

    # LayerNorm chain: 28 sequential LNs at the layer activation shape.
    def ln_chain(x, scale, bias):
        for _ in range(28):
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
            x = ((x32 - mu) * jax.lax.rsqrt(var + 1e-12) * scale + bias).astype(
                x.dtype
            )
        return x

    x = jax.random.normal(kq, (B, S, E), jnp.bfloat16)
    us = timed(
        ln_chain, (x, jnp.ones((E,), jnp.float32), jnp.zeros((E,), jnp.float32))
    )
    print(f"28-LN chain                {us:8.1f} us ({us / 28:.1f} us/LN)")

    # Model level: UNITER forward, fused vs XLA attention.
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch

    cfg = ModelConfig(backbone="uniter")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=B, seed=0)
    batch = {kk_: jnp.asarray(vv) for kk_, vv in host.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2], batch["input_mask"][:2],
        batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
    )["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )

    for label, fused in (("fused", None), ("xla", False)):
        @jax.jit
        def run(params, batch, fused=fused):
            def body(c, _):
                b = dict(batch)
                b["input_ids"] = batch["input_ids"] + (c[:, None] % 2).astype(
                    jnp.int32
                )
                out = forward(params, b, deterministic=True, use_fused=fused)
                probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
                return jnp.argmax(probs, -1).astype(jnp.int32), None

            c, _ = jax.lax.scan(
                body, jnp.zeros((B,), jnp.int32), None, length=ITERS
            )
            return c

        np.asarray(run(params, batch))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, batch))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"uniter fwd {label:5s}  {best * 1e3:8.2f} ms/batch "
              f"({B / best:,.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
