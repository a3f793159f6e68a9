"""Raised scoped-VMEM limit for the fused attention kernel.

The block-fit model (ops/attention.py) targets Mosaic's DEFAULT 16 MiB
scoped-vmem cap; pipeline deepening on long grids doubles the io
footprint and pushes ViLT's full-sequence block 8 to 18.23 MiB at
batch >= 192, which round 4 worked around with a query-tiled grid
(3,408 q/s at batch 256 vs 3,586 at batch 128).  But the cap is a
compiler parameter, not hardware: v5e has 128 MiB VMEM and
``pltpu.CompilerParams(vmem_limit_bytes=...)`` raises it per kernel.

Sweeps the full-sequence kernel at ViLT shapes (S=165, H=12, E=768,
bf16) over batch block x vmem-limit, against the shipped q-tiled path,
plus the LXMERT 36x36 self-attention shape at blocks beyond the
16 MiB-constrained 32 — if a bigger block wins there, the headline
bench moves too.

RESULT (v5e, 2026-08): SHIPPED as the forward's raised 24 MiB tier
(ops/attention.py).  ViLT 165-tok full-seq block 8 @24M beats q-tiled
25-30% (b=256: 1415.8 vs 1836.0 us; b=384: 1917.3 vs 2425.8), and the
LIMIT value itself matters (block 8 @64M at b=384: 2106.9 — higher caps
steer Mosaic to worse pipelining, so ship the lowest fitting limit).
Bigger blocks never won: 16@48M / 16@100M / 32@100M all slower at both
batches.  The short LXMERT shapes got nothing (36x36 b384: block 64
@32M 830.2 / 128@64M 934.4 / 192@100M 971.3 vs shipped block-32 809.3;
the 384@100M single-cell compile hung >6 min and was abandoned) — the
raised tier therefore only engages when the default-budget fit fails.
Model-level: ViLT bench 3,698.8 q/s at batch 256 and 3,756.4 at 384
(vs 3,408/3,470 q-tiled; 3,586 at the old batch-128 optimum) — batch
scaling is monotonic again, optimum 384 like the other backbones.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, E = 12, 768
ITERS = 50


def fullseq(q, k, v, bias, bt, vmem_mb):
    from rgqa_tpu.ops.attention import _fused_kernel

    b, sq, e = q.shape
    skv = k.shape[1]
    d = e // H
    pad = (-b) % bt
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, pad), (0, 0)))
    rows = q.shape[0]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, num_heads=H, head_dim=d),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * H * sq * skv * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=rows * H * sq * skv,
        ),
    )(q, k, v, bias)
    return out[:b] if pad else out


def timed(fn, b, s, skv=None):
    skv = skv or s
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, E), jnp.bfloat16)
    k = jax.random.normal(kk, (b, skv, E), jnp.bfloat16)
    v = jax.random.normal(kv, (b, skv, E), jnp.bfloat16)
    bias = jnp.zeros((b, skv), jnp.float32)

    @jax.jit
    def loop(q, k, v, bias):
        def body(c, _):
            o = fn(q + c.astype(jnp.bfloat16), k, v, bias)
            return jnp.mean(o.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    np.asarray(loop(q, k, v, bias))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(q, k, v, bias))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6


def main():
    from rgqa_tpu.ops import attention as A

    print(f"devices: {jax.devices()}")

    # --- ViLT long-stream shape ---
    S = 165
    for b in (256, 384):
        us = timed(lambda q, k, v, m: A._fused_qblocked_raw(q, k, v, m, H), b, S)
        print(f"vilt b={b:4d} qtiled(shipped)      {us:8.1f} us", flush=True)
        for bt, mb in ((8, 24), (8, 64), (16, 48), (16, 100), (32, 100)):
            try:
                us = timed(
                    lambda q, k, v, m, bt=bt, mb=mb: fullseq(q, k, v, m, bt, mb),
                    b, S,
                )
                print(f"vilt b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M {us:8.1f} us",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"vilt b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)

    # --- LXMERT 36x36 self-attention, headline batch 384 ---
    S = 36
    b = 384
    us = timed(lambda q, k, v, m: A._fused_pallas_raw(q, k, v, m, H), b, S)
    print(f"lx36 b={b:4d} shipped(block32)      {us:8.1f} us", flush=True)
    for bt, mb in ((64, 32), (128, 64), (192, 100), (384, 100)):
        try:
            us = timed(
                lambda q, k, v, m, bt=bt, mb=mb: fullseq(q, k, v, m, bt, mb), b, S
            )
            print(f"lx36 b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M {us:8.1f} us",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"lx36 b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

    # --- LXMERT 20x36 cross-attention ---
    b = 384
    us = timed(lambda q, k, v, m: A._fused_pallas_raw(q, k, v, m, H), b, 20, 36)
    print(f"lx20x36 b={b:4d} shipped(block32)   {us:8.1f} us", flush=True)
    for bt, mb in ((64, 32), (128, 64), (384, 100)):
        try:
            us = timed(
                lambda q, k, v, m, bt=bt, mb=mb: fullseq(q, k, v, m, bt, mb),
                b, 20, 36,
            )
            print(f"lx20x36 b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M {us:8.1f} us",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"lx20x36 b={b:4d} fullseq bt={bt:3d} vmem={mb:3d}M FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
