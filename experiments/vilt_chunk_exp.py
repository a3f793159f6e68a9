"""ViLT long-stream attention: q-tiled grid vs batch-chunked sub-calls.

At ViLT's 165-token stream, batch >= 192 makes the full-sequence fused
grid exceed the VMEM budget once Mosaic deepens its pipeline (>= 17
cells doubles the io footprint — docs/kernels.md "ViLT batch sweep").
Round 4 shipped a query-tiled grid for that regime (block 8 x q-88),
measured 3,408 q/s at batch 256 vs 3,586 at the batch-128 full-seq
sweet spot.  Hypothesis: splitting the BATCH into <= 16-cell sub-calls
of the unchanged full-sequence kernel avoids the deepening cliff
entirely and should match the batch-128 rate at any batch size — the
kernel never re-streams K/V across a q axis and never pays the doubled
pipeline footprint.

Measures (chained scan in one jit, single fetch; bf16, H=12, E=768,
S=165) per batch in {256, 384}:

  qtiled      _fused_qblocked_raw as shipped
  chunk128    concat of _fused_pallas_raw over 128-row slices (16 cells)
  chunk64     64-row slices (8 cells) — granularity probe
  xla         natural-layout XLA reference

RESULT (v5e, 2026-08): REFUTED.  The first run's apparent chunk win was
a DCE artifact (the single-element carry let XLA eliminate all but one
sub-call); with a full-output carry, batch-chunking matches the q-tiled
grid (1854 vs 1898 us at b=256) and chunk64 OOMs at b=384 (18.23 MB
scoped vmem) — Mosaic's pipeline deepening applies across ADJACENT
sub-calls, not just within one long grid.  The lever that did work is
the raised scoped-VMEM limit (see vilt_vmem_exp.py, shipped in
ops/attention.py's raised tier).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

H, E, S = 12, 768, 165
ITERS = 50


def timed(name, fn, b):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, S, E), jnp.bfloat16)
    k = jax.random.normal(kk, (b, S, E), jnp.bfloat16)
    v = jax.random.normal(kv, (b, S, E), jnp.bfloat16)
    bias = jnp.zeros((b, S), jnp.float32)

    @jax.jit
    def loop(q, k, v, bias):
        def body(c, _):
            o = fn(q + c.astype(jnp.bfloat16), k, v, bias)
            # Full-output reduction: a single-element carry would let XLA
            # dead-code-eliminate all but the first chunk's pallas_call.
            return jnp.mean(o.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    def fn(q, k, v, bias):
        return BUILDERS[name](q, k, v, bias)

    np.asarray(loop(q, k, v, bias))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(q, k, v, bias))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e6  # us/op


def chunked(q, k, v, bias, chunk):
    from rgqa_tpu.ops import attention as A

    b = q.shape[0]
    outs = [
        A._fused_pallas_raw(
            q[i:i + chunk], k[i:i + chunk], v[i:i + chunk],
            bias[i:i + chunk], H,
        )
        for i in range(0, b, chunk)
    ]
    return jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]


def qtiled(q, k, v, bias):
    from rgqa_tpu.ops import attention as A

    return A._fused_qblocked_raw(q, k, v, bias, H)


def xla(q, k, v, bias):
    from rgqa_tpu.ops import attention as A

    return A._attention_natural_xla(q, k, v, bias, H)


BUILDERS = {
    "qtiled": qtiled,
    "chunk128": lambda q, k, v, bias: chunked(q, k, v, bias, 128),
    "chunk64": lambda q, k, v, bias: chunked(q, k, v, bias, 64),
    "xla": xla,
}


def main():
    print(f"devices: {jax.devices()}")
    results = {}
    for b in (256, 384):
        for name in ("qtiled", "chunk128", "chunk64", "xla"):
            us = timed(name, None, b)
            results[f"{name}_b{b}"] = round(us, 1)
            print(f"b={b:4d} {name:9s} {us:8.1f} us/op", flush=True)
    print(results)


if __name__ == "__main__":
    main()
