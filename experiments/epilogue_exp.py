"""Micro-experiment: fuse the attention epilogue (out-proj + bias +
residual + LayerNorm) into the forward Pallas attention kernel.

Compares, per RGQA attention shape at batch 384:
  A. current: fused_attention (Pallas) -> XLA dense out-proj + residual LN
  B. epilogue-fused Pallas kernel (per-head PV accumulated straight into
     the out-projection, then residual + LN in-kernel)

Timing: lax.scan-chained iterations inside one jit, single host fetch.
Also checks numerics vs the XLA composition.
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 768
H = 12
D = 64
B = 384
EPS = 1e-12


def _epi_kernel(q_ref, k_ref, v_ref, m_ref, res_ref, w_ref, b_ref,
                g_ref, be_ref, o_ref, *, num_heads, head_dim):
    scale = 1.0 / math.sqrt(head_dim)
    bias = m_ref[:][:, None, :]
    d = head_dim
    in_dtype = q_ref.dtype
    acc = None
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
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(in_dtype)
        o = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)
        # ctx_h @ W_o[h*d:(h+1)*d, :] accumulated in f32
        part = jax.lax.dot_general(
            o, w_ref[h * d:(h + 1) * d, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    y = acc + b_ref[:][None, :, :] + res_ref[:].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + EPS)
    z = z * g_ref[:][None, :, :] + be_ref[:][None, :, :]
    o_ref[:] = z.astype(o_ref.dtype)


def epi_fused(q, k, v, mask, res, w, b, g, be, bt):
    bsz, sq, e = q.shape
    skv = k.shape[1]
    rows = bsz
    assert rows % bt == 0
    q_spec = pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_epi_kernel, num_heads=H, head_dim=D),
        grid=(rows // bt,),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec, q_spec,
                  full((e, e)), full((1, e)), full((1, e)), full((1, e))],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((rows, sq, e), q.dtype),
    )(q, k, v, mask, res, w, b.reshape(1, -1), g.reshape(1, -1), be.reshape(1, -1))


def reference(q, k, v, mask, res, w, b, g, be):
    from rgqa_tpu.ops.attention import fused_attention

    ctx = fused_attention(q, k, v, mask, num_heads=H)
    y = (ctx.astype(jnp.float32) @ w.astype(jnp.float32)) + b + res.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + EPS) * g + be
    return z.astype(q.dtype)


def bench(fn, args, iters=200):
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(c, *args[1:])
            return (out * 0 + args[0]).astype(args[0].dtype), None
        c, _ = jax.lax.scan(body, args[0], None, length=iters)
        return c

    np.asarray(run(args))  # compile
    t0 = time.perf_counter()
    np.asarray(run(args))
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    results = {}
    for sq, skv in [(20, 20), (36, 36), (20, 36), (36, 20)]:
        q = jnp.asarray(rng.standard_normal((B, sq, E)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, skv, E)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, skv, E)), jnp.bfloat16)
        mask = jnp.zeros((B, skv), jnp.float32)
        res = jnp.asarray(rng.standard_normal((B, sq, E)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((E,)) * 0.02, jnp.float32)
        g = jnp.asarray(1.0 + rng.standard_normal((E,)) * 0.02, jnp.float32)
        be = jnp.asarray(rng.standard_normal((E,)) * 0.02, jnp.float32)

        ref = np.asarray(reference(q, k, v, mask, res, w, b, g, be), np.float32)
        row = {}
        for bt in (16, 32):
            try:
                got = np.asarray(
                    epi_fused(q, k, v, mask, res, w, b, g, be, bt), np.float32
                )
                err = np.max(np.abs(got - ref))
                t_f = bench(
                    lambda qq, *a: epi_fused(qq, *a, bt), (q, k, v, mask, res, w, b, g, be)
                )
                row[f"fused_bt{bt}"] = round(t_f, 1)
                row[f"err_bt{bt}"] = float(err)
            except Exception as ex:  # noqa
                row[f"fused_bt{bt}"] = f"FAIL {type(ex).__name__}: {str(ex)[:120]}"
        t_ref = bench(lambda qq, *a: reference(qq, *a), (q, k, v, mask, res, w, b, g, be))
        row["split"] = round(t_ref, 1)
        results[f"{sq}x{skv}"] = row
        print(f"{sq}x{skv}: {row}", flush=True)


if __name__ == "__main__":
    main()
