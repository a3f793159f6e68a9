"""Micro-experiment: is an int8 serving path worth it at RGQA shapes?

v5e's MXU runs int8xint8->int32 at 2x the bf16 rate, but RGQA's
matmuls are small-M (batch*20 or batch*36 rows) and the measured cost
of elementwise chains on this chip is high (docs/kernels.md), so the
dynamic activation quantization (per-row max-abs + scale + round) may
eat the MXU win.

Measures, scan-chained in one jit with a single host fetch:
  A. bf16 dense chain: the 4 matmuls of one transformer FFN+QKV-ish
     stack at LXMERT shapes, bf16 in / bf16 out.
  B. int8 weights + DYNAMIC per-row int8 activations: quantize x per
     row, int8 dot (preferred_element_type=int32), dequant by
     (row_scale * col_scale).
  C. int8 weights + bf16 activations (weight-only): XLA converts the
     weights on the fly — measures whether weight-streaming is even
     visible at these batch sizes.

Shapes: (B*S, E)@(E, E) x 3 (QKV-ish) + (B*S, E)@(E, 4E) + (B*S, 4E)@(4E, E)
at B=384, S in {20, 36}, E=768.

Result (v5e, 2026-08-18): see the printout recorded in docs/kernels.md.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

E = 768
B = 384
ITERS = 50


def time_fn(fn, *args, iters=ITERS):
    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(*a, c)
            # fold the output back in so iterations can't be DCE'd
            return jnp.tanh(out.mean()).astype(c.dtype), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)[0]

    np.asarray(chained(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chained(*args))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3  # ms per iteration


def make_weights(key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 5)
    wq = jax.random.normal(ks[0], (E, E), dtype) * 0.02
    wk = jax.random.normal(ks[1], (E, E), dtype) * 0.02
    wv = jax.random.normal(ks[2], (E, E), dtype) * 0.02
    w1 = jax.random.normal(ks[3], (E, 4 * E), dtype) * 0.02
    w2 = jax.random.normal(ks[4], (4 * E, E), dtype) * 0.02
    return wq, wk, wv, w1, w2


def quant_w(w):
    """Per-output-column symmetric int8."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s  # (in, out) int8, (1, out) f32


def quant_x(x):
    """Per-row symmetric int8 (dynamic)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_dot(x_q, x_s, w_q, w_s, out_dtype=jnp.bfloat16):
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * x_s * w_s).astype(out_dtype)


def run(S):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B * S, E), jnp.bfloat16)
    wq, wk, wv, w1, w2 = make_weights(jax.random.PRNGKey(1))
    qs = [quant_w(w) for w in (wq, wk, wv, w1, w2)]

    def chain_bf16(x, wq, wk, wv, w1, w2, c):
        h = x + c.astype(x.dtype)
        a = h @ wq + h @ wk + h @ wv
        f = jax.nn.gelu(a @ w1)
        return f @ w2

    def chain_int8_dyn(x, c):
        h = x + c.astype(x.dtype)
        hq, hs = quant_x(h)
        a = (
            int8_dot(hq, hs, *qs[0])
            + int8_dot(hq, hs, *qs[1])
            + int8_dot(hq, hs, *qs[2])
        )
        aq, as_ = quant_x(a)
        f = jax.nn.gelu(int8_dot(aq, as_, *qs[3]))
        fq, fs = quant_x(f)
        return int8_dot(fq, fs, *qs[4])

    def chain_weight_only(x, c):
        h = x + c.astype(x.dtype)
        ws = [
            (q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)) for q, s in qs
        ]
        a = h @ ws[0] + h @ ws[1] + h @ ws[2]
        f = jax.nn.gelu(a @ ws[3])
        return f @ ws[4]

    t_bf16 = time_fn(chain_bf16, x, wq, wk, wv, w1, w2)
    t_dyn = time_fn(chain_int8_dyn, x)
    t_wonly = time_fn(chain_weight_only, x)
    print(
        f"S={S:3d} rows={B*S:6d}: bf16 {t_bf16:7.3f} ms | "
        f"int8-dynamic {t_dyn:7.3f} ms ({t_bf16/t_dyn:4.2f}x) | "
        f"int8-weight-only {t_wonly:7.3f} ms ({t_bf16/t_wonly:4.2f}x)"
    )

    # numerics: relative error of the int8 chain vs f32
    ref = np.asarray(
        chain_bf16(
            x.astype(jnp.float32), *(w.astype(jnp.float32) for w in (wq, wk, wv, w1, w2)),
            jnp.zeros((), jnp.float32),
        )
    )
    got = np.asarray(chain_int8_dyn(x, jnp.zeros((), jnp.float32))).astype(np.float32)
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    print(f"        int8-dynamic rel err: mean {rel.mean():.4f} p99 {np.percentile(rel, 99):.4f}")


def run_static(S):
    """Variant D: static per-tensor activation scales (offline-calibrated)
    — quant becomes a fused scale+round+clip+cast with no runtime
    reduction."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B * S, E), jnp.bfloat16)
    wq, wk, wv, w1, w2 = make_weights(jax.random.PRNGKey(1))
    qs = [quant_w(w) for w in (wq, wk, wv, w1, w2)]

    def static_q(x, s):
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)), -127, 127)
        return q.astype(jnp.int8)

    # calibrate scales from one batch (as an offline pass would)
    def chain_probe(x):
        h = x
        a = h @ wq + h @ wk + h @ wv
        f = jax.nn.gelu(a @ w1)
        return h, a, f

    h0, a0, f0 = chain_probe(x)
    s_h = float(jnp.max(jnp.abs(h0.astype(jnp.float32)))) / 127.0
    s_a = float(jnp.max(jnp.abs(a0.astype(jnp.float32)))) / 127.0
    s_f = float(jnp.max(jnp.abs(f0.astype(jnp.float32)))) / 127.0

    def dot8(x_q, s_x, w_q, w_s):
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * (s_x * w_s)).astype(jnp.bfloat16)

    def chain_int8_static(x, c):
        h = x + c.astype(x.dtype)
        hq = static_q(h, s_h)
        a = dot8(hq, s_h, *qs[0]) + dot8(hq, s_h, *qs[1]) + dot8(hq, s_h, *qs[2])
        aq = static_q(a, s_a)
        f = jax.nn.gelu(dot8(aq, s_a, *qs[3]))
        fq = static_q(f, s_f)
        return dot8(fq, s_f, *qs[4])

    t_static = time_fn(chain_int8_static, x)
    ref = np.asarray(
        x.astype(jnp.float32) @ wq.astype(jnp.float32)
        + x.astype(jnp.float32) @ wk.astype(jnp.float32)
        + x.astype(jnp.float32) @ wv.astype(jnp.float32)
    )
    ref = np.asarray(jax.nn.gelu(jnp.asarray(ref) @ w1.astype(jnp.float32)) @ w2.astype(jnp.float32))
    got = np.asarray(chain_int8_static(x, jnp.zeros((), jnp.float32))).astype(np.float32)
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    print(
        f"S={S:3d} int8-static {t_static:7.3f} ms | rel err mean {rel.mean():.4f} p99 {np.percentile(rel, 99):.4f}"
    )


if __name__ == "__main__":
    for S in (20, 36):
        run(S)
        run_static(S)
