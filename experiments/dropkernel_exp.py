"""Per-op microbench: deterministic fused attention kernel vs the
in-kernel-dropout variant, per RGQA shape at batch 384, bf16.

Isolates where the MC-dropout per-pass overhead lives: block-size
penalty vs PRNG draw cost vs mask apply.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.ops.attention import _fused, _fused_drop

E = 768
H = 12
B = 384


def bench(fn, args, iters=200):
    @jax.jit
    def run(a0, rest):
        def body(c, _):
            out = fn(c, *rest)
            return (out * 0 + a0).astype(a0.dtype), None

        c, _ = jax.lax.scan(body, a0, None, length=iters)
        return c

    np.asarray(run(args[0], args[1:]))
    t0 = time.perf_counter()
    np.asarray(run(args[0], args[1:]))
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    seed = jnp.array([1234], jnp.int32)
    for sq, skv in [(20, 20), (36, 36), (20, 36), (36, 20)]:
        q = jnp.asarray(rng.standard_normal((B, sq, E)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, skv, E)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, skv, E)), jnp.bfloat16)
        bias = jnp.zeros((B, skv), jnp.float32)

        t_det = bench(lambda q, k, v, b: _fused(q, k, v, b, H), (q, k, v, bias))
        t_dr = bench(
            lambda q, k, v, b: _fused_drop(q, k, v, b, seed, H, 0.1),
            (q, k, v, bias),
        )
        t_d0 = bench(
            lambda q, k, v, b: _fused_drop(q, k, v, b, seed, H, 0.0),
            (q, k, v, bias),
        )
        print(
            f"{sq}x{skv}: det {t_det:.0f} us, drop(0.1) {t_dr:.0f} us, "
            f"drop(0.0) {t_d0:.0f} us",
            flush=True,
        )


if __name__ == "__main__":
    main()
