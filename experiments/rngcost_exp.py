"""What do the dropout mask draws alone cost at model scale?

Times, per full-model-pass worth of draws (LXMERT batch 384):
  hid_<impl>: 58 hidden-site uint8 draws (384, 30, 768) from fold_in keys
  hid_apply : same + where-apply to a carried activation
  one_big   : a single fused draw of the same total size

If the draws alone reproduce the ~10 ms model-level dropout overhead,
generation throughput is the bottleneck; if they are cheap, the
overhead is a schedule/structure effect in the full program.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, E = 384, 30, 768
SITES = 58


def bench(fn, args, iters=8):
    @jax.jit
    def run(a):
        def body(c, i):
            return fn(c, i), None

        c, _ = jax.lax.scan(body, a, jnp.arange(iters))
        return c

    np.asarray(run(args))
    t0 = time.perf_counter()
    np.asarray(run(args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    x = jnp.ones((B, S, E), jnp.bfloat16)

    for impl in ("rbg", "threefry2x32"):
        key = jax.random.key(0, impl=impl)

        def draws(c, i, key=key):
            k0 = jax.random.fold_in(key, i)
            acc = jnp.zeros((), jnp.int32)
            for s in range(SITES):
                bits = jax.random.bits(
                    jax.random.fold_in(k0, s), (B, S, E), jnp.uint8
                )
                acc += jnp.sum((bits == 0).astype(jnp.int32)[:, 0, 0])
            return c + acc.astype(c.dtype) * 0 + c * 0 + c

        print(
            f"hid_{impl}: {bench(draws, jnp.zeros((), jnp.float32)):.2f} ms",
            flush=True,
        )

    key = jax.random.key(0, impl="rbg")

    def apply(c, i):
        k0 = jax.random.fold_in(key, i)
        y = c
        for s in range(SITES):
            bits = jax.random.bits(
                jax.random.fold_in(k0, s), (B, S, E), jnp.uint8
            )
            y = jnp.where(bits >= jnp.uint8(26), y * 1.1016, 0.0)
        return y.astype(c.dtype)

    print(f"hid_apply_rbg: {bench(apply, x):.2f} ms", flush=True)

    def one_big(c, i):
        k0 = jax.random.fold_in(key, i)
        bits = jax.random.bits(k0, (SITES, B, S, E), jnp.uint8)
        return c + jnp.sum((bits == 0).astype(jnp.int32)[:, :, 0, 0]).astype(
            c.dtype
        ) * 0

    print(f"one_big_rbg: {bench(one_big, jnp.zeros((), jnp.float32)):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
