"""Hidden-dropout mask representations: which apply-path is fast on v5e?

58 chained sites on a (384, 30, 768) bf16 activation (one model pass):
  u8_where   : uint8 bits >= t -> where            (current; measured slow)
  u32_where  : uint32 bits >= t32 -> where
  f32_unif   : uniform f32 < p -> where
  bf16_unif  : uniform bf16 < p -> where
  u8_mul     : y * (u8 bits >= t).astype(bf16) * scale
  b16_arith  : uint16 bits; mask = min(bits // t16, 1) as bf16 mul (no bool)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, E = 384, 30, 768
SITES = 58
RATE = 0.1


def bench(fn, iters=8):
    @jax.jit
    def run(a):
        def body(c, i):
            return fn(c, i), None

        c, _ = jax.lax.scan(body, a, jnp.arange(iters))
        return c

    x = jnp.ones((B, S, E), jnp.bfloat16)
    np.asarray(run(x))
    t0 = time.perf_counter()
    np.asarray(run(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.key(0, impl="rbg")
    t8 = 26
    scale = jnp.bfloat16(256.0 / (256 - t8))

    def u8_where(c, i):
        k0 = jax.random.fold_in(key, i)
        y = c
        for s in range(SITES):
            bits = jax.random.bits(jax.random.fold_in(k0, s), (B, S, E), jnp.uint8)
            y = jnp.where(bits >= jnp.uint8(t8), y * scale, jnp.bfloat16(0))
        return y

    def u32_where(c, i):
        k0 = jax.random.fold_in(key, i)
        t32 = jnp.uint32(int(RATE * 4294967295))
        y = c
        for s in range(SITES):
            bits = jax.random.bits(jax.random.fold_in(k0, s), (B, S, E), jnp.uint32)
            y = jnp.where(bits >= t32, y * scale, jnp.bfloat16(0))
        return y

    def f32_unif(c, i):
        k0 = jax.random.fold_in(key, i)
        y = c
        for s in range(SITES):
            u = jax.random.uniform(jax.random.fold_in(k0, s), (B, S, E))
            y = jnp.where(u >= RATE, y * scale, jnp.bfloat16(0))
        return y

    def bf16_unif(c, i):
        k0 = jax.random.fold_in(key, i)
        y = c
        for s in range(SITES):
            u = jax.random.uniform(
                jax.random.fold_in(k0, s), (B, S, E), jnp.bfloat16
            )
            y = jnp.where(u >= jnp.bfloat16(RATE), y * scale, jnp.bfloat16(0))
        return y

    def u8_mul(c, i):
        k0 = jax.random.fold_in(key, i)
        y = c
        for s in range(SITES):
            bits = jax.random.bits(jax.random.fold_in(k0, s), (B, S, E), jnp.uint8)
            m = (bits >= jnp.uint8(t8)).astype(jnp.bfloat16)
            y = y * m * scale
        return y

    def b16_arith(c, i):
        k0 = jax.random.fold_in(key, i)
        t16 = jnp.uint16(int(RATE * 65535) or 1)
        y = c
        for s in range(SITES):
            bits = jax.random.bits(jax.random.fold_in(k0, s), (B, S, E), jnp.uint16)
            m = jnp.minimum(bits // t16, jnp.uint16(1)).astype(jnp.bfloat16)
            y = y * m * scale
        return y

    def hash_mul(c, i):
        # counter-based: murmur3 finalizer over iota ^ per-(iter,site) key
        n0 = jax.lax.broadcasted_iota(jnp.uint32, (B, S, E), 0)
        n1 = jax.lax.broadcasted_iota(jnp.uint32, (B, S, E), 1)
        n2 = jax.lax.broadcasted_iota(jnp.uint32, (B, S, E), 2)
        cnt = (n0 * jnp.uint32(S) + n1) * jnp.uint32(E) + n2
        y = c
        for s in range(SITES):
            x = cnt ^ (i.astype(jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(s * 40503))
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> jnp.uint32(13))
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> jnp.uint32(16))
            keep = (x >> jnp.uint32(24)) >= jnp.uint32(t8)
            y = jnp.where(keep, y * scale, jnp.bfloat16(0))
        return y

    for name, fn in [
        ("hash_mul", hash_mul),
        ("u8_where", u8_where),
        ("u32_where", u32_where),
        ("f32_unif", f32_unif),
        ("bf16_unif", bf16_unif),
        ("u8_mul", u8_mul),
        ("b16_arith", b16_arith),
    ]:
        print(f"{name}: {bench(fn):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
