"""Ablate where the MC-dropout overhead lives at 5x384=1920 rows.

Times the full-size LXMERT forward (bf16) at 1920 rows:
  det        : deterministic
  drop       : dropout on (current: in-kernel attn dropout + nn.Dropout hidden)
  drop_noh   : hidden_dropout=0 (attn-prob kernel dropout only)
  drop_noa   : attention_dropout=0 (hidden nn.Dropout only)
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_forward(forward, params, batch, *, det, rng, iters=8):
    @functools.partial(jax.jit, static_argnames=())
    def run(params, batch, carry):
        def body(c, i):
            b = dict(batch)
            b["input_ids"] = batch["input_ids"] + (c[:, None] % 2).astype(jnp.int32)
            r = None if rng is None else jax.random.fold_in(rng, i)
            out = forward(params, b, deterministic=det, rng=r)
            return out["logits"].argmax(-1).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, carry, jnp.arange(iters))
        return c

    carry = jnp.zeros((batch["input_ids"].shape[0],), jnp.int32)
    np.asarray(run(params, batch, carry))
    t0 = time.perf_counter()
    np.asarray(run(params, batch, carry))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch

    rows = 384
    key = jax.random.key(0, impl="rbg")

    base = ModelConfig(backbone="lxmert")
    host = example_batch(base, batch_size=rows, seed=0)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    both_zero = dataclasses.replace(
        base, encoder=dataclasses.replace(
            base.encoder, hidden_dropout=0.0, attention_dropout=0.0
        )
    )
    variants = {
        "det": (base, True),
        "drop": (base, False),
        "drop_none": (both_zero, False),
        "drop_noh": (
            dataclasses.replace(
                base, encoder=dataclasses.replace(base.encoder, hidden_dropout=0.0)
            ),
            False,
        ),
        "drop_noa": (
            dataclasses.replace(
                base,
                encoder=dataclasses.replace(base.encoder, attention_dropout=0.0),
            ),
            False,
        ),
    }
    params = None
    for name, (cfg, det) in variants.items():
        model, forward = build_model(cfg, use_bf16=True)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0),
                batch["input_ids"][:2], batch["input_mask"][:2],
                batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
            )["params"]
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
        ms = bench_forward(forward, params, batch, det=det, rng=None if det else key)
        print(f"{name}: {ms:.1f} ms ({rows / ms * 1e3:.0f} rows/s)", flush=True)


if __name__ == "__main__":
    main()
