"""Micro-experiment: --train_chunk's win on the tunneled v5e.

Same question as dispatch_exp.py but for TRAINING: the per-step train
loop pays one synchronous dispatch round trip per optimizer step over
the axon tunnel.  Times 16 full-size RP train steps (batch 128,
RP-doubled, bench_train's config) three ways:

  A. per-step dispatch (runner.train's chunk=1 loop shape)
  B. chunk-4 via train.step.make_chunked_train_step (the --train_chunk
     path: stacked batches + key sequence, state donated per group)
  C. one scan over all 16 (the bench_train ideal bound)

Result (v5e, 2026-08-18): recorded in docs/kernels.md.
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

BATCH = 128
N = 16


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.train import (
        bert_adam,
        create_train_state,
        make_chunked_train_step,
        make_train_step,
    )

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=BATCH, seed=0, with_target=True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(host["input_ids"][:2]),
        jnp.asarray(host["input_mask"][:2]),
        jnp.asarray(host["segment_ids"][:2]),
        jnp.asarray(host["feats"][:2]),
        jnp.asarray(host["boxes"][:2]),
    )["params"]
    tx = bert_adam(1e-5, warmup=0.1, t_total=10_000)

    step = make_train_step(forward, sample_pair=True, donate=False)
    chunk_run = make_chunked_train_step(step)

    batches = []
    for i in range(N):
        hb = dict(host)
        hb["input_ids"] = host["input_ids"] + np.int32(i % 2)
        batches.append(
            {k: jnp.asarray(v) for k, v in hb.items()}
        )
    np.asarray(batches[-1]["feats"][0, 0, 0])

    # All three variants draw the per-step keys by chaining
    # key, sub = split(key) from PRNGKey(0) — A on host (its own
    # dispatch round trip per step, like runner.train's chunk=1 loop),
    # B and C inside the jit — so the losses are comparable.
    def run_per_step():
        state = create_train_state(params, tx)
        k = jax.random.PRNGKey(0)
        for b in batches:
            k, sub = jax.random.split(k)
            state, aux = step(state, b, sub)
        return float(aux["loss"])

    run_per_step()  # compile + warm
    t0 = time.perf_counter()
    loss_a = run_per_step()
    t_a = time.perf_counter() - t0
    print(f"A per-step dispatch : {t_a*1e3/N:7.2f} ms/step (loss {loss_a:.3f})")

    # --- B. chunk-4 ----------------------------------------------------
    # chunk_run donates its state, which shares buffers with `params` on
    # the first call — each run needs a fresh COPY of the params.
    K = 4

    def fresh_state():
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, params), tx
        )
        # host transfer = the only real sync on axon (CLAUDE.md);
        # block_until_ready returns early there.
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        return state

    def run_chunked(state):
        # chunk_run splits the per-step keys in-jit from one carried key;
        # replicate the same sequence root so losses stay comparable.
        k = jax.random.PRNGKey(0)
        for i in range(0, N, K):
            state, k, auxs = chunk_run(
                state, tuple(batches[i : i + K]), k
            )
        return float(auxs["loss"][-1])

    run_chunked(fresh_state())
    state = fresh_state()
    t0 = time.perf_counter()
    loss_b = run_chunked(state)
    t_b = time.perf_counter() - t0
    print(f"B chunk-{K} dispatch  : {t_b*1e3/N:7.2f} ms/step (loss {loss_b:.3f})")

    # --- C. one scan over all N (ideal bound) ---------------------------
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_all(state, stacked, k):
        def body(carry, b):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            st, aux = step(st, b, sub)
            return (st, kk), aux

        (state, k), auxs = jax.lax.scan(body, (state, k), stacked)
        return state, auxs

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    k0 = jax.random.PRNGKey(0)
    state, auxs = run_all(fresh_state(), stacked, k0)
    np.asarray(auxs["loss"])  # compile + warm
    state = fresh_state()
    t0 = time.perf_counter()
    state, auxs = run_all(state, stacked, k0)
    losses = np.asarray(auxs["loss"])
    t_c = time.perf_counter() - t0
    print(f"C one-scan ideal    : {t_c*1e3/N:7.2f} ms/step (loss {losses[-1]:.3f})")
    assert abs(loss_a - loss_b) < 1e-2, (loss_a, loss_b)


if __name__ == "__main__":
    main()
