"""Training-step throughput benchmark on one TPU chip.

Full RGQA finetune configuration (reference ``run/gqa_conf_finetune.bash``
+ ``gqa_conf.py:140-243``): LXMERT 9/5/5 x 768, 1842 answers, BCE x K
loss, global clip-by-norm 5.0, BertAdam, RP pseudo-UQ augmentation on
device (--sample_pair doubles the effective batch).

Chained dispatch: N steps inside one jitted ``lax.scan`` over the train
state, one host fetch at the end (the only reliable sync on this
platform).  Prints ONE JSON line
``{"unit": "examples/sec/chip", "batch": B, "examples_per_sec": ...,
"step_ms": ...}`` where examples/sec counts the pre-augmentation batch.

Env: RGQA_BENCH_BATCH (default 128; ViLT 64), RGQA_BENCH_ITERS (default
8), RGQA_BENCH_BACKBONE (lxmert default / uniter / butd / vilt — the
finetune step is generic over the zoo).

``RGQA_BENCH_PRETRAIN=1`` benchmarks the LXMERT *pretraining* step
instead (reference ``src/pretrain/lxmert_pretrain.py:309-360``): the
5-task loss (MLM + matched + obj/attr CE + feat smooth-L1 + QA) over the
full 9/5/5 x 768 model with on-device matched-swap / word-mask / RoI-mask
augmentation, 9500-answer QA head, batch 256 (the reference's pretrain
batch size).
"""

from __future__ import annotations

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def pretrain_main():
    """ms/step for the full 5-task LXMERT pretraining step."""
    from rgqa_tpu.config import EncoderConfig, ModelConfig
    from rgqa_tpu.models.lxmert import LxmertPretraining
    from rgqa_tpu.models.zoo import example_batch
    from rgqa_tpu.pretrain.trainer import make_pretrain_step
    from rgqa_tpu.train import bert_adam, create_train_state

    batch_size = int(os.environ.get("RGQA_BENCH_BATCH", "256"))
    iters = int(os.environ.get("RGQA_BENCH_ITERS", "8"))

    cfg = ModelConfig(backbone="lxmert")
    num_answers = 9500  # reference all-dataset answer table size
    if os.environ.get("RGQA_BENCH_TINY"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        cfg = ModelConfig(
            backbone="lxmert",
            encoder=EncoderConfig(
                hidden_size=32, num_heads=4, intermediate_size=64,
                vocab_size=128, l_layers=1, x_layers=1, r_layers=1,
                num_objects=4, visual_feat_dim=16,
            ),
            num_answers=8, max_text_len=6,
        )
        num_answers = 8

    enc = cfg.encoder
    model = LxmertPretraining(enc, num_answers=num_answers, dtype=jnp.bfloat16)
    host = example_batch(cfg, batch_size=batch_size, seed=0)
    rng = np.random.default_rng(0)
    host["obj_id"] = rng.integers(
        0, enc.obj_vocab_size, (batch_size, enc.num_objects), dtype=np.int32
    )
    host["attr_id"] = rng.integers(
        0, enc.attr_vocab_size, (batch_size, enc.num_objects), dtype=np.int32
    )
    # ~30% answerless rows, like caption-only pretraining data.
    ans = rng.integers(0, num_answers, (batch_size,)).astype(np.int32)
    ans[rng.random(batch_size) < 0.3] = -1
    host["ans"] = ans
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2], batch["input_mask"][:2],
        batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
    )["params"]
    tx = bert_adam(1e-4, warmup=0.05, t_total=100_000)
    state = create_train_state(params, tx)
    # donate=False: the step runs inside a scan body (outer jit owns the
    # buffers), so per-call donation would be invalid.
    step, _ = make_pretrain_step(model, tx, donate=False)

    @functools.partial(jax.jit, static_argnames=("n",))
    def train_n(state, batch, n):
        def body(state, i):
            state, parts = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(0), i)
            )
            total = sum(jnp.asarray(v, jnp.float32) for v in parts.values())
            return state, total

        return jax.lax.scan(body, state, jnp.arange(n), length=n)

    # RGQA_BENCH_CHUNK: measure the REAL trainer dispatch structure
    # instead of the chained scan — per-step dispatch (CHUNK=1, one
    # synchronous tunnel round trip per optimizer step) or the
    # --train_chunk grouped dispatch (CHUNK=K, one per K steps), exactly
    # the loop pretrain/trainer.py runs.  The chained-scan default below
    # is the dispatch-free device bound.
    chunk_env = os.environ.get("RGQA_BENCH_CHUNK")
    if chunk_env:
        chunk = max(1, int(chunk_env))
        from rgqa_tpu.train import make_chunked_train_step

        chunk_run = make_chunked_train_step(step) if chunk > 1 else None
        # chunk=1 measures the real per-step trainer loop, which donates
        # its state (trainer.py builds donate = chunk == 1); the
        # donate=False `step` above exists for the scan-body modes.
        step1, _ = (
            make_pretrain_step(model, tx, donate=True) if chunk == 1
            else (None, None)
        )
        iters = max(iters, chunk) // chunk * chunk

        def run_loop(state, key):
            for i in range(0, iters, chunk):
                if chunk > 1:
                    state, key, auxs = chunk_run(
                        state, (batch,) * chunk, key
                    )
                else:
                    key, sub = jax.random.split(key)
                    state, auxs = step1(state, batch, sub)
            # host transfer = the only real sync on axon
            return state, float(np.asarray(auxs["mask_lm"]).reshape(-1)[-1])

        state, _ = run_loop(state, jax.random.PRNGKey(1))  # compile
        start = time.perf_counter()
        state, last = run_loop(state, jax.random.PRNGKey(2))
        elapsed = time.perf_counter() - start
        assert np.isfinite(last)
        print(
            json.dumps(
                {
                    "unit": "examples/sec/chip",
                    "mode": f"pretrain_dispatch_chunk{chunk}",
                    "batch": batch_size,
                    "examples_per_sec": round(
                        batch_size * iters / elapsed, 1
                    ),
                    "step_ms": round(elapsed / iters * 1e3, 2),
                }
            )
        )
        return

    state, losses = train_n(state, batch, iters)
    np.asarray(losses)  # compile + warmup sync
    start = time.perf_counter()
    state, losses = train_n(state, batch, iters)
    losses = np.asarray(losses)
    elapsed = time.perf_counter() - start
    assert np.isfinite(losses).all()

    print(
        json.dumps(
            {
                "unit": "examples/sec/chip",
                "mode": "pretrain",
                "batch": batch_size,
                "examples_per_sec": round(batch_size * iters / elapsed, 1),
                "step_ms": round(elapsed / iters * 1e3, 2),
            }
        )
    )


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.train import bert_adam, create_train_state, make_train_step

    if os.environ.get("RGQA_BENCH_PRETRAIN"):
        return pretrain_main()

    backbone = os.environ.get("RGQA_BENCH_BACKBONE", "lxmert")
    if os.environ.get("RGQA_BENCH_TINY"):
        backbone = "lxmert"  # smoke contract is LXMERT-shaped
    # ViLT trains a 165-token pixel stream: batch 64 (x2 RP augmentation)
    # is the reference-scale effective batch; LXMERT keeps 128.
    default_batch = "64" if backbone == "vilt" else "128"
    batch_size = int(os.environ.get("RGQA_BENCH_BATCH", default_batch))
    iters = int(os.environ.get("RGQA_BENCH_ITERS", "8"))

    cfg = ModelConfig(backbone=backbone)
    if os.environ.get("RGQA_BENCH_TINY"):
        # CPU-testable smoke shape: guards the driver-run contract
        # (tests/test_bench_smoke.py) without full-size compiles.
        # (env-var platform selection is dead here — sitecustomize imports
        # jax first — so retarget via jax.config, as tests/conftest does.)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        from rgqa_tpu.config import EncoderConfig

        cfg = ModelConfig(
            backbone=backbone,
            encoder=EncoderConfig(
                hidden_size=32, num_heads=4, intermediate_size=64,
                vocab_size=128, l_layers=1, x_layers=1, r_layers=1,
                num_objects=4, visual_feat_dim=16,
            ),
            num_answers=8, max_text_len=6,
        )
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=batch_size, seed=0, with_target=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    if backbone == "butd":
        init_args = (
            batch["token_ids"][:2], batch["feats"][:2], batch["boxes"][:2]
        )
    elif backbone == "vilt":
        init_args = (
            batch["input_ids"][:2], batch["input_mask"][:2],
            batch["pixels"][:2],
        )
    else:
        init_args = (
            batch["input_ids"][:2], batch["input_mask"][:2],
            batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
        )
    params = model.init(jax.random.PRNGKey(0), *init_args)["params"]

    tx = bert_adam(1e-5, warmup=0.1, t_total=10_000)
    state = create_train_state(params, tx)
    # donate=False: the step runs inside a scan body (the outer jit owns
    # the buffers), so per-call donation would be invalid.
    step = make_train_step(forward, loss="bce", sample_pair=True, donate=False)

    @functools.partial(jax.jit, static_argnames=("n",))
    def train_n(state, batch, n):
        def body(carry, i):
            state = carry
            state, aux = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(0), i
            ))
            return state, aux["loss"]

        state, losses = jax.lax.scan(
            body, state, jnp.arange(n), length=n
        )
        return state, losses

    state, losses = train_n(state, batch, iters)
    np.asarray(losses)  # compile + warmup sync
    start = time.perf_counter()
    state, losses = train_n(state, batch, iters)
    losses = np.asarray(losses)
    elapsed = time.perf_counter() - start
    assert np.isfinite(losses).all()

    print(
        json.dumps(
            {
                "unit": "examples/sec/chip",
                "backbone": backbone,
                "batch": batch_size,
                "examples_per_sec": round(batch_size * iters / elapsed, 1),
                "step_ms": round(elapsed / iters * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
