"""Headline benchmark: LXMERT GQA inference throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.
Baseline: 4,000 questions/sec/chip (BASELINE.md north-star for the
reference's PyTorch LXMERT on GPU).

Full RGQA-scale model (9/5/5 x 768, 1842 answers), bf16 compute, batch
1024, fused attention kernels, async dispatch with double-buffered feed.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_QPS = 4000.0


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)

    batch_size = int(os.environ.get("RGQA_BENCH_BATCH", "256"))
    host = example_batch(cfg, batch_size=batch_size, seed=0)
    host["feats"] = host["feats"].astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2],
        batch["input_mask"][:2],
        batch["segment_ids"][:2],
        batch["feats"][:2],
        batch["boxes"][:2],
    )["params"]
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x), params)

    @jax.jit
    def infer(params, batch, carry):
        # `carry` folds the previous step's result into the inputs so
        # consecutive calls are data-dependent — an async backend cannot
        # overlap or elide them, making wall-clock honest.
        b = dict(batch)
        b["input_ids"] = batch["input_ids"] + (carry[:, None] % 2).astype(jnp.int32)
        out = forward(params, b, deterministic=True)
        probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
        return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)

    carry = jnp.zeros((batch_size,), jnp.int32)
    # Warmup / compile.  NOTE: on the axon platform block_until_ready
    # returns early; an explicit host transfer is the only real sync.
    label, score = infer(params, batch, carry)
    np.asarray(label)

    iters = int(os.environ.get("RGQA_BENCH_ITERS", "10"))
    start = time.perf_counter()
    carry = label
    for _ in range(iters):
        carry, score = infer(params, batch, carry)
    np.asarray(carry)  # chained deps + host fetch => all iters completed
    elapsed = time.perf_counter() - start

    qps = batch_size * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "lxmert_gqa_inference_throughput",
                "value": round(qps, 1),
                "unit": "questions/sec/chip",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
