"""Headline benchmark: LXMERT GQA inference throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.
Baseline: 4,000 questions/sec/chip (BASELINE.md north-star for the
reference's PyTorch LXMERT on GPU).

Full RGQA-scale model (9/5/5 x 768, 1842 answers), bf16 compute, batch
384 (see RGQA_BENCH_BATCH note below), fused attention kernels, chained
iterations in one executable so the tunnel RTT is paid once.
``RGQA_BENCH_BACKBONE`` selects lxmert (default) / uniter / butd / vilt.
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

    backbone = os.environ.get("RGQA_BENCH_BACKBONE", "lxmert")
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
                num_layers=1, num_objects=4, visual_feat_dim=16,
            ),
            num_answers=8, max_text_len=6,
            vilt_image_size=32, vilt_patch_size=16,
        )
    model, forward = build_model(cfg, use_bf16=True)

    # 384 is the throughput/compile-time sweet spot over the tunnel:
    # 256 -> 10.6k q/s (~2 min wall), 384 -> 11.1k (~3.3 min),
    # 512 -> 11.6k (~5.3 min; compile risk).  ViLT runs a 165-token
    # single stream; since the raised-VMEM full-sequence tier
    # (ops/attention.py, docs/kernels.md) its throughput scales with
    # batch: 128 -> 3.59k, 256 -> 3.70k, 384 -> 3.76k q/s — same
    # optimum batch as the other backbones.  BUTD is the exception: its
    # GRU scan leaves the MXU idle at 384 rows, and the per-step state is
    # tiny, so batch 1536 lifts it 155.9k -> 207.0k q/s (measured at
    # n=25) with no compile-budget risk (the GRU program is small).
    default_batch = "1536" if backbone == "butd" else "384"
    batch_size = int(os.environ.get("RGQA_BENCH_BATCH", default_batch))
    host = example_batch(cfg, batch_size=batch_size, seed=0)
    if "feats" in host:
        host["feats"] = host["feats"].astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    if backbone == "butd":
        init_args = (batch["token_ids"][:2], batch["feats"][:2], batch["boxes"][:2])
    elif backbone == "vilt":
        init_args = (
            batch["input_ids"][:2], batch["input_mask"][:2], batch["pixels"][:2],
        )
    else:
        init_args = (
            batch["input_ids"][:2], batch["input_mask"][:2],
            batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
        )
    params = model.init(jax.random.PRNGKey(0), *init_args)["params"]
    # Inference serves from bf16 weights: halves HBM weight traffic
    # (training keeps f32 master params; this is the serving path —
    # shared convention with cli/serve.py).
    from rgqa_tpu.runner import cast_params_bf16

    params = jax.device_put(cast_params_bf16(params))

    # Scan length: with n chained iterations the ONE synchronous tunnel
    # dispatch (~30-40 ms quiet) is amortized across n steps.  At the
    # old n=10 that round trip was still 9% of the LXMERT window (and
    # ~47% of BUTD's); n=50 saturates — measured lxmert 11,168 -> 12,210
    # q/s at n=50 with n=100 flat at 12,208.  BUTD stays at n=25: its
    # nested scan (outer chain x 40 GRU steps) blew the remote-compile
    # budget at n=50 (>20 min, wedged the tunnel); n=25 compiles in ~4
    # min and measures 207.0k q/s at the batch-1536 default.
    default_iters = "25" if backbone == "butd" else "50"
    iters = int(os.environ.get("RGQA_BENCH_ITERS", default_iters))
    # Default (None) auto-selects the fused Pallas attention kernel on TPU
    # (natural-layout VMEM-resident kernel + fused QKV projections;
    # measured 8.25k -> see BENCH history).  RGQA_BENCH_FUSED=0 forces the
    # XLA attention path for comparison.
    env = os.environ.get("RGQA_BENCH_FUSED")
    use_fused = None if env is None else env not in ("0", "")

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def infer_n(params, batch, carry, n):
        """n chained model invocations inside ONE executable.

        Each step's result perturbs the next step's inputs, so XLA cannot
        elide or reorder them; one program = one dispatch, measuring pure
        device throughput (the tunnel adds ~50 ms per dispatch otherwise).
        """

        def body(carry, _):
            b = dict(batch)
            ids_key = "token_ids" if backbone == "butd" else "input_ids"
            b[ids_key] = batch[ids_key] + (carry[:, None] % 2).astype(
                jnp.int32
            )
            kw = {} if backbone == "butd" else {"use_fused": use_fused}
            out = forward(params, b, deterministic=True, **kw)
            probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
            return jnp.argmax(probs, axis=-1).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, carry, None, length=n)
        return carry

    carry = jnp.zeros((batch_size,), jnp.int32)
    # Warmup / compile.  NOTE: on the axon platform block_until_ready
    # returns early; an explicit host transfer is the only real sync.
    np.asarray(infer_n(params, batch, carry, iters))

    start = time.perf_counter()
    carry = infer_n(params, batch, carry, iters)
    np.asarray(carry)
    elapsed = time.perf_counter() - start

    qps = batch_size * iters / elapsed
    print(
        json.dumps(
            {
                "metric": f"{backbone}_gqa_inference_throughput",
                "value": round(qps, 1),
                "unit": "questions/sec/chip",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
