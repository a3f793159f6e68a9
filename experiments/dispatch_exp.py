"""Micro-experiment: where does the per-batch dispatch overhead of the
production scoring loop go, with inputs already on device?

bench_scorers measured (batch 384, v5e over the axon tunnel):
chained-scan 10.8k q/s vs pipelined per-batch loop over DEVICE-RESIDENT
inputs 5.3k — i.e. ~37 ms/batch of non-compute overhead despite lag-4
output fetching.  Distinguish:

  A. pure-async enqueue: dispatch N batches with NO intermediate fetch,
     fetch everything at the end.  If this runs at ~compute speed the
     dispatches are async and deeper lag fixes the loop; if each call
     pays a round trip, only chunking (K batches per jit call) helps.
  B. lag sweep: pipelined_map-style loop at lag 2/4/8/16.
  C. chunked: one jitted lax.scan over a stacked (K, B, ...) group,
     K = 2/4/8, outputs fetched per chunk.

Result (v5e, 2026-08-18, batch 384 x 16, MSP scorer): recorded in
docs/kernels.md "Production scoring pipeline".
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

BATCH = int(os.environ.get("RGQA_BENCH_BATCH", "384"))
N = 16


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.scorers.core import make_msp_scorer

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=BATCH, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(host["input_ids"][:2]),
        jnp.asarray(host["input_mask"][:2]),
        jnp.asarray(host["segment_ids"][:2]),
        jnp.asarray(host["feats"][:2]),
        jnp.asarray(host["boxes"][:2]),
    )["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    score = make_msp_scorer(forward)

    batches = []
    for i in range(N):
        hb = dict(host)
        hb["input_ids"] = host["input_ids"] + np.int32(i % 2)
        batches.append(
            {
                k: (jnp.asarray(v, jnp.bfloat16)
                    if k == "feats" and v.dtype == np.float32
                    else jnp.asarray(v))
                for k, v in hb.items()
            }
        )
    np.asarray(batches[-1]["feats"][0, 0, 0])

    def fetch(out):
        return {k: np.asarray(v) for k, v in out.items()}

    # --- A. enqueue-all, fetch-at-end -------------------------------
    def run_async():
        outs = [score(params, b) for b in batches]
        return [fetch(o) for o in outs]

    run_async()  # compile + warm
    t0 = time.perf_counter()
    run_async()
    t_async = time.perf_counter() - t0
    print(f"A enqueue-all           : {t_async*1e3/N:7.2f} ms/batch "
          f"({BATCH*N/t_async:8.1f} q/s)")

    # --- B. lag sweep ------------------------------------------------
    for lag in (2, 4, 8, 16):
        def run_lag(lag=lag):
            pend = []
            res = []
            for b in batches:
                pend.append(score(params, b))
                if len(pend) > lag:
                    res.append(fetch(pend.pop(0)))
            res.extend(fetch(o) for o in pend)
            return res

        run_lag()
        t0 = time.perf_counter()
        run_lag()
        dt = time.perf_counter() - t0
        print(f"B lag-{lag:<2d}               : {dt*1e3/N:7.2f} ms/batch "
              f"({BATCH*N/dt:8.1f} q/s)")

    # --- C. chunked scan ---------------------------------------------
    for k in (2, 4, 8):
        stackable = batches[: (N // k) * k]

        @functools.partial(jax.jit)
        def run_chunk(params, stacked):
            def body(_, b):
                out = score(params, b)
                return None, {kk: out[kk] for kk in ("label", "score")}

            return jax.lax.scan(body, None, stacked)[1]

        groups = [
            jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *stackable[i : i + k]
            )
            for i in range(0, len(stackable), k)
        ]

        def run_chunked():
            outs = [run_chunk(params, g) for g in groups]
            return [fetch(o) for o in outs]

        run_chunked()
        t0 = time.perf_counter()
        run_chunked()
        dt = time.perf_counter() - t0
        n = len(groups) * k
        print(f"C chunk-{k:<2d}             : {dt*1e3/n:7.2f} ms/batch "
              f"({BATCH*n/dt:8.1f} q/s)")


if __name__ == "__main__":
    main()
