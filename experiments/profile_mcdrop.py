"""Profile one MC-dropout scorer dispatch (batch 384) and print the top
device ops by total duration, parsed from the profiler's trace.json.gz.
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.scorers.core import make_dropout_scorer

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=384, seed=0)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2], batch["input_mask"][:2],
        batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
    )["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    score_fn = make_dropout_scorer(forward, seed_list=range(5))
    out = score_fn(params, batch)
    np.asarray(out["label"])  # compile + sync

    t0 = time.perf_counter()
    for _ in range(4):
        out = score_fn(params, batch)
        np.asarray(out["label"])
    print(f"per-call: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms", flush=True)

    trace_dir = "/tmp/mcdrop_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            out = score_fn(params, batch)
            np.asarray(out["label"])

    files = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("NO TRACE FILES:", os.listdir(trace_dir))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # us
        durs[name] += dur
        counts[name] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    for name, d in top:
        print(f"{d/1e3:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
