"""Feats-wire experiment: int8 RoI features over the host->device wire
(VERDICT r3 #9 — measurement only; bf16 stays the default feed).

The production scoring loop on this rig is wire-bound: each question
carries 36x2048 RoI features (147 KB as bf16) across the ~51 MB/s axon
tunnel, capping `score_split` at ~345 q/s regardless of model speed
(docs/kernels.md "Production scoring pipeline").  The one untried lever
is transport-side quantization: int8 features + per-RoI scales on the
wire (73.7 KB/question) with on-chip dequantization to bf16.  This is
NOT the refuted int8 *matmul* work (experiments/int8_exp.py targeted
MXU inputs); here the model still computes in bf16 — only the transport
representation changes.

Measures, interleaved in one process (the tunnel bandwidth varies
run to run):

  prod_bf16   device_prefetch(feed_bf16) + pipelined_map MSP   [baseline]
  prod_int8   pre-quantized int8 feats + scales on the wire,
              dequant fused into the scoring jit
  feed_bf16 / feed_int8   pure device_put bounds for each payload
  quant_host  one-time host quantization cost per batch (production
              would store int8 feats on disk via prepare_data)

plus a fidelity probe: MSP confidence drift of the int8-dequant feed vs
the f32 feed on the same batch (max/mean |dconf|, label flips) — the
scorers live off confidence calibration, so transport quantization has
to be invisible at the score level to be shippable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 384
N_BATCHES = 16


def quantize_feats(feats: np.ndarray):
    """Per-RoI symmetric int8: q = round(f / s), s = maxabs/127 (f32)."""
    maxabs = np.abs(feats).max(axis=-1, keepdims=True)  # (B, R, 1)
    scale = (maxabs / 127.0 + 1e-12).astype(np.float32)
    q = np.clip(np.rint(feats / scale), -127, 127).astype(np.int8)
    return q, scale[..., 0]


def quantize_feats_u4(feats: np.ndarray):
    """Per-RoI asymmetric uint4, two values packed per byte.

    q = round((f - lo) / s) in [0, 15], s = (hi - lo)/15.  Asymmetric
    because Faster-RCNN RoI features are post-ReLU (>= 0): a zero-point
    doubles the usable resolution vs symmetric int4.  Packing: even
    channels in the low nibble, odd channels in the high nibble, so the
    wire payload is (B, R, D/2) uint8 = 36.9 KB/question.  Requires an
    even channel dim D (true for the 2048-d RoI features).
    """
    assert feats.shape[-1] % 2 == 0, "uint4 packing needs an even channel dim"
    lo = feats.min(axis=-1, keepdims=True).astype(np.float32)  # (B, R, 1)
    hi = feats.max(axis=-1, keepdims=True).astype(np.float32)
    scale = ((hi - lo) / 15.0 + 1e-12).astype(np.float32)
    q = np.clip(np.rint((feats - lo) / scale), 0, 15).astype(np.uint8)
    packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(np.uint8)
    return packed, scale[..., 0], lo[..., 0]


def dequant_u4(packed, scale, zero):
    """On-chip unpack of `quantize_feats_u4` back to bf16 (B, R, D)."""
    b = packed.astype(jnp.int32)
    lo = (b & 0xF).astype(jnp.bfloat16)
    hi = ((b >> 4) & 0xF).astype(jnp.bfloat16)
    q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return q * scale.astype(jnp.bfloat16)[..., None] + zero.astype(
        jnp.bfloat16
    )[..., None]


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.data.batching import device_prefetch, pipelined_map
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.scorers.core import make_msp_scorer

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=BATCH, seed=0)
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
    score_fn = make_msp_scorer(forward)

    host_batches = []
    for i in range(N_BATCHES):
        hb = dict(host)
        hb["input_ids"] = host["input_ids"] + np.int32(i % 2)
        host_batches.append(([f"b{i}"], hb, BATCH))

    # Pre-quantized int8 variants (production would store these on disk).
    t0 = time.perf_counter()
    int8_batches = []
    for qids, hb, real in host_batches:
        q, s = quantize_feats(hb["feats"])
        nb = {k: v for k, v in hb.items() if k != "feats"}
        nb["feats_q"], nb["feats_scale"] = q, s
        int8_batches.append((qids, nb, real))
    quant_ms = (time.perf_counter() - t0) * 1e3 / N_BATCHES

    int4_batches = []
    for qids, hb, real in host_batches:
        p, s, z = quantize_feats_u4(hb["feats"])
        nb = {k: v for k, v in hb.items() if k != "feats"}
        nb["feats_p4"], nb["feats_scale4"], nb["feats_zero4"] = p, s, z
        int4_batches.append((qids, nb, real))

    def dequant_score(p, b):
        b = dict(b)
        qf = b.pop("feats_q")
        sc = b.pop("feats_scale")
        b["feats"] = qf.astype(jnp.bfloat16) * sc.astype(jnp.bfloat16)[
            ..., None
        ]
        return score_fn(p, b)

    dequant_score = jax.jit(dequant_score)

    def dequant4_score(p, b):
        b = dict(b)
        pk = b.pop("feats_p4")
        sc = b.pop("feats_scale4")
        zp = b.pop("feats_zero4")
        b["feats"] = dequant_u4(pk, sc, zp)
        return score_fn(p, b)

    dequant4_score = jax.jit(dequant4_score)
    keys = ("label", "score")

    def select(fn, b):
        out = fn(params, b)
        return {k: out[k] for k in keys}

    def run_bf16():
        count = 0
        for _, out, real in pipelined_map(
            lambda b: select(score_fn, b),
            device_prefetch(iter(host_batches), None, feed_bf16=True),
        ):
            count += len(out["label"])
        return count

    def run_int8():
        count = 0
        for _, out, real in pipelined_map(
            lambda b: select(dequant_score, b),
            device_prefetch(iter(int8_batches), None),
        ):
            count += len(out["label"])
        return count

    def run_int4():
        count = 0
        for _, out, real in pipelined_map(
            lambda b: select(dequant4_score, b),
            device_prefetch(iter(int4_batches), None),
        ):
            count += len(out["label"])
        return count

    modes = (
        ("prod_bf16", run_bf16),
        ("prod_int8", run_int8),
        ("prod_int4", run_int4),
    )
    results = {}
    # Interleave all modes round-robin so tunnel drift hits each equally.
    for mode, fn in modes:
        fn()  # compile + warm
    for rep in range(2):
        for mode, fn in modes:
            t0 = time.perf_counter()
            count = fn()
            qps = count / (time.perf_counter() - t0)
            results.setdefault(mode, []).append(qps)

    # Pure-feed bounds.
    import ml_dtypes

    feats16 = host["feats"].astype(ml_dtypes.bfloat16)
    q, s = quantize_feats(host["feats"])
    p4, s4, z4 = quantize_feats_u4(host["feats"])
    for mode, payload in (
        ("feed_bf16", {"feats": feats16}),
        ("feed_int8", {"feats_q": q, "feats_scale": s}),
        ("feed_int4", {"feats_p4": p4, "feats_scale4": s4,
                       "feats_zero4": z4}),
    ):
        d = jax.device_put(payload)
        np.asarray(jax.tree_util.tree_leaves(d)[0].ravel()[0])  # warm
        t0 = time.perf_counter()
        for _ in range(4):
            d = jax.device_put(payload)
            np.asarray(jax.tree_util.tree_leaves(d)[0].ravel()[0])
        results[mode] = [BATCH * 4 / (time.perf_counter() - t0)]

    # Fidelity: quantized-dequant vs f32 feed on one batch.
    out_f32 = score_fn(params, batch)
    s32 = np.asarray(out_f32["score"], np.float64)
    l32 = np.asarray(out_f32["label"])
    b8 = {k: jnp.asarray(v) for k, v in int8_batches[0][1].items()}
    b4 = {k: jnp.asarray(v) for k, v in int4_batches[0][1].items()}
    fid = {}
    for name, out_q in (
        ("int8", dequant_score(params, b8)),
        ("int4", dequant4_score(params, b4)),
    ):
        sq = np.asarray(out_q["score"], np.float64)
        flips = int((l32 != np.asarray(out_q["label"])).sum())
        fid[name] = (np.abs(sq - s32).mean(), np.abs(sq - s32).max(), flips)

    for mode, vals in results.items():
        print(f"{mode:10s}: " + " ".join(f"{v:7.1f}" for v in vals) + " q/s")
    print(f"quant_host: {quant_ms:7.1f} ms/batch (one-time, offline in prod)")
    for name, (dmean, dmax, flips) in fid.items():
        print(
            f"fidelity {name}: |dconf| mean {dmean:.5f} "
            f"max {dmax:.5f}, label flips {flips}/{BATCH}"
        )


if __name__ == "__main__":
    main()
