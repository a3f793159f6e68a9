"""Pixel-wire experiment: the image-backbone production path measured
end to end (VERDICT r4 #1 — ViLT/CLIP serving had models + transforms
but no production number at all).

Per 384px question ViLT ships 384*384*3 pixels — 1.77 MB f32, 884 KB
bf16, 442 KB uint8 — across the ~50-90 MB/s axon tunnel; CLIP at 224px
ships 588/294/147 KB.  That is 6-12x the RoI-feats payload, so image
serving is the MOST wire-bound surface in the framework, and the feed
dtype is the throughput.  The uint8 wire (--pixel_wire u8, the default)
ships the source lattice itself and normalizes in-jit: zero
quantization error (ops/pixels.py; <= 1-ulp jit reassociation).

Measures, interleaved in one process (tunnel bandwidth varies):

  vilt_prod_f32   device_prefetch f32 pixels + pipelined MSP  [legacy]
  vilt_prod_bf16  feed_bf16 pixel cast on host
  vilt_prod_u8    uint8 + rect + patch mask on the wire, normalize
                  fused into the scoring jit (shipped default)
  clip_prod_f32 / clip_prod_u8   same A/B through ClipModel.cosine
  feed_*          pure device_put bounds for each payload
  chip bound      chained-scan model throughput (no feed)

plus the HOST stages (platform-independent, one core):

  host_decode     JPEG decode + bicubic resize -> uint8 (what every
                  mode pays without a PixelPack)
  host_normalize  u8 -> f32 inception normalize (what the u8 wire
                  removes from the host)
  pack_read       PixelPack memmap row gather (what serving pays
                  INSTEAD of host_decode after prepare_data
                  --pack_pixels)

and a fidelity probe: MSP score drift of the u8 feed vs the f32 feed
(expected ~1e-7 — jit reassociation only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
N_BATCHES = 6
CLIP_BATCH = 128


def _host_stage_rates(tmp_dir: str):
    """JPEG decode / normalize / pack-read rates on this host core."""
    from PIL import Image

    from rgqa_tpu.data.images import (
        GQAImageSource, PixelPack, pack_pixels, pixelbert_normalize,
    )

    img_root = os.path.join(tmp_dir, "imgs")
    os.makedirs(img_root, exist_ok=True)
    rng = np.random.default_rng(0)
    n = 48
    for i in range(n):
        # GQA-typical 500x375 source JPEGs.
        arr = rng.integers(0, 255, (375, 500, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_root, f"g{i}.jpg"))
    src = GQAImageSource(img_root, size=384)

    t0 = time.perf_counter()
    pairs = [src.load_u8(f"g{i}") for i in range(n)]
    decode_rate = n / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for u8, rect in pairs:
        pixelbert_normalize(u8, rect)
    norm_rate = n / (time.perf_counter() - t0)

    pack = pack_pixels(img_root, os.path.join(tmp_dir, "pack"), size=384)
    ids = [f"g{i}" for i in range(n)]
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        for g in ids:
            u8, rect = pack.load_u8(g)
            np.ascontiguousarray(u8)  # force the memmap read
    pack_rate = n * reps / (time.perf_counter() - t0)
    return decode_rate, norm_rate, pack_rate


def main():
    import tempfile

    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.data.batching import device_prefetch, pipelined_map
    from rgqa_tpu.data.images import rect_patch_mask
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.scorers.core import make_msp_scorer

    with tempfile.TemporaryDirectory() as td:
        decode_rate, norm_rate, pack_rate = _host_stage_rates(td)
    print(
        f"host_decode   {decode_rate:7.1f} img/s   "
        f"host_normalize {norm_rate:7.1f} img/s   "
        f"pack_read {pack_rate:8.1f} img/s"
    )

    # ------------------------------------------------------------- ViLT
    cfg = ModelConfig(backbone="vilt")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=BATCH, seed=0)
    s = cfg.vilt_image_size
    rng = np.random.default_rng(1)
    # Realistic pad-mode content: random real region, zero pad bands.
    u8 = rng.integers(0, 256, (BATCH, s, s, 3), dtype=np.uint8)
    h = int(s * 0.75)
    top = (s - h) // 2
    u8[:, :top] = 0
    u8[:, top + h:] = 0
    rect = np.tile(
        np.asarray([top, 0, h, s], np.int32), (BATCH, 1)
    )
    from rgqa_tpu.data.images import pixelbert_normalize

    host["pixels"] = np.stack(
        [pixelbert_normalize(a, r) for a, r in zip(u8, rect)]
    )
    pmask = rect_patch_mask(rect, s, cfg.vilt_patch_size)

    batch = {k: jnp.asarray(v) for k, v in host.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2], batch["input_mask"][:2], batch["pixels"][:2],
    )["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    score_fn = make_msp_scorer(forward)

    f32_batches, u8_batches = [], []
    for i in range(N_BATCHES):
        hb = dict(host)
        hb["input_ids"] = host["input_ids"] + np.int32(i % 2)
        f32_batches.append(([f"b{i}"], hb, BATCH))
        hb8 = {k: v for k, v in hb.items() if k != "pixels"}
        hb8["pixels_u8"] = u8
        hb8["pixel_rect"] = rect
        hb8["pixel_mask"] = pmask
        u8_batches.append(([f"b{i}"], hb8, BATCH))

    keys = ("label", "score")

    def select(b):
        out = score_fn(params, b)
        return {k: out[k] for k in keys}

    def run(batches, feed_bf16=False):
        count = 0
        for _, out, real in pipelined_map(
            select, device_prefetch(iter(batches), None, feed_bf16=feed_bf16)
        ):
            count += len(out["label"])
        return count

    modes = [
        ("vilt_prod_f32", lambda: run(f32_batches)),
        ("vilt_prod_bf16", lambda: run(f32_batches, feed_bf16=True)),
        ("vilt_prod_u8", lambda: run(u8_batches)),
    ]

    # ------------------------------------------------------------- CLIP
    from rgqa_tpu.models.clip import ClipConfig, ClipModel
    from rgqa_tpu.ops.pixels import clip_normalize_jnp

    ccfg = ClipConfig()
    cmodel = ClipModel(ccfg, dtype=jnp.bfloat16)
    cs = ccfg.image_size
    cu8 = rng.integers(0, 256, (CLIP_BATCH, cs, cs, 3), dtype=np.uint8)
    cf32 = np.asarray(clip_normalize_jnp(cu8))
    ids = rng.integers(
        0, ccfg.vocab_size - 2, (CLIP_BATCH, ccfg.max_text_len)
    ).astype(np.int32)
    cmask = np.ones((CLIP_BATCH, ccfg.max_text_len), np.int32)
    cparams = cmodel.init(jax.random.PRNGKey(0), ids[:2], cmask[:2], cf32[:2])[
        "params"
    ]
    cparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        cparams,
    )

    @jax.jit
    def clip_cos(p, i, m, px):
        if px.dtype == jnp.uint8:
            px = clip_normalize_jnp(px)
        return cmodel.apply({"params": p}, i, m, px, method=ClipModel.cosine)

    def run_clip(px):
        payloads = [
            (ids + np.int32(i % 2), cmask, px) for i in range(N_BATCHES)
        ]
        count = 0
        pending = []
        for pl in payloads:
            d = jax.tree_util.tree_map(jax.device_put, pl)
            pending.append(clip_cos(cparams, *d))
            if len(pending) > 2:
                count += len(np.asarray(pending.pop(0)))
        while pending:
            count += len(np.asarray(pending.pop(0)))
        return count

    modes += [
        ("clip_prod_f32", lambda: run_clip(cf32)),
        ("clip_prod_u8", lambda: run_clip(cu8)),
    ]

    results = {}
    for mode, fn in modes:
        fn()  # compile + warm
    # Interleave all modes round-robin so tunnel drift hits each equally.
    for rep in range(2):
        for mode, fn in modes:
            t0 = time.perf_counter()
            count = fn()
            qps = count / (time.perf_counter() - t0)
            results.setdefault(mode, []).append(qps)

    # Pure-feed bounds.
    import ml_dtypes

    for mode, payload in (
        ("vilt_feed_f32", {"pixels": host["pixels"]}),
        ("vilt_feed_bf16", {"pixels": host["pixels"].astype(ml_dtypes.bfloat16)}),
        ("vilt_feed_u8", {"pixels_u8": u8, "pixel_rect": rect,
                          "pixel_mask": pmask}),
        ("clip_feed_f32", {"pixels": cf32}),
        ("clip_feed_u8", {"pixels_u8": cu8}),
    ):
        n_q = CLIP_BATCH if mode.startswith("clip") else BATCH
        d = jax.device_put(payload)
        np.asarray(jax.tree_util.tree_leaves(d)[0].ravel()[0])  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            d = jax.device_put(payload)
            np.asarray(jax.tree_util.tree_leaves(d)[0].ravel()[0])
        results[mode] = [n_q * 3 / (time.perf_counter() - t0)]

    # Chip bound: chained scan, no feed.
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def infer_n(params, batch, carry, n):
        def body(carry, _):
            b = dict(batch)
            b["input_ids"] = batch["input_ids"] + (carry[:, None] % 2).astype(
                jnp.int32
            )
            out = forward(params, b, deterministic=True)
            probs = jax.nn.sigmoid(out["logits"].astype(jnp.float32))
            return jnp.argmax(probs, axis=-1).astype(jnp.int32), None

        return jax.lax.scan(body, carry, None, length=n)[0]

    carry = jnp.zeros((BATCH,), jnp.int32)
    np.asarray(infer_n(params, batch, carry, 10))
    t0 = time.perf_counter()
    np.asarray(infer_n(params, batch, carry, 10))
    results["vilt_chip_bound"] = [BATCH * 10 / (time.perf_counter() - t0)]

    # Fidelity: u8 feed vs f32 feed on one batch.
    out32 = score_fn(params, batch)
    b8 = {k: jnp.asarray(v) for k, v in u8_batches[0][1].items()}
    out8 = score_fn(params, b8)
    ds = np.abs(
        np.asarray(out8["score"], np.float64)
        - np.asarray(out32["score"], np.float64)
    )
    flips = int(
        (np.asarray(out8["label"]) != np.asarray(out32["label"])).sum()
    )

    for mode, vals in results.items():
        print(f"{mode:15s}: " + " ".join(f"{v:8.1f}" for v in vals) + " q/s")
    print(
        f"fidelity u8: |dscore| mean {ds.mean():.2e} max {ds.max():.2e}, "
        f"label flips {flips}/{BATCH}"
    )


if __name__ == "__main__":
    main()
