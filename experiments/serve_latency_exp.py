"""Serving-latency anatomy: what one scoring wave costs on the real
chip, by wave size (VERDICT r4 #4 — the production story was
throughput-only).

cli/serve.py's per-record latency decomposes as

    latency ~= wave-fill wait (bounded by --wave_timeout when the queue
               is shallow) + wave cost(n)

so the measured quantity here is wave cost(n): the full serve wave path
— GQADataset.from_rows -> encode -> device_prefetch feed -> scorer
dispatch -> fetch — timed per wave size on ONE warm runner (the CLI
builds the same runner once per process; its one-time init/compile wall
is reported separately).  Full-size LXMERT, bf16, batch 128: a 1-record
wave pads to the full 128-row batch, so its cost is the latency floor a
lone record pays after its timeout.

Run on the v5e over the tunnel; numbers land in docs/kernels.md
"Serving latency".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

# RGQA_SERVE_BATCH overrides the serve batch (e.g. 8 for a latency-tier
# service whose padded 1-record wave feeds 16x fewer bytes).
WAVE_SIZES = (1, 16, 128, 512)
REPS = 3


def main():
    import tempfile

    from rgqa_tpu.config import parse_cli
    from rgqa_tpu.data import GQADataset
    from rgqa_tpu.data.synthetic import SyntheticSpec, make_synthetic_gqa
    from rgqa_tpu.runner import GQARunner

    root = os.path.join(tempfile.gettempdir(), "gqa_serve_exp")
    spec = SyntheticSpec(n_images=64, n_train=128, n_valid=64,
                         n_testdev=768)
    # Cache keyed on the spec: a changed spec must regenerate, not
    # silently reuse stale data.
    marker = os.path.join(root, "spec.json")
    spec_key = repr(vars(spec))
    if not (
        os.path.exists(marker) and open(marker).read() == spec_key
    ):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        make_synthetic_gqa(root, spec)
        with open(marker, "w") as f:
            f.write(spec_key)

    cfg, _ = parse_cli([
        "--synthetic", "--data_root", root, "--test", "testdev",
        "--batchSize", os.environ.get("RGQA_SERVE_BATCH", "128"), "--output", os.path.join(root, "snap"),
    ])
    t0 = time.perf_counter()
    runner = GQARunner(cfg, init_train=False)
    scorer = runner.make_scorer("msp")
    vocab_ds = runner.dataset
    init_wall = time.perf_counter() - t0

    import json

    with open(os.path.join(root, "testdev.json")) as f:
        rows_all = json.load(f)
    rows_all = [
        {"question_id": r["question_id"], "sent": r["sent"],
         "img_id": r["img_id"], "label": {}}
        for r in rows_all
    ]

    def wave(rows):
        """The exact serve-loop wave path (cli/serve.py main loop)."""
        ds = GQADataset.from_rows(
            rows, ans2label=vocab_ds.ans2label,
            label2ans=vocab_ds.label2ans, name="serve",
        )
        encoded = runner._encode(ds)
        return runner.score_split(encoded, scorer=scorer)

    bs = int(os.environ.get("RGQA_SERVE_BATCH", "128"))
    t0 = time.perf_counter()
    wave(rows_all[:bs])  # first wave: pays the scoring-program compile
    first_wave_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    wave(rows_all[:1])  # 1-record wave warms nothing new (same padded shape)
    print(
        f"init_wall {init_wall:6.1f}s (runner construction: model init "
        f"compile + param materialization — batch-independent, "
        f"tunnel-load dependent); first_wave {first_wave_wall:6.1f}s "
        f"(scoring-program compile at batch {bs}); warm probe "
        f"+{time.perf_counter()-t0:.1f}s"
    )

    for n in WAVE_SIZES:
        times = []
        for rep in range(REPS):
            start = rep * n
            rows = rows_all[start : start + n]
            if len(rows) < n:
                rows = (rows_all * ((n // len(rows_all)) + 1))[:n]
            t0 = time.perf_counter()
            out = wave(rows)
            times.append(time.perf_counter() - t0)
            assert len(out) == len({r["question_id"] for r in rows})
        ms = [t * 1e3 for t in times]
        print(
            f"wave n={n:4d}: " + " ".join(f"{m:8.1f}" for m in ms)
            + f" ms  (min {min(ms):8.1f};"
            + f" {n / (min(times)):7.1f} q/s at best)"
        )


if __name__ == "__main__":
    main()
