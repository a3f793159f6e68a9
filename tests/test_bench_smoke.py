"""Driver-contract smoke tests for the committed benchmark scripts.

The driver runs ``bench.py`` cold at the end of every round and records
its single JSON line; a bit-rotted bench loses the round's artifact.
These run each bench's full code path at RGQA_BENCH_TINY shapes on CPU
and validate the output contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, extra_env=None):
    env = dict(
        os.environ, RGQA_BENCH_TINY="1", RGQA_BENCH_BATCH="8",
        RGQA_BENCH_ITERS="2", **(extra_env or {}),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_contract():
    out = _run("bench.py")
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}
    assert out["unit"] == "questions/sec/chip"
    assert out["value"] > 0


def test_bench_scorers_contract():
    out = _run("bench_scorers.py", {"RGQA_BENCH_SCORERS": "msp,energy"})
    assert out["unit"] == "questions/sec/chip"
    assert out["msp"] > 0 and out["energy"] > 0


def test_bench_scorers_production_mode():
    out = _run(
        "bench_scorers.py",
        {
            "RGQA_BENCH_SCORERS": "msp",
            "RGQA_BENCH_PRODUCTION": "1",
            "RGQA_BENCH_PROD_BATCHES": "2",
        },
    )
    assert out["msp_prod"] > 0 and out["msp_sync"] > 0
    assert out["msp_prod_int8"] > 0  # --feed_int8 transport mode
    assert out["feed_bound"] > 0


def test_bench_train_contract():
    out = _run("bench_train.py")
    assert out["unit"] == "examples/sec/chip"
    assert out["examples_per_sec"] > 0 and out["step_ms"] > 0


def test_bench_pretrain_mode():
    out = _run("bench_train.py", {"RGQA_BENCH_PRETRAIN": "1"})
    assert out["unit"] == "examples/sec/chip"
    assert out["mode"] == "pretrain"
    assert out["examples_per_sec"] > 0 and out["step_ms"] > 0


def test_bench_pretrain_chunk_mode():
    out = _run(
        "bench_train.py",
        {"RGQA_BENCH_PRETRAIN": "1", "RGQA_BENCH_CHUNK": "2"},
    )
    assert out["mode"] == "pretrain_dispatch_chunk2"
    assert out["examples_per_sec"] > 0


def test_bench_clip_mode():
    out = _run("bench_scorers.py", {"RGQA_BENCH_CLIP": "1"})
    assert out["mode"] == "clip_cosine"
    assert out["unit"] == "pairs/sec/chip"
    assert out["pairs_per_sec"] > 0


def test_bench_vilt_backbone():
    out = _run("bench.py", {"RGQA_BENCH_BACKBONE": "vilt"})
    assert out["metric"] == "vilt_gqa_inference_throughput"
    assert out["value"] > 0
