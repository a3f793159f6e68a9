"""CLI entry points, in-process (train -> evaluate -> metrics round-trip)."""

import json
import os

import numpy as np
import pytest


FLAGS = (
    "--synthetic --fp32 --llayers 1 --xlayers 1 --rlayers 1 "
    "--hidden_size 32 --num_heads 4 --batchSize 16"
).split()


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("cli_data"))
    snap = str(tmp_path_factory.mktemp("cli_snap"))
    return data, snap


class TestCliPipeline:
    def test_train_then_evaluate_then_metrics(self, roots):
        data, snap = roots
        from rgqa_tpu.cli import evaluate, train

        train.main(
            FLAGS + ["--data_root", data, "--epochs", "2", "--lr", "3e-3",
                     "--output", snap]
        )
        assert os.path.isdir(os.path.join(snap, "LAST"))

        results = evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap]
        )
        assert "auaf" in results["testdev"]
        pred_path = os.path.join(snap, "testdev_predict.json")
        assert os.path.exists(pred_path)

        # Round-trip the dumped predictions through the metrics CLI module.
        from rgqa_tpu.metrics.compute_accfpr import main as metrics_main

        metrics = metrics_main([os.path.join(data, "testdev.json"), pred_path])
        assert abs(metrics["full_acc"] - results["testdev"]["full_acc"]) < 0.05

    def test_energy_scorer_cli(self, roots):
        data, snap = roots
        from rgqa_tpu.cli import evaluate

        results = evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "energy", "--output", snap]
        )
        assert np.isfinite(results["testdev"]["auaf"])

    def test_compute_param_cli_tiny(self):
        from rgqa_tpu.cli.compute_param import count_params

        assert count_params("caps") > 1e6

    def test_serve_cli_jsonl_stream(self, roots):
        """Serving CLI: JSONL stream in -> scored JSONL out, consistent
        with the batch evaluate path over the same questions."""
        import io

        data, snap = roots
        from rgqa_tpu.cli import serve

        with open(os.path.join(data, "testdev.json")) as f:
            questions = json.load(f)[:10]
        lines = [
            json.dumps(
                {"question_id": q["question_id"], "sent": q["sent"],
                 "img_id": q["img_id"]}
            )
            for q in questions
        ]
        # Malformed JSON, a non-object line, a field-less record, and an
        # unknown-image record: all reported inline, none fatal.
        lines.insert(2, "this is not json")
        lines.insert(3, "42")
        lines.insert(5, json.dumps({"sent": "no id"}))
        lines.insert(7, json.dumps(
            {"question_id": "qx", "sent": "?", "img_id": "missing_img"}
        ))
        out = io.StringIO()
        served = serve.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap,
                     "--eval_chunk", "2"],
            stdin=io.StringIO("\n".join(lines) + "\n"),
            stdout=out,
        )
        assert served == len(questions)
        records = [json.loads(l) for l in out.getvalue().splitlines()]
        errors = [r for r in records if "error" in r]
        scored = [r for r in records if "questionId" in r and "error" not in r]
        assert len(errors) == 4
        assert len(scored) == len(questions)
        assert {r["questionId"] for r in scored} == {
            q["question_id"] for q in questions
        }
        for r in scored:
            assert isinstance(r["prediction"], str)
            assert 0.0 <= r["confidence"] <= 1.0

        # Consistency with the batch evaluate path: same answers.
        from rgqa_tpu.cli import evaluate

        evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap]
        )
        with open(os.path.join(snap, "testdev_predict.json")) as f:
            batch_preds = {r["questionId"]: r["prediction"]
                           for r in json.load(f)}
        for r in scored:
            assert batch_preds[r["questionId"]] == r["prediction"]

    def test_clip_scorer_cli_with_stub(self, roots, monkeypatch):
        """--scorer clip end-to-end with an injected similarity stub
        (zero-egress: no CLIP weights; reference gqa_clip.py:76-110)."""
        data, snap = roots
        from rgqa_tpu.cli import evaluate
        from rgqa_tpu.scorers import clip as clip_mod

        calls = {}

        class StubScorer:
            def __init__(self, path):
                calls["path"] = path

            def scores(self, images, texts):
                assert len(images) == len(texts)
                # deterministic pseudo-similarity from question length
                return np.asarray([len(t) % 7 / 7.0 for t in texts])

        monkeypatch.setattr(clip_mod, "ClipScorer", StubScorer)
        results = evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "clip", "--clip_path", "/tmp/clip-ckpt",
                     "--output", snap]
        )
        assert calls["path"] == "/tmp/clip-ckpt"
        assert np.isfinite(results["testdev"]["auaf"])
        pred = os.path.join(snap, "testdev_predict.json")
        with open(pred) as f:
            rows = json.load(f)
        assert {"questionId", "prediction", "confidence"} == set(rows[0])

    def test_plot_attention_cli(self, tmp_path):
        """dump_attention npz -> heatmap PNGs (the reference's
        gqa_vis_att.ipynb surface as a CLI)."""
        pytest.importorskip("matplotlib")
        from rgqa_tpu.cli.plot_attention import main as plot_main

        rng = np.random.default_rng(0)
        d = tmp_path / "att"
        d.mkdir()
        for qid in ("q1", "q2"):
            np.savez(
                d / f"{qid}.npz",
                lang2visn_0=rng.random((4, 5, 9), dtype=np.float32),
                visn2lang_0=rng.random((4, 9, 5), dtype=np.float32),
            )
        written = plot_main([str(d), "--mean-heads"])
        assert len(written) == 2
        for png in written:
            assert os.path.getsize(png) > 0
        # Per-head single-layer variant.
        written = plot_main(
            [str(d), "--qids", "q1", "--direction", "lang2visn",
             "--head", "2", "--out", str(tmp_path / "out2")]
        )
        assert len(written) == 1 and os.path.exists(written[0])

    def test_run_config_snapshot(self, roots):
        """Every runner writes the resolved config + git sha into the
        output dir (reference snapshots src/, run/gqa_conf_finetune.bash:6-8)."""
        data, snap = roots
        path = os.path.join(snap, "run_config.json")
        assert os.path.exists(path)
        with open(path) as f:
            payload = json.load(f)
        assert payload["model"]["backbone"] == "lxmert"
        assert payload["train"]["batch_size"] == 16
        assert "git_sha" in payload

    def test_ensemble_distill_cli(self, roots):
        """--teacher_path a,b triggers the ensemble-teacher pseudo-label
        pipeline (reference gqa_ensemble_distill.py)."""
        data, snap = roots
        from rgqa_tpu.cli import distill

        ckpt = os.path.join(snap, "LAST")
        rows = distill.main(
            FLAGS + ["--data_root", data, "--train", "train",
                     "--load", ckpt,
                     "--teacher_path", f"{ckpt},{ckpt}",
                     "--output", snap, "--output_name", "ens_distill"]
        )
        assert rows, "no pseudo-labeled rows"
        r = rows[0]
        assert set(r) == {"img_id", "question_id", "sent", "label"}
        (ans, score), = r["label"].items()
        # product of two identical sigmoid vectors: score in (0, 1)
        assert 0.0 < score < 1.0
        out_path = os.path.join(data, "ens_distill.json")
        assert os.path.exists(out_path)


class TestServeLatency:
    def test_waves_shallow_queue_timeout(self):
        """A pending record must not wait for a full wave: with the
        input idle past --wave_timeout, a partial wave dispatches."""
        import time

        from rgqa_tpu.cli.serve import _waves

        def slow_lines():
            yield "a\n"
            yield "b\n"
            time.sleep(0.5)  # input goes idle -> first wave times out
            yield "c\n"

        t0 = time.perf_counter()
        waves = []
        for w in _waves(slow_lines(), wave_size=100, timeout=0.05):
            waves.append(([line for line, _ in w], time.perf_counter() - t0))
        assert [w[0] for w in waves] == [["a", "b"], ["c"]]
        # first wave left well before the 0.5 s input gap ended
        assert waves[0][1] < 0.4
        # timeout=0: strict full waves -> everything in one final flush
        full = list(_waves(iter(["a\n", "b\n", "c\n"]), 100, timeout=0))
        assert [line for line, _ in full[0]] == ["a", "b", "c"]

    def test_serve_stats_shape(self, roots, capsys):
        """--serve_stats: one JSON line on stderr with the latency
        percentiles (the serving-latency contract)."""
        import io

        data, snap = roots
        from rgqa_tpu.cli import serve

        with open(os.path.join(data, "testdev.json")) as f:
            questions = json.load(f)[:5]
        lines = "\n".join(
            json.dumps({"question_id": q["question_id"], "sent": q["sent"],
                        "img_id": q["img_id"]})
            for q in questions
        )
        out = io.StringIO()
        served = serve.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap,
                     "--serve_stats", "--wave_timeout", "0.02"],
            stdin=io.StringIO(lines + "\n"),
            stdout=out,
        )
        assert served == len(questions)
        err_lines = [
            l for l in capsys.readouterr().err.splitlines() if l.strip()
        ]
        stats = json.loads(err_lines[-1])["latency"]
        assert stats["count"] == len(questions)
        for k in ("p50_ms", "p95_ms", "p99_ms", "max_ms"):
            assert stats[k] >= 0.0
        assert stats["p50_ms"] <= stats["p95_ms"] <= stats["max_ms"]

    def test_waves_input_error_propagates(self):
        """An input-iteration failure must surface on the consumer, after
        serving whatever arrived before it."""
        import time

        from rgqa_tpu.cli.serve import _waves

        def bad_lines():
            yield "a\n"
            raise IOError("stdin broke")

        got = []
        with pytest.raises(IOError, match="stdin broke"):
            for w in _waves(bad_lines(), wave_size=100, timeout=0):
                got.append([line for line, _ in w])
        assert got == [["a"]]

    def test_serve_bf16_casts_resident_params(self, roots, monkeypatch):
        """Without --fp32, serving casts the f32 master params to bf16
        (half the upload + HBM weight traffic; bench.py's convention)."""
        import io

        import jax.numpy as jnp

        from rgqa_tpu.cli import serve

        captured = {}
        real_runner = serve.GQARunner

        def capture(cfg, **kw):
            r = real_runner(cfg, **kw)
            captured["runner"] = r
            return r

        monkeypatch.setattr(serve, "GQARunner", capture)
        data, snap = roots
        if not os.path.isdir(os.path.join(snap, "LAST")):
            # Self-sufficient when selected alone (the pipeline test
            # normally populates the module-scoped snap).
            from rgqa_tpu.cli import train

            train.main(
                FLAGS + ["--data_root", data, "--epochs", "1",
                         "--lr", "3e-3", "--output", snap]
            )
        flags = [
            f for f in FLAGS if f != "--fp32"
        ]  # bf16 default ON
        out = io.StringIO()
        served = serve.main(
            flags + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap],
            stdin=io.StringIO(json.dumps(
                {"question_id": "q1", "sent": "is there a car?",
                 "img_id": json.load(open(os.path.join(data, "testdev.json")))[0]["img_id"]}
            ) + "\n"),
            stdout=out,
        )
        assert served == 1
        import jax

        leaves = jax.tree_util.tree_leaves(captured["runner"].params)
        assert all(
            l.dtype in (jnp.bfloat16, jnp.int32, jnp.int8) for l in leaves
        ), {l.dtype for l in leaves}
