"""VQA task end-to-end tests (reference ``src/tasks/vqa.py`` /
``vqa_data.py``): synthetic VQA-format fixtures, train -> evaluate ->
submission dump, soft-score evaluator semantics, CLI dispatch."""

import json
import os

import numpy as np
import pytest

from rgqa_tpu.config import parse_cli
from rgqa_tpu.data.dataset import GQADataset
from rgqa_tpu.data.synthetic import SyntheticSpec, make_synthetic_vqa
from rgqa_tpu.vqa_task import VQAEvaluator, VQARunner

SPEC = SyntheticSpec(
    n_images=24, n_train=96, n_valid=32, n_testdev=16, seed=3
)

SMOKE_FLAGS = [
    "--data_root", "",  # filled per-test
    "--fp32", "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
    "--hidden_size", "32", "--num_heads", "4", "--batchSize", "16",
]


@pytest.fixture(scope="module")
def vqa_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vqa"))
    make_synthetic_vqa(root, SPEC)
    return root


def _cfg(root, extra):
    flags = list(SMOKE_FLAGS)
    flags[1] = root
    cfg, _ = parse_cli(flags + extra)
    return cfg


class TestVQAData:
    def test_synthetic_contract(self, vqa_root):
        with open(os.path.join(vqa_root, "train.json")) as f:
            rows = json.load(f)
        r = rows[0]
        # Reference row schema (vqa_data.py:34-45): int ids, soft labels.
        assert isinstance(r["question_id"], int)
        assert set(r) >= {
            "answer_type", "img_id", "label", "question_id",
            "question_type", "sent",
        }
        assert all(0.0 < s <= 1.0 for s in r["label"].values())
        with open(os.path.join(vqa_root, "test.json")) as f:
            test_rows = json.load(f)
        assert all("label" not in r for r in test_rows)

    def test_evaluator_soft_score_and_dump(self, vqa_root, tmp_path):
        ds = GQADataset(vqa_root, "minival", add_uq=False)
        ev = VQAEvaluator(ds)
        # Perfect predictions score the label's soft value, not 1.0.
        quesid2ans = {}
        expect = 0.0
        for d in ds.data[:10]:
            ans, score = max(d["label"].items(), key=lambda kv: kv[1])
            quesid2ans[d["question_id"]] = ans
            expect += score
        got = ev.evaluate(quesid2ans)
        np.testing.assert_allclose(got, expect / 10, rtol=1e-6)

        # Submission dump: [{"question_id": int, "answer": str}],
        # indent=4 + sort_keys (vqa_data.py:166-188).
        path = str(tmp_path / "predict.json")
        ev.dump_result(quesid2ans, path)
        with open(path) as f:
            text = f.read()
        dumped = json.loads(text)
        assert {"question_id", "answer"} == set(dumped[0])
        assert isinstance(dumped[0]["question_id"], int)
        assert '    "answer"' in text  # indent=4, keys sorted


class TestVQARunner:
    @pytest.fixture(scope="class")
    def trained(self, vqa_root, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("vqa_out"))
        cfg = _cfg(vqa_root, [
            "--train", "train", "--valid", "minival",
            "--epochs", "4", "--lr", "3e-3", "--output", out,
        ])
        runner = VQARunner(cfg)
        history = runner.train()
        return runner, history, out

    def test_train_learns(self, trained):
        runner, history, out = trained
        assert history["loss"][-1] < history["loss"][0]
        # Learnable synthetic signal: valid score should clear chance.
        assert history["valid"][-1] > 0.1
        assert os.path.exists(os.path.join(out, "BEST"))
        assert os.path.exists(os.path.join(out, "LAST"))
        assert os.path.exists(os.path.join(out, "log.log"))

    def test_train_chunk_trajectory_identical(self, vqa_root, trained,
                                              tmp_path_factory):
        # --train_chunk must not change the VQA trajectory (same key
        # sequence scanned K steps per dispatch; odd batch count also
        # exercises the per-step tail).
        runner, history, _ = trained
        out = str(tmp_path_factory.mktemp("vqa_chunked"))
        cfg = _cfg(vqa_root, [
            "--train", "train", "--valid", "minival",
            "--epochs", "4", "--lr", "3e-3", "--output", out,
            "--train_chunk", "2",
        ])
        chunked = VQARunner(cfg)
        h2 = chunked.train()
        np.testing.assert_allclose(h2["loss"], history["loss"], rtol=1e-5)
        np.testing.assert_allclose(h2["train"], history["train"], rtol=1e-6)
        assert os.path.exists(os.path.join(out, "log.log"))

    def test_oracle_bounds_valid(self, trained):
        runner, history, _ = trained
        oracle = runner.oracle_score("minival")
        assert oracle >= history["valid"][-1] - 1e-6
        assert oracle > 0.8  # soft labels are near-singleton

    def test_predict_dump_roundtrip(self, trained, tmp_path):
        runner, _, _ = trained
        dump = str(tmp_path / "minival_predict.json")
        quesid2ans = runner.predict("minival", dump=dump)
        assert len(quesid2ans) == SPEC.n_valid
        with open(dump) as f:
            rows = json.load(f)
        assert len(rows) == SPEC.n_valid
        assert all(isinstance(r["question_id"], int) for r in rows)

    def test_unlabeled_test_split(self, trained):
        runner, _, _ = trained
        preds = runner.predict("test")
        assert len(preds) == SPEC.n_testdev

    def test_feed_int8_predict(self, trained, monkeypatch):
        # --feed_int8 applies to the VQA eval surface exactly like the
        # GQA one: int8 feats transport + in-jit dequant, exempted when
        # training validation sets _feed_exact.
        import dataclasses

        import rgqa_tpu.vqa_task as vt

        runner, _, _ = trained
        base = runner.predict("minival")
        calls = []
        orig = vt.wrap_dequant
        monkeypatch.setattr(
            vt, "wrap_dequant", lambda fn: (calls.append(1), orig(fn))[1]
        )
        old_cfg = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                data=dataclasses.replace(old_cfg.data, feed_int8=True),
            )
            quant = runner.predict("minival")
            # Training validation (_feed_exact) bypasses the quantized
            # transport entirely.
            runner._feed_exact = True
            exact = runner.predict("minival")
        finally:
            runner._feed_exact = False
            runner.cfg = old_cfg
        assert len(calls) == 1  # the quantized pass really wrapped
        assert exact == base
        flips = sum(quant[k] != v for k, v in base.items())
        assert flips <= max(1, len(base) // 20), f"{flips}/{len(base)}"

    def test_checkpoint_reload(self, trained, vqa_root, tmp_path):
        runner, history, out = trained
        cfg = _cfg(vqa_root, [
            "--test", "minival", "--output", str(tmp_path),
        ])
        fresh = VQARunner(cfg, init_train=False)
        fresh.load(os.path.join(out, "BEST"))
        score = fresh.evaluate("minival")
        assert score == pytest.approx(max(history["valid"]), abs=1e-6)


class TestVQACLI:
    def test_cli_eval_dispatch(self, vqa_root, tmp_path, capsys):
        from rgqa_tpu.cli.vqa import main

        out = str(tmp_path / "cli_out")
        main([
            "--data_root", vqa_root, "--fp32", "--llayers", "1",
            "--xlayers", "1", "--rlayers", "1", "--hidden_size", "32",
            "--num_heads", "4", "--batchSize", "16",
            "--test", "minival", "--output", out,
        ])
        assert os.path.exists(os.path.join(out, "minival_predict.json"))
        result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "accuracy" in result
