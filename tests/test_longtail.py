"""Long-tail components: verifier, caption Q-C, top-k, attention viz,
param counter, CLIP weights."""

import os

import numpy as np
import pytest

from rgqa_tpu.config import (
    DataConfig,
    EncoderConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from rgqa_tpu.data import GQADataset, SyntheticSpec, make_synthetic_gqa
from rgqa_tpu.runner import GQARunner
from rgqa_tpu.verifier import VerifierTrainer, fill_statement, question_to_statement

ENC = EncoderConfig(
    hidden_size=32, num_heads=4, intermediate_size=64,
    l_layers=1, x_layers=1, r_layers=1, num_objects=36, visual_feat_dim=2048,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_lt"))
    make_synthetic_gqa(
        root, SyntheticSpec(n_images=16, n_train=64, n_valid=16, n_testdev=32)
    )
    return root


def _runner(root, out, **kw):
    train_kw = dict(batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3), use_bf16=False)
    train_kw.update(kw.pop("train", {}))
    cfg = RunConfig(
        model=ModelConfig(
            backbone=kw.pop("backbone", "lxmert"), encoder=ENC, max_text_len=12
        ),
        train=TrainConfig(**train_kw),
        data=DataConfig(data_root=root, synthetic=True, **kw.pop("data", {})),
        output=out,
        **kw,
    )
    return GQARunner(cfg)


class TestQuestionToStatement:
    @pytest.mark.parametrize(
        "q,expected",
        [
            ("What is on the white wall?", "**blank** is on the white wall"),
            ("What color is the dog?", "the color of the dog is **blank**"),
            ("How many apples are on the table?",
             "there are **blank** apples are on the table"),
            ("Where is the cat?", "the cat is in **blank**"),
            ("Is there a dog in the picture?",
             "there a dog in the picture , **blank**"),
        ],
    )
    def test_templates(self, q, expected):
        assert question_to_statement(q) == expected

    def test_fill(self):
        t = question_to_statement("What is on the wall?")
        assert fill_statement(t, "pipe") == "pipe is on the wall"
        assert "**blank**" not in fill_statement(t, "")


class TestVerifier:
    def test_train_and_eval(self, synth_root, tmp_path):
        answerer = _runner(synth_root, str(tmp_path / "ans"))
        verifier = _runner(
            synth_root, str(tmp_path / "ver"),
            train={"strategy": "separate"},
        )
        vt = VerifierTrainer(verifier, answerer, topk=3)
        ds = GQADataset(synth_root, "train", add_uq=True)
        losses = vt.train(verifier._encode(ds), epochs=1, batch_size=8)
        assert losses and np.isfinite(losses[-1])
        test_ds = GQADataset(synth_root, "testdev", add_uq=True)
        res = vt.ood_evaluate(verifier._encode(test_ds))
        assert "auaf" in res


class TestCaptionStrategy:
    def test_caps_train_and_gated_eval(self, synth_root, tmp_path):
        matcher = _runner(
            synth_root, str(tmp_path / "caps"),
            backbone="caps",
            train={"strategy": "caption"},
            data={"train_splits": "train,train_uq"},
        )
        history = matcher.train()
        assert np.isfinite(history["loss"][-1])
        answerer = _runner(synth_root, str(tmp_path / "ans2"))
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        res = matcher.gated_ood_evaluate(matcher._encode(ds), answerer)
        assert "auaf" in res


class TestTopkAndOracle:
    def test_topk_above_top1(self, synth_root, tmp_path):
        runner = _runner(synth_root, str(tmp_path / "t"))
        ds = GQADataset(synth_root, "valid", add_uq=True)
        encoded = runner._encode(ds)
        top1 = runner.evaluate(encoded)
        top4 = runner.topk_predict(encoded, k=4)
        assert top4 >= top1
        assert runner.oracle_score(encoded) == pytest.approx(1.0)


class TestAttentionViz:
    def test_dump(self, synth_root, tmp_path):
        runner = _runner(synth_root, str(tmp_path / "v"))
        ds = GQADataset(synth_root, "valid", add_uq=True)
        out = str(tmp_path / "att")
        n = runner.dump_attention(runner._encode(ds), out, limit=3)
        assert n == 3
        files = sorted(os.listdir(out))
        assert len(files) == 3
        data = np.load(os.path.join(out, files[0]))
        assert "lang2visn_0" in data and "visn2lang_0" in data
        # (heads, q_len, kv_len) attention over 36 RoIs.
        assert data["lang2visn_0"].shape == (4, 12, 36)


class TestParamCounter:
    def test_counts(self):
        from rgqa_tpu.cli.compute_param import count_params

        n = count_params("lxmert")
        # Full-size LXMERT ~ 210M params.
        assert 150e6 < n < 300e6


class TestClipWeights:
    def test_loss_weights_mean_one(self):
        from rgqa_tpu.scorers.clip import clip_loss_weights

        w = clip_loss_weights(np.asarray([0.1, 0.5, 0.9, 0.2]))
        assert w.mean() == pytest.approx(1.0, rel=1e-5)
        assert w.argmax() == 2
