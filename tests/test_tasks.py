"""NLVR2 task, coverage/match runner evaluations."""

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

ENC = EncoderConfig(
    hidden_size=32, num_heads=4, intermediate_size=64,
    l_layers=1, x_layers=1, r_layers=1, num_objects=36, visual_feat_dim=2048,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_tasks"))
    make_synthetic_gqa(
        root, SyntheticSpec(n_images=16, n_train=64, n_valid=16, n_testdev=32)
    )
    return root


def _runner(root, out):
    return GQARunner(
        RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=12),
            train=TrainConfig(
                batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=root, synthetic=True),
            output=out,
        )
    )


class TestCoverageEval:
    def test_coverage_ood(self, synth_root, tmp_path):
        runner = _runner(synth_root, str(tmp_path / "c"))
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        res = runner.coverage_ood_evaluate(
            runner._encode(ds),
            os.path.join(synth_root, "objects_vocab.txt"),
        )
        assert "auaf" in res
        # Coverage scores are binary {0, 1} -> full_acc finite.
        assert np.isfinite(res["full_acc"])


class TestMatchEval:
    def test_lxrcap_match_ood(self, synth_root, tmp_path):
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.models.lxmert import LxmertPretraining
        from rgqa_tpu.models.zoo import example_batch

        runner = _runner(synth_root, str(tmp_path / "m"))
        pre = LxmertPretraining(ENC, dtype=jnp.float32)
        cfg = ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=12)
        b = example_batch(cfg, batch_size=2, seed=0)
        params = pre.init(
            jax.random.PRNGKey(0),
            jnp.asarray(b["input_ids"]), jnp.asarray(b["input_mask"]),
            jnp.asarray(b["segment_ids"]), jnp.asarray(b["feats"]),
            jnp.asarray(b["boxes"]),
        )["params"]
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        res = runner.match_ood_evaluate(runner._encode(ds), params)
        assert "auaf" in res


class TestNlvr2:
    def test_train_eval_dump(self, synth_root, tmp_path):
        from rgqa_tpu.nlvr2_task import Nlvr2Runner

        rng = np.random.default_rng(0)
        img_ids = [f"img{i:05d}" for i in range(16)]
        rows = []
        for i in range(48):
            a, b = rng.choice(16, 2, replace=False)
            rows.append(
                {
                    "uid": f"nlvr-{i:04d}",
                    "img0": img_ids[a],
                    "img1": img_ids[b],
                    "sent": "the left image contains a dog",
                    "label": int(rng.integers(2)),
                }
            )
        cfg = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=12),
            train=TrainConfig(
                batch_size=8, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=synth_root, synthetic=True),
            output=str(tmp_path / "nlvr"),
        )
        runner = Nlvr2Runner(cfg, {"train": rows[:32], "valid": rows[32:]})
        history = runner.train()
        assert np.isfinite(history["loss"][-1])
        acc = runner.evaluate("valid")
        assert 0.0 <= acc <= 1.0
        out_csv = str(tmp_path / "preds.csv")
        runner.dump_csv("valid", out_csv)
        with open(out_csv) as f:
            lines = f.read().strip().split("\n")
        assert all(l.split(",")[1] in ("True", "False") for l in lines)
