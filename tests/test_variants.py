"""Model/driver variants: branched-layer head, UQ-as-class mode, resume."""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.config import (
    DataConfig,
    EncoderConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from rgqa_tpu.data import GQADataset, SyntheticSpec, make_synthetic_gqa
from rgqa_tpu.models.zoo import build_model, example_batch
from rgqa_tpu.runner import GQARunner

ENC = EncoderConfig(
    hidden_size=32, num_heads=4, intermediate_size=64,
    l_layers=1, x_layers=2, r_layers=1, num_objects=36, visual_feat_dim=2048,
)
TINY = EncoderConfig(
    hidden_size=32, num_heads=4, intermediate_size=64, vocab_size=256,
    l_layers=1, x_layers=2, r_layers=1, num_objects=6, visual_feat_dim=16,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_var"))
    make_synthetic_gqa(
        root, SyntheticSpec(n_images=16, n_train=64, n_valid=16, n_testdev=32)
    )
    return root


class TestBranchedLayers:
    def test_layer_conf_output(self):
        cfg = ModelConfig(
            backbone="lxmert", encoder=TINY, num_answers=7,
            max_text_len=6, branched_layers=True, project_size=16,
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=3, seed=0)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"],
            jb["segment_ids"], jb["feats"], jb["boxes"],
        )["params"]
        out = forward(params, jb, deterministic=True)
        assert out["conf"].shape == (3,)
        # One projector per x-layer.
        assert "proj_0" in params and "proj_1" in params
        assert params["layer_conf"]["kernel"].shape == (32, 1)  # 2 * 16


class TestUqAsClass:
    def test_model_outputs_full_vocab(self, synth_root, tmp_path):
        cfg = RunConfig(
            model=ModelConfig(
                backbone="lxmert", encoder=ENC, max_text_len=12,
                uq_as_class=True,
            ),
            train=TrainConfig(
                batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(
                data_root=synth_root, train_splits="train,train_uq",
                synthetic=True,
            ),
            output=str(tmp_path / "uqc"),
        )
        runner = GQARunner(cfg)
        ds = GQADataset(synth_root, "train", add_uq=True)
        assert runner.model_cfg.num_answers == ds.num_answers  # incl UQ
        # Targets keep the UQ column.
        _, batch, _ = next(
            iter(__import__("rgqa_tpu.data", fromlist=["batch_iterator"]).batch_iterator(
                runner.train_set, 8
            ))
        )
        assert batch["target"].shape[1] == ds.num_answers
        history = runner.train()
        assert np.isfinite(history["loss"][-1])
        # The model can literally predict 'UQ'.
        preds = runner.predict(runner._encode(ds))
        assert set(preds.values()) <= set(ds.label2ans)


class TestResume:
    def test_resume_restores_step_and_params(self, synth_root, tmp_path):
        cfg = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=12),
            train=TrainConfig(
                batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=synth_root, synthetic=True),
            output=str(tmp_path / "res"),
        )
        runner = GQARunner(cfg)
        runner.train()
        # Resume from LAST: same params, nonzero step, trains on.
        history2 = runner.train(resume="LAST")
        assert np.isfinite(history2["loss"][-1])
