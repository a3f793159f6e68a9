"""ViLT backbone tests."""

import numpy as np

import jax
import jax.numpy as jnp

from rgqa_tpu.config import EncoderConfig, ModelConfig
from rgqa_tpu.models.zoo import build_model, example_batch

ENC = EncoderConfig(
    hidden_size=32,
    num_heads=4,
    intermediate_size=64,
    vocab_size=256,
    num_layers=2,
)
CFG = ModelConfig(
    backbone="vilt",
    encoder=ENC,
    num_answers=7,
    max_text_len=6,
    vilt_patch_size=16,
    vilt_image_size=64,
)


class TestVilt:
    def test_forward_shapes(self):
        model, forward = build_model(CFG)
        batch = example_batch(CFG, batch_size=3, seed=0)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"], jb["pixels"]
        )["params"]
        out = forward(params, jb, deterministic=True)
        assert out["logits"].shape == (3, 7)
        assert out["pooled"].shape == (3, 32)
        # 64/16 = 4 -> 16 patches + 1 CLS.
        assert params["pos_embed"].shape == (1, 17, 32)

    def test_text_mask_changes_output(self):
        model, forward = build_model(CFG)
        batch = example_batch(CFG, batch_size=2, seed=1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"], jb["pixels"]
        )["params"]
        full = forward(params, jb, deterministic=True)["logits"]
        jb2 = dict(jb)
        jb2["input_mask"] = jb["input_mask"].at[:, 3:].set(0)
        masked = forward(params, jb2, deterministic=True)["logits"]
        assert not np.allclose(np.asarray(full), np.asarray(masked))


class TestViltEndToEnd:
    def test_runner_train_and_eval(self, tmp_path):
        import numpy as _np

        from rgqa_tpu.config import (
            DataConfig, ModelConfig, OptimConfig, RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import GQADataset, SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.runner import GQARunner

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(
            root, SyntheticSpec(n_images=12, n_train=32, n_valid=8, n_testdev=16)
        )
        cfg = RunConfig(
            model=ModelConfig(
                backbone="vilt", encoder=ENC, max_text_len=6,
                vilt_patch_size=16, vilt_image_size=64,
            ),
            train=TrainConfig(
                batch_size=8, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=root, synthetic=True),
            output=str(tmp_path / "snap"),
        )
        runner = GQARunner(cfg)
        history = runner.train()
        assert _np.isfinite(history["loss"][-1])
        ds = GQADataset(root, "testdev", add_uq=True)
        res = runner.ood_evaluate(runner._encode(ds))
        assert "auaf" in res
