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


class TestPadPatchMasking:
    """Static-shape pad-patch masking (reference ``visual_embed`` drops
    pad patches, ``src/vilt/modules/vision_transformer.py:551-668``;
    here they stay as masked key positions — docs/vilt_images.md)."""

    def _padded_batch(self, fill=0.0):
        batch = example_batch(CFG, batch_size=2, seed=2)
        px = batch["pixels"]
        px[:, :16] = fill   # top pad band: patch row 0
        px[:, 48:] = fill   # bottom pad band: patch row 3
        return batch

    def _params(self, jb, model):
        return model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"],
            jb["pixels"],
        )["params"]

    def test_derived_mask_matches_pad_region(self):
        from rgqa_tpu.models.vilt import ViltForGQA

        m = ViltForGQA(ENC, 7, patch_size=16, image_size=64)
        px = jnp.asarray(self._padded_batch()["pixels"])
        mask = np.asarray(m.patch_valid_mask(px, jnp.int32)).reshape(2, 4, 4)
        np.testing.assert_array_equal(mask[:, 0], 0)
        np.testing.assert_array_equal(mask[:, 3], 0)
        np.testing.assert_array_equal(mask[:, 1:3], 1)

    def test_masked_pad_content_cannot_leak(self):
        # With an explicit pixel mask, garbage in the masked region must
        # not move the logits: masked keys are truly out of attention.
        model, forward = build_model(CFG)
        zero = self._padded_batch(0.0)
        junk = self._padded_batch(37.5)
        jb0 = {k: jnp.asarray(v) for k, v in zero.items()}
        jb1 = {k: jnp.asarray(v) for k, v in junk.items()}
        params = self._params(jb0, model)
        pm = np.ones((2, 16), np.int32)
        pm.reshape(2, 4, 4)[:, 0] = 0
        pm.reshape(2, 4, 4)[:, 3] = 0
        pm = jnp.asarray(pm)
        out0 = forward(params, jb0, deterministic=True, pixel_mask=pm)
        out1 = forward(params, jb1, deterministic=True, pixel_mask=pm)
        np.testing.assert_allclose(
            np.asarray(out0["logits"]), np.asarray(out1["logits"]),
            atol=1e-5,
        )

    def test_masking_is_load_bearing(self):
        # Derived mask (pad patches out) vs explicit all-ones (pad
        # patches in) must differ on a padded image.
        model, forward = build_model(CFG)
        batch = self._padded_batch()
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = self._params(jb, model)
        masked = forward(params, jb, deterministic=True)["logits"]
        unmasked = forward(
            params, jb, deterministic=True,
            pixel_mask=jnp.ones((2, 16), jnp.int32),
        )["logits"]
        assert not np.allclose(np.asarray(masked), np.asarray(unmasked))


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
