"""UNITER checkpoint-importer parity against the reference torch model."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.config import EncoderConfig, ModelConfig
from rgqa_tpu.models.zoo import build_model, example_batch
from test_torch_import import _stub_boto3

ENC = EncoderConfig(
    hidden_size=64,
    num_heads=4,
    intermediate_size=128,
    vocab_size=300,
    visual_feat_dim=48,
    num_objects=5,
    num_layers=3,
)


@pytest.fixture(scope="module")
def ref_uniter(reference_dir):
    torch = pytest.importorskip("torch")
    _stub_boto3()
    sys.path.insert(0, str(reference_dir / "src"))
    try:
        from uniter import modeling
    finally:
        sys.path.pop(0)
    return modeling


def _build_ref(modeling, torch):
    modeling.VISUAL_CONFIG.set_visual_dims(ENC.visual_feat_dim, 7)
    cfg = modeling.BertConfig(
        vocab_size_or_config_json_file=ENC.vocab_size,
        hidden_size=ENC.hidden_size,
        num_hidden_layers=ENC.num_layers,
        num_attention_heads=ENC.num_heads,
        intermediate_size=ENC.intermediate_size,
    )
    torch.manual_seed(0)
    model = modeling.UniterFeatureExtraction(cfg)
    model.eval()
    return model


class TestUniterImportParity:
    def test_forward_parity(self, ref_uniter, tmp_path):
        import torch

        from rgqa_tpu.checkpoint import import_uniter_gqa

        ref = _build_ref(ref_uniter, torch)
        gen = torch.Generator().manual_seed(3)
        with torch.no_grad():
            for p in ref.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
        torch.save(ref.state_dict(), tmp_path / "uniter.pth")

        cfg = ModelConfig(
            backbone="uniter", encoder=ENC, num_answers=9, max_text_len=7
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=3, seed=2)
        batch["input_mask"][0, 4:] = 0
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0),
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
        )["params"]
        params, missing, unused = import_uniter_gqa(
            params, str(tmp_path / "uniter.pth"), num_layers=ENC.num_layers
        )
        assert all("logit_fc" in m for m in missing)
        assert not unused, unused[:8]

        b = batch
        with torch.no_grad():
            pooled_t = ref(
                torch.tensor(b["input_ids"], dtype=torch.long),
                token_type_ids=torch.tensor(b["segment_ids"], dtype=torch.long),
                attention_mask=torch.tensor(b["input_mask"], dtype=torch.long),
                visual_feats=torch.tensor(b["feats"]),
                visual_token_type_ids=torch.ones(3, 5, dtype=torch.long),
                visual_attention_mask=torch.ones(3, 5, dtype=torch.long),
                img_pos_feat=torch.tensor(b["boxes"]),
            ).numpy()

        out = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
            method=lambda m, *a: m.uniter(*a),
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), pooled_t, rtol=2e-4, atol=2e-5
        )
