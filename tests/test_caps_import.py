"""HF-BERT -> CaptionMatcher import parity (VERDICT r3 missing #2).

The reference Q-C matcher starts from ``BertModel.from_pretrained(
"bert-base-uncased")`` (``src/caps/caps.py:17``) with a fresh
``logit_fc`` head (``caps.py:23-28``).  The torch side here is built
in-process from the exact classes the reference uses — HF ``BertModel``
plus a ``logit_fc`` Sequential — with random weights (no downloads),
following the tests/test_torch_import.py pattern.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.checkpoint import import_bert_caps
from rgqa_tpu.models.caps import CaptionMatcher

ENC = EncoderConfig(
    hidden_size=32, num_heads=4, intermediate_size=64, vocab_size=128,
    max_position_embeddings=16, num_layers=2,
)


def _torch_bert(seed=0):
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    cfg = BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, vocab_size=128, max_position_embeddings=16,
        type_vocab_size=2, hidden_act="gelu", layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg._attn_implementation = "eager"
    model = BertModel(cfg)
    model.eval()
    return model


def _inputs(b=3, s=12, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, 120, (b, s)).astype(np.int32)
    mask = np.zeros((b, s), np.int32)
    for i, ln in enumerate(rng.integers(4, s, b)):
        mask[i, :ln] = 1
        ids[i, ln:] = 0
    segs = (rng.random((b, s)) > 0.5).astype(np.int32)
    return ids, mask, segs


def _init_caps(seed=0):
    model = CaptionMatcher(ENC)
    ids, mask, segs = _inputs()
    params = model.init(jax.random.PRNGKey(seed), ids, mask, segs)["params"]
    return model, jax.tree_util.tree_map(np.asarray, params)


class TestBertCapsImport:
    def test_pooler_parity_bare_bert(self, tmp_path):
        """Bare bert-base state_dict (the --load_bert init): encoder +
        pooler must reproduce the torch forward; the head stays random."""
        tbert = _torch_bert()
        path = str(tmp_path / "bert.pth")
        torch.save(tbert.state_dict(), path)

        model, params = _init_caps()
        params, missing, unused = import_bert_caps(
            params, path, num_layers=ENC.num_layers
        )
        assert not missing, missing[:5]
        assert not unused, unused[:5]

        ids, mask, segs = _inputs()
        with torch.no_grad():
            ref = tbert(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                token_type_ids=torch.from_numpy(segs.astype(np.int64)),
            )
        out = model.apply({"params": params}, ids, mask, segs)
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), ref.pooler_output.numpy(),
            atol=2e-5, rtol=1e-4,
        )

    def test_trained_gqabert_roundtrip(self, tmp_path):
        """A trained reference-layout matcher (BertModel under
        ``encoder.`` + ``logit_fc``, caps.py:14-28) imports fully —
        logits match end to end."""
        import torch.nn as nn

        class GQABERTRef(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = _torch_bert(seed=3)
                torch.manual_seed(4)
                self.logit_fc = nn.Sequential(
                    nn.Linear(32, 64),
                    nn.GELU(),
                    nn.LayerNorm(64, eps=1e-12),
                    nn.Linear(64, 1),
                )

            def forward(self, ids, mask, segs):
                x = self.encoder(
                    input_ids=ids, attention_mask=mask, token_type_ids=segs
                ).last_hidden_state[:, 0, :]
                return self.logit_fc(x)

        ref_model = GQABERTRef()
        ref_model.eval()
        path = str(tmp_path / "gqabert.pth")
        torch.save(ref_model.state_dict(), path)

        model, params = _init_caps(seed=7)
        params, missing, unused = import_bert_caps(
            params, path, num_layers=ENC.num_layers
        )
        assert not missing, missing[:5]
        assert not unused, unused[:5]

        ids, mask, segs = _inputs(seed=9)
        with torch.no_grad():
            want = ref_model(
                torch.from_numpy(ids.astype(np.int64)),
                torch.from_numpy(mask.astype(np.int64)),
                torch.from_numpy(segs.astype(np.int64)),
            ).numpy()[:, 0]
        out = model.apply({"params": params}, ids, mask, segs)
        np.testing.assert_allclose(
            np.asarray(out["logits"]), want, atol=2e-5, rtol=1e-4
        )

    def test_runner_load_bert_flag(self, tmp_path):
        """--load_bert on a caps runner lands the BERT word table in the
        matcher's embeddings (the qc.sh starting point)."""
        from rgqa_tpu.config import (
            DataConfig, ModelConfig, RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.runner import GQARunner, np_params

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(
            root, SyntheticSpec(n_images=8, n_train=16, n_valid=8, n_testdev=8)
        )
        tbert = _torch_bert(seed=11)
        path = str(tmp_path / "bert.pth")
        torch.save(tbert.state_dict(), path)
        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            vocab_size=128, max_position_embeddings=16, num_layers=2,
        )
        cfg = RunConfig(
            model=ModelConfig(backbone="caps", encoder=enc, max_text_len=12),
            train=TrainConfig(
                batch_size=4, epochs=1, strategy="caption", use_bf16=False
            ),
            data=DataConfig(data_root=root, synthetic=True),
            output=str(tmp_path / "snap"),
            load_bert=path,
        )
        runner = GQARunner(cfg, init_train=False)
        emb = np_params(runner.params)["embeddings"]["word_embeddings"][
            "embedding"
        ]
        want = tbert.embeddings.word_embeddings.weight.detach().numpy()
        np.testing.assert_allclose(emb, want, atol=1e-6)
