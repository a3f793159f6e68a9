"""BUTD checkpoint-importer parity against the reference torch model.

Covers the GRU (torch cuDNN gate order vs. the lax.scan rebuild),
weight-norm dim=None parameterization, product-fusion attention, and the
front-padded tokenizer convention.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.models.butd import ButdForGQA

VOCAB = 50
ANSWERS = 9
HIDDEN = 32
EMB = 12
VDIM = 16
K = 5


class FakeDictionary:
    ntoken = VOCAB
    padding_idx = VOCAB


@pytest.fixture(scope="module")
def ref_butd(reference_dir):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_dir / "src"))
    try:
        from butd import butd as mod
    finally:
        sys.path.pop(0)
    return mod


def _build_ref(mod, torch):
    model = mod.GQABUTD(ANSWERS, FakeDictionary(), dropout=False)
    # Shrink to test shapes by rebuilding with patched hyperparams.
    model.emb_dim, model.hidden, model.v_dim = EMB, HIDDEN, VDIM
    model.build_model()
    model.eval()
    return model


class TestButdImportParity:
    def test_forward_parity(self, ref_butd, tmp_path):
        import torch

        ref = _build_ref(ref_butd, torch)
        gen = torch.Generator().manual_seed(11)
        with torch.no_grad():
            for p in ref.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        torch.save(ref.state_dict(), tmp_path / "butd.pth")

        model = ButdForGQA(
            vocab_size=VOCAB,
            num_answers=ANSWERS,
            embed_dim=EMB,
            hidden=HIDDEN,
            visual_dim=VDIM,
        )
        rng = np.random.default_rng(0)
        toks = rng.integers(0, VOCAB, (3, 7)).astype(np.int32)
        # Front padding with the pad index.
        toks_padded = np.full((3, 10), VOCAB, np.int32)
        toks_padded[:, 3:] = toks
        feats = rng.standard_normal((3, K, VDIM)).astype(np.float32)
        boxes = rng.random((3, K, 4)).astype(np.float32)

        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(toks_padded), jnp.asarray(feats), jnp.asarray(boxes),
        )["params"]
        from rgqa_tpu.checkpoint import import_butd_gqa

        params, missing, unused = import_butd_gqa(
            params, str(tmp_path / "butd.pth")
        )
        assert not missing, missing
        assert not unused, unused

        # Reference forward (bypassing its .cuda() tokenize path): feed the
        # same token ids through the module pieces directly.
        with torch.no_grad():
            t = torch.tensor(toks_padded, dtype=torch.long)
            w = ref.w_emb(t)
            q = ref.q_enc(w)
            image_features = torch.cat(
                [torch.tensor(feats), torch.tensor(boxes)], dim=2
            )
            att = ref.att(image_features, q)
            img_enc = (image_features * att).sum(dim=1)
            joint = ref.q_project(q) * ref.img_project(img_enc)
            logits_t = ref.ans_classifier(joint).numpy()

        out = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(toks_padded), jnp.asarray(feats), jnp.asarray(boxes),
        )
        np.testing.assert_allclose(
            np.asarray(out["logits"]), logits_t, rtol=2e-4, atol=1e-5
        )
