"""Model zoo tests: shapes, masking semantics, shared-weight structure,
variant flags (branched / adv deltas / attention probs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models import (
    ButdForGQA,
    CaptionMatcher,
    LxmertForGQA,
    LxmertPretraining,
    UniterForGQA,
    tokenize_front_padded,
    uniter_box_transform,
)

CFG = EncoderConfig(
    hidden_size=32,
    num_heads=4,
    intermediate_size=64,
    vocab_size=50,
    l_layers=2,
    x_layers=1,
    r_layers=1,
    num_layers=2,
    visual_feat_dim=16,
    obj_vocab_size=20,
    attr_vocab_size=10,
)
B, S, O = 2, 8, 36


def text_inputs(rng=None):
    rng = rng or np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 50, (B, S)), jnp.int32)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < np.array([[5], [8]])).astype(np.int32)
    )
    seg = jnp.zeros((B, S), jnp.int32)
    return ids, mask, seg


def visual_inputs(rng=None, pos_dim=4):
    rng = rng or np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((B, O, 16)), jnp.float32)
    boxes = jnp.asarray(rng.random((B, O, pos_dim)), jnp.float32)
    return feats, boxes


@pytest.fixture(scope="module")
def lxmert():
    m = LxmertForGQA(CFG, num_answers=10, branched=True)
    ids, mask, seg = text_inputs()
    feats, boxes = visual_inputs()
    params = jax.jit(m.init)(jax.random.key(0), ids, mask, seg, feats, boxes)
    return m, params


class TestLxmert:
    def test_shapes(self, lxmert):
        m, params = lxmert
        ids, mask, seg = text_inputs()
        feats, boxes = visual_inputs()
        out = jax.jit(m.apply)(params, ids, mask, seg, feats, boxes)
        assert out["logits"].shape == (B, 10)
        assert out["pooled"].shape == (B, 32)
        assert out["conf"].shape == (B,)

    def test_mask_invariance(self, lxmert):
        """Padding tokens must not affect the pooled output."""
        m, params = lxmert
        ids, mask, seg = text_inputs()
        feats, boxes = visual_inputs()
        out1 = m.apply(params, ids, mask, seg, feats, boxes)
        # Perturb ids at padding positions of row 0 (positions >= 5).
        ids2 = ids.at[0, 6].set(7).at[0, 7].set(3)
        out2 = m.apply(params, ids2, mask, seg, feats, boxes)
        np.testing.assert_allclose(
            out1["logits"], out2["logits"], rtol=0, atol=1e-5
        )

    def test_adv_deltas_change_output(self, lxmert):
        m, params = lxmert
        ids, mask, seg = text_inputs()
        feats, boxes = visual_inputs()
        out1 = m.apply(params, ids, mask, seg, feats, boxes)
        out2 = m.apply(
            params, ids, mask, seg, feats, boxes,
            txt_delta=jnp.full((B, S, 32), 0.1),
            img_delta=jnp.full((B, O, 16), 0.1),
        )
        assert np.abs(np.asarray(out1["logits"]) - np.asarray(out2["logits"])).max() > 1e-6

    def test_attention_probs_output(self, lxmert):
        m, params = lxmert
        ids, mask, seg = text_inputs()
        feats, boxes = visual_inputs()
        out = m.apply(params, ids, mask, seg, feats, boxes, output_probs=True)
        probs = out["x_attention_probs"]
        assert len(probs) == CFG.x_layers
        lang_probs, visn_probs = probs[0]
        assert lang_probs.shape == (B, 4, S, O)
        assert visn_probs.shape == (B, 4, O, S)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(lang_probs, -1)), 1.0, rtol=1e-5
        )

    def test_shared_cross_attention_params(self, lxmert):
        """The x-layer must have ONE cross-attention module used both ways
        (reference modeling.py:455-459)."""
        _, params = lxmert
        x0 = params["params"]["lxmert"]["x_0"]
        assert "cross_att" in x0
        assert "lang_self" in x0 and "visn_self" in x0
        # No second cross-attention module.
        cross_like = [k for k in x0 if "cross" in k]
        assert cross_like == ["cross_att"]

    def test_pretraining_heads(self):
        m = LxmertPretraining(CFG, num_answers=7)
        ids, mask, seg = text_inputs()
        feats, boxes = visual_inputs()
        params = jax.jit(m.init)(jax.random.key(0), ids, mask, seg, feats, boxes)
        out = jax.jit(m.apply)(params, ids, mask, seg, feats, boxes)
        assert out["mlm"].shape == (B, S, 50)
        assert out["matched"].shape == (B, 2)
        assert out["visn"]["obj"].shape == (B, O, 20)
        assert out["visn"]["attr"].shape == (B, O, 10)
        assert out["visn"]["feat"].shape == (B, O, 16)
        assert out["qa"].shape == (B, 7)


class TestUniter:
    def test_shapes_and_box_transform(self):
        m = UniterForGQA(CFG, num_answers=10)
        ids, mask, seg = text_inputs()
        feats, _ = visual_inputs()
        boxes4 = np.random.default_rng(2).random((B, O, 4)).astype(np.float32)
        pos7 = jnp.asarray(uniter_box_transform(boxes4))
        assert pos7.shape == (B, O, 7)
        # h = y2 - y1, w = x2 - x1, area = h * w
        np.testing.assert_allclose(
            np.asarray(pos7[..., 6]),
            np.asarray(pos7[..., 4] * pos7[..., 5]),
            rtol=1e-6,
        )
        params = jax.jit(m.init)(jax.random.key(0), ids, mask, seg, feats, pos7)
        out = jax.jit(m.apply)(params, ids, mask, seg, feats, pos7)
        assert out["logits"].shape == (B, 10)
        assert out["pooled"].shape == (B, 32)


class TestButd:
    def test_tokenize_front_padded(self):
        w2i = {"what": 0, "color": 1, "is": 2, "the": 3, "cat": 4, "'s": 5}
        toks = tokenize_front_padded(["What color is the cat's?"], w2i, max_len=10)
        assert toks.shape == (1, 10)
        # Front padding: real tokens at the end.
        assert toks[0, -6:].tolist() == [0, 1, 2, 3, 4, 5]
        assert (toks[0, :4] == len(w2i)).all()

    def test_forward(self):
        m = ButdForGQA(vocab_size=30, num_answers=10, hidden=64, visual_dim=16)
        rng = np.random.default_rng(3)
        toks = jnp.asarray(rng.integers(0, 31, (B, 12)), jnp.int32)
        feats = jnp.asarray(rng.standard_normal((B, O, 16)), jnp.float32)
        boxes = jnp.asarray(rng.random((B, O, 4)), jnp.float32)
        params = jax.jit(m.init)(jax.random.key(0), toks, feats, boxes)
        out = jax.jit(m.apply)(params, toks, feats, boxes)
        assert out["logits"].shape == (B, 10)
        assert out["pooled"].shape == (B, 64)
        out_att = m.apply(params, toks, feats, boxes, output_attention=True)
        assert out_att["attention"].shape == (B, O, 1)
        np.testing.assert_allclose(
            np.asarray(out_att["attention"]).sum(axis=1), 1.0, rtol=1e-5
        )


class TestCaptionMatcher:
    def test_pair_match(self):
        m = CaptionMatcher(CFG)
        ids, mask, seg = text_inputs()
        params = jax.jit(m.init)(jax.random.key(0), ids, mask, seg)
        out = jax.jit(m.apply)(params, ids, mask, seg)
        assert out["logits"].shape == (B,)
        prob = m.apply(params, ids, mask, seg, method=m.match_prob)
        assert ((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1)).all()


class TestGRUvsTorch:
    def test_gru_matches_torch(self):
        torch = pytest.importorskip("torch")
        from rgqa_tpu.ops.gru import gru_scan

        rng = np.random.default_rng(0)
        B_, T, D, H = 3, 7, 5, 11
        x = rng.standard_normal((B_, T, D)).astype(np.float32)
        tg = torch.nn.GRU(D, H, batch_first=True)
        with torch.no_grad():
            out_t, h_t = tg(torch.from_numpy(x))
        out_j, h_j = gru_scan(
            jnp.asarray(x),
            jnp.zeros((B_, H)),
            jnp.asarray(tg.weight_ih_l0.detach().numpy()),
            jnp.asarray(tg.weight_hh_l0.detach().numpy()),
            jnp.asarray(tg.bias_ih_l0.detach().numpy()),
            jnp.asarray(tg.bias_hh_l0.detach().numpy()),
        )
        # fp32 tolerance: XLA's vectorized tanh/sigmoid approximations
        # differ from ATen's by ~1e-6/call, amplified through the
        # recurrence.  Equations verified exactly (5e-8) against torch in
        # float64 numpy.
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.numpy(), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(h_j), h_t[0].numpy(), rtol=2e-3, atol=2e-3
        )
