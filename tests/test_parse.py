"""Parse-aware TreeMix tests (reference ``gqa_mixup_both.py:47-100`` +
``gqa_data.py:203-228`` parse passthrough)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.data.parse import (
    encode_parse_spans,
    parse_tree,
    subtree_spans,
    tree_leaves,
)
from rgqa_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from rgqa_tpu.train.step import _treemix_augment, mixup_augment

PARSE = "(ROOT (S (NP (W what) (W is)) (NP (W the) (W red)) (NP (W object) (W near)) (NP (W the) (W ball)) (. ?)))"
SENT = "what is the red object near the ball ?"


def _tokenizer(sents):
    vocab = build_vocab(" ".join(sents).split())
    return WordPieceTokenizer(vocab)


class TestParseUtils:
    def test_parse_tree_leaves(self):
        t = parse_tree(PARSE)
        assert tree_leaves(t) == SENT.split()

    def test_subtree_spans_preorder(self):
        t = parse_tree(PARSE)
        spans = subtree_spans(t)
        # Root first (pre-order), full coverage.
        assert spans[0] == (0, 9)
        assert (0, 2) in spans and (2, 4) in spans and (6, 8) in spans
        # Leaf-POS nodes are 1-wide subtrees, like nltk's subtrees().
        assert (0, 1) in spans

    def test_encode_spans_wordpiece_coords(self):
        tok = _tokenizer([SENT])
        spans, span_words, n_words = encode_parse_spans(
            [PARSE], [SENT], tok, max_text_len=20
        )
        assert n_words[0] == 9
        # Every non-pad span must cover whole wordpiece words, offset by
        # the [CLS] slot; with a single-piece vocab coords == word coords+1.
        valid = spans[0][spans[0][:, 0] >= 0]
        assert len(valid) > 0
        assert valid.min() >= 1
        ids, mask, _ = tok.encode_batch([SENT], 20)
        assert valid.max() <= mask.sum()

    def test_unusable_parse_is_skipped(self):
        tok = _tokenizer([SENT])
        spans, _, n_words = encode_parse_spans(
            ["(ROOT (S (W mismatch)))", None, "((("],
            [SENT, SENT, SENT],
            tok,
            max_text_len=20,
        )
        assert (n_words == 0).all()
        assert (spans == -1).all()


def _parse_batch(b=8, t=16, k=6):
    """A batch whose rows carry two candidate spans each."""
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 50, (b, t)).astype(np.int32)
    ids[:, 0] = 2  # CLS
    lens = rng.integers(10, t, (b,))
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)
    spans = np.full((b, k, 2), -1, np.int32)
    span_words = np.zeros((b, k), np.int32)
    # Two 2-word candidates per row at words [1,3) and [5,7) -> wp 1:1.
    spans[:, 0] = (1, 3)
    spans[:, 1] = (5, 7)
    span_words[:, 0] = 2
    span_words[:, 1] = 2
    return {
        "input_ids": ids,
        "input_mask": mask,
        "segment_ids": np.zeros((b, t), np.int32),
        "feats": rng.standard_normal((b, 4, 8)).astype(np.float32),
        "boxes": rng.random((b, 4, 4)).astype(np.float32),
        "target": np.eye(b, 10, dtype=np.float32),
        "id_mask": np.ones((b,), np.float32),
        "parse_spans": spans,
        "parse_span_words": span_words,
        "parse_n_words": np.full((b,), 8, np.int32),
    }


class TestTreemixAugment:
    def test_subtree_boundary_splice(self):
        batch = {k: jnp.asarray(v) for k, v in _parse_batch().items()}
        out = _treemix_augment(
            batch, jax.random.PRNGKey(0), 1.0, 1.0, "treemix_v2",
            lam1=0.5, lam2=0.05,
        )
        b, t = batch["input_ids"].shape
        mixed = np.asarray(out["input_ids"])[b:]
        orig = np.asarray(batch["input_ids"])
        # Candidate spans are [1,3) and [5,7), both 2 tokens wide, so the
        # splice replaces exactly one candidate window with a partner's
        # candidate window: outside {1,2,5,6} rows must equal the anchor.
        outside = np.ones(t, bool)
        outside[[1, 2, 5, 6]] = False
        np.testing.assert_array_equal(mixed[:, outside], orig[:, outside])
        # And at least one row actually changed inside a candidate span.
        assert (mixed != orig).any()
        # Inside the spliced window, tokens come from some partner row's
        # candidate positions.
        changed = np.nonzero((mixed != orig).any(axis=1))[0]
        for r in changed:
            win = [1, 2] if (mixed[r, 1:3] != orig[r, 1:3]).any() else [5, 6]
            candidates = orig[:, [1, 2]].tolist() + orig[:, [5, 6]].tolist()
            assert mixed[r, win].tolist() in candidates
        # Zero targets (treemix_v2), zero id_mask on appended rows.
        np.testing.assert_array_equal(
            np.asarray(out["target"])[b:], np.zeros((b, 10), np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(out["id_mask"])[b:], np.zeros((b,), np.float32)
        )

    def test_equal_width_spans_keep_mask(self):
        batch = {k: jnp.asarray(v) for k, v in _parse_batch().items()}
        out = _treemix_augment(
            batch, jax.random.PRNGKey(1), 1.0, 1.0, "treemix_v2",
            lam1=0.5, lam2=0.05,
        )
        b = batch["input_ids"].shape[0]
        # All candidates are 2 words / 2 wordpieces -> lengths unchanged.
        np.testing.assert_array_equal(
            np.asarray(out["input_mask"])[b:], np.asarray(batch["input_mask"])
        )

    def test_fallback_without_parse(self):
        host = _parse_batch()
        for k in ("parse_spans", "parse_span_words", "parse_n_words"):
            del host[k]
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        out = _treemix_augment(
            batch, jax.random.PRNGKey(2), 1.0, 1.0, "treemix_v2",
            lam1=0.5, lam2=0.05,
        )
        b = batch["input_ids"].shape[0]
        assert out["input_ids"].shape[0] == 2 * b
        np.testing.assert_array_equal(
            np.asarray(out["target"])[b:], np.zeros((b, 10), np.float32)
        )

    def test_v1_label_shrinks_target(self):
        batch = {k: jnp.asarray(v) for k, v in _parse_batch().items()}
        out = _treemix_augment(
            batch, jax.random.PRNGKey(3), 1.0, 1.0, "treemix_v1",
            lam1=0.5, lam2=0.05,
        )
        b = batch["input_ids"].shape[0]
        pet = np.asarray(out["target"])[b:]
        # label = (new_words - l2w)/new_words = (8-2)/8 = 0.75 for all rows
        # (every candidate is 2 words wide, n_words = 8).
        np.testing.assert_allclose(pet.sum(axis=1), 0.75, rtol=1e-6)

    def test_treemix_both_alternates(self):
        batch = {k: jnp.asarray(v) for k, v in _parse_batch().items()}
        b = batch["input_ids"].shape[0]
        saw_lang = saw_vis = False
        for seed in range(8):
            out = mixup_augment(
                batch, jax.random.PRNGKey(seed), 1.0, 1.0, "treemix_both"
            )
            assert out["input_ids"].shape[0] == 2 * b
            feats_changed = not np.array_equal(
                np.asarray(out["feats"])[b:], np.asarray(batch["feats"])
            )
            ids_changed = not np.array_equal(
                np.asarray(out["input_ids"])[b:],
                np.asarray(batch["input_ids"]),
            )
            saw_vis |= feats_changed
            saw_lang |= ids_changed and not feats_changed
        assert saw_lang and saw_vis


class TestEncodedParse(object):
    def test_synthetic_train_rows_carry_parses(self, tmp_path):
        from rgqa_tpu.data.dataset import EncodedGQA, GQADataset
        from rgqa_tpu.data.synthetic import SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.data.tokenizer import load_vocab
        from rgqa_tpu.data.tsv import PackedFeatures

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(root, SyntheticSpec(n_images=8, n_train=32))
        import os

        ds = GQADataset(root, "train", add_uq=True)
        feats = PackedFeatures(os.path.join(root, "features"))
        tok = WordPieceTokenizer(load_vocab(os.path.join(root, "vocab.txt")))
        enc = EncodedGQA(ds, feats, tokenizer=tok, max_text_len=20)
        assert enc.parse_spans is not None
        assert (enc.parse_n_words > 0).sum() > 0.9 * len(enc)
        batch = enc.gather_batch(np.arange(4))
        assert batch["parse_spans"].shape[0] == 4
