"""WordPiece tokenizer tests, including parity vs. the reference's vendored
BERT tokenizer (``src/lxrt/tokenization.py``) on a shared synthetic vocab."""

import sys
import types

import numpy as np
import pytest

from rgqa_tpu.data.tokenizer import (
    BasicTokenizer,
    WordPieceTokenizer,
    build_vocab,
)

CORPUS = [
    "What color is the cat on the table?",
    "Is the large shower dirty or clean?",
    "Which material is the crosswalk made of, cobblestone or brick?",
    "Are the pens next to the cat small and colorful?",
    "unbelievable transformations happening quickly!",
]


@pytest.fixture(scope="module")
def vocab():
    return build_vocab(CORPUS, max_size=200)


@pytest.fixture(scope="module")
def tok(vocab):
    return WordPieceTokenizer(vocab)


class TestBasic:
    def test_lowercase_and_punct_split(self):
        bt = BasicTokenizer()
        assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_accent_strip(self):
        bt = BasicTokenizer()
        assert bt.tokenize("Café naïve") == ["cafe", "naive"]

    def test_cjk_isolation(self):
        bt = BasicTokenizer()
        assert bt.tokenize("ab中国cd") == ["ab", "中", "国", "cd"]

    def test_control_chars_removed(self):
        bt = BasicTokenizer()
        assert bt.tokenize("a\x00b​c") == ["ab​c"] or bt.tokenize(
            "a\x00b"
        ) == ["ab"]


class TestWordPiece:
    def test_known_words_roundtrip(self, tok):
        toks = tok.tokenize("What color is the cat?")
        assert toks[:5] == ["what", "color", "is", "the", "cat"]

    def test_unknown_word_falls_to_pieces(self, tok):
        # 'catbrick' not in corpus, but 'cat' and all chars are: greedy
        # longest-match starts with the whole-word piece 'cat'.
        pieces = tok.tokenize("catbrick")
        assert pieces[0] == "cat"
        assert all(p.startswith("##") for p in pieces[1:])
        assert "".join(p.lstrip("#") for p in pieces) == "catbrick"
        # A word containing chars absent from the vocab maps to [UNK].
        assert tok.tokenize("zebra") == ["[UNK]"]

    def test_encode_shape_contract(self, tok):
        ids, mask, seg = tok.encode("What color is the cat?", max_len=20)
        assert len(ids) == len(mask) == len(seg) == 20
        assert ids[0] == tok.cls_id
        assert ids[sum(mask) - 1] == tok.sep_id
        assert all(i == tok.pad_id for i in ids[sum(mask):])

    def test_encode_truncation(self, tok):
        long = " ".join(["cat"] * 50)
        ids, mask, _ = tok.encode(long, max_len=10)
        assert sum(mask) == 10
        assert ids[-1] == tok.sep_id

    def test_encode_pair_segments(self, tok):
        ids, mask, seg = tok.encode("the cat", 16, text_pair="the table")
        n = sum(mask)
        assert seg[:1] == [0]
        assert 1 in seg[:n]
        assert seg[n:] == [0] * (16 - n)

    def test_encode_batch_fixed_shapes(self, tok):
        ids, mask, seg = tok.encode_batch(CORPUS, max_len=24)
        assert ids.shape == (len(CORPUS), 24)
        assert ids.dtype == np.int32
        assert (ids[:, 0] == tok.cls_id).all()


class TestReferenceParity:
    """Run the reference tokenizer on the same vocab + text and compare."""

    @pytest.fixture(scope="class")
    def ref_tokenizer_cls(self, reference_dir):
        # The reference module imports file_utils -> boto3/requests, which
        # aren't installed; stub them before import.
        for mod in ("boto3", "requests"):
            sys.modules.setdefault(mod, types.ModuleType(mod))
        tqdm_mod = types.ModuleType("tqdm")
        tqdm_mod.tqdm = lambda x, **kw: x
        sys.modules.setdefault("tqdm", tqdm_mod)
        botocore = types.ModuleType("botocore")
        botocore.exceptions = types.ModuleType("botocore.exceptions")
        botocore.exceptions.ClientError = Exception
        sys.modules.setdefault("botocore", botocore)
        sys.modules.setdefault("botocore.exceptions", botocore.exceptions)
        sys.path.insert(0, str(reference_dir / "src"))
        try:
            from lxrt import tokenization as ref_tok
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference tokenizer not importable: {e}")
        return ref_tok

    @pytest.mark.parametrize(
        "text",
        CORPUS
        + [
            "Café!  naïve,straße; 中国 words",
            "UPPER lower MiXeD 123 45.6",
            "hy-phen_under @#$ %^&*()",
            "",
            "a" * 150,  # longer than max_chars_per_word
            "what's the person's name?",
        ],
    )
    def test_tokenize_parity(self, ref_tokenizer_cls, vocab, tmp_path_factory, text):
        vocab_file = tmp_path_factory.mktemp("vocab") / "vocab.txt"
        items = sorted(vocab.items(), key=lambda kv: kv[1])
        vocab_file.write_text("\n".join(t for t, _ in items) + "\n")

        ref = ref_tokenizer_cls.BertTokenizer(
            str(vocab_file), do_lower_case=True
        )
        mine = WordPieceTokenizer(vocab)
        assert mine.tokenize(text) == ref.tokenize(text)
