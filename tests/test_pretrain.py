"""Pretraining tests: masking distributions, losses, end-to-end trainer."""

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
from rgqa_tpu.pretrain import AnswerTable, mask_objects, mask_words, matched_swap
from rgqa_tpu.pretrain.losses import masked_ce, smooth_l1


class TestMasking:
    def test_word_mask_rate_and_labels(self):
        rng = jax.random.PRNGKey(0)
        ids = jnp.full((64, 32), 100, jnp.int32)
        maskable = jnp.ones_like(ids)
        masked, labels = mask_words(
            rng, ids, maskable, mask_rate=0.15, vocab_size=300, mask_id=4
        )
        sel = np.asarray(labels) >= 0
        rate = sel.mean()
        assert 0.10 < rate < 0.20
        # ~80% of selected become [MASK].
        frac_mask = (np.asarray(masked)[sel] == 4).mean()
        assert 0.7 < frac_mask < 0.9
        # Unselected positions untouched and labeled -1.
        assert np.all(np.asarray(masked)[~sel] == 100)
        assert np.all(np.asarray(labels)[~sel] == -1)

    def test_special_tokens_never_masked(self):
        rng = jax.random.PRNGKey(1)
        ids = jnp.full((16, 8), 2, jnp.int32)  # all [CLS]-ish
        maskable = jnp.zeros_like(ids)
        masked, labels = mask_words(
            rng, ids, maskable, mask_rate=0.5, vocab_size=300, mask_id=4
        )
        np.testing.assert_array_equal(np.asarray(masked), 2)
        np.testing.assert_array_equal(np.asarray(labels), -1)

    def test_object_masking(self):
        rng = jax.random.PRNGKey(2)
        feats = jnp.ones((32, 36, 16))
        pool = jnp.full((100, 16), 7.0)
        masked, fmask = mask_objects(rng, feats, pool)
        sel = np.asarray(fmask) > 0
        assert 0.08 < sel.mean() < 0.25
        vals = np.asarray(masked)[sel][:, 0]
        assert set(np.unique(vals)) <= {0.0, 1.0, 7.0}
        assert (vals == 0.0).mean() > 0.6  # ~80% zeroed

    def test_matched_swap(self):
        rng = jax.random.PRNGKey(3)
        ids = jnp.arange(16)[:, None] * jnp.ones((1, 5), jnp.int32)
        mask = jnp.ones_like(ids)
        seg = jnp.zeros_like(ids)
        ans = jnp.arange(16, dtype=jnp.int32)
        out_ids, _, _, matched, out_ans = matched_swap(rng, ids, mask, seg, ans)
        m = np.asarray(matched)
        assert 0 < m.sum() < 16
        # Mismatched rows: swapped sentence + disabled answer.
        swapped = m == 0
        assert np.all(np.asarray(out_ans)[swapped] == -1)
        assert np.all(
            np.asarray(out_ids)[swapped, 0] != np.asarray(ids)[swapped, 0]
        )
        kept = m == 1
        np.testing.assert_array_equal(
            np.asarray(out_ids)[kept], np.asarray(ids)[kept]
        )


class TestLosses:
    def test_masked_ce_ignores_minus_one(self):
        logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [5.0, -5.0]])
        labels = jnp.asarray([0, 1, -1])
        got = float(masked_ce(logits, labels))
        import math

        expect = -math.log(math.exp(2) / (math.exp(2) + 1))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_smooth_l1_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.linspace(-3, 3, 13).astype(np.float32)
        got = np.asarray(smooth_l1(jnp.asarray(x), jnp.zeros(13)))
        expect = torch.nn.SmoothL1Loss(reduction="none")(
            torch.tensor(x), torch.zeros(13)
        ).numpy()
        np.testing.assert_allclose(got, expect, rtol=1e-6)


class TestAnswerTable:
    def test_normalization(self):
        at = AnswerTable(answers=["man", "gray", "2", "dog"])
        assert at.convert_ans("The man") == "man"
        assert at.convert_ans("a Grey.") == "gray"
        assert at.convert_ans("two") == "2"
        assert at.used("dog") and not at.used("cat")
        assert at.ans2id("dog") == 3


class TestTwoSourcePretrain:
    """Multi-source pretraining semantics (reference
    ``src/pretrain/lxmert_data.py:18-48`` + ``qa_answer_table.py:8-80``):
    comma-joined splits concatenate per-source rows, and the answer-id
    space comes from an ``all_ans.json`` filtered by ``--qaSets`` — rows
    whose answer falls outside the filtered vocabulary train with QA
    disabled (ans = -1), exactly like the reference's held-out handling."""

    def _make_root(self, tmp_path):
        import json
        import os

        from rgqa_tpu.data import make_synthetic_gqa

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(root)
        with open(os.path.join(root, "trainval_label2ans.json")) as f:
            answers = json.load(f)
        half = len(answers) // 2
        # Source tags: first half mscoco-only, rest vgnococo-only, the
        # last two answers shared by both (set-intersection filter).
        all_ans = (
            [{"ans": a, "dsets": ["mscoco"]} for a in answers[:half]]
            + [{"ans": a, "dsets": ["vgnococo"]} for a in answers[half:-2]]
            + [
                {"ans": a, "dsets": ["mscoco", "vgnococo"]}
                for a in answers[-2:]
            ]
        )
        with open(os.path.join(root, "all_ans.json"), "w") as f:
            json.dump(all_ans, f)
        return root, answers, half

    def _cfg(self, root, tmp_path, **data_kw):
        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=1, r_layers=1,
            num_objects=36, visual_feat_dim=2048,
        )
        return RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=enc, max_text_len=12),
            train=TrainConfig(
                batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(
                data_root=root, synthetic=True,
                train_splits="train,valid", valid_splits="valid",
                **data_kw,
            ),
            output=str(tmp_path / "snap"),
        )

    def test_qa_sets_filter_and_concat(self, tmp_path):
        from rgqa_tpu.data import GQADataset
        from rgqa_tpu.pretrain import PretrainRunner

        root, answers, half = self._make_root(tmp_path)
        cfg = self._cfg(root, tmp_path, qa_sets="mscoco")
        runner = PretrainRunner(cfg)

        # Comma-joined sources concatenate.
        n_tr = len(GQADataset(root, "train"))
        n_va = len(GQADataset(root, "valid"))
        assert len(runner.train_set) == n_tr + n_va

        # qaSets=mscoco keeps mscoco-only + shared answers, in file order.
        kept = answers[:half] + answers[-2:]
        assert runner.answer_table.all_answers() == kept
        assert runner.model.num_answers == len(kept)

        # Rows answered outside the filtered vocab get QA disabled (-1);
        # rows inside map through convert_ans into the filtered id space.
        ans_ids = runner._ans_cache[runner.train_set]
        enc = runner.train_set
        checked_in = checked_out = 0
        for i in range(len(enc)):
            li = enc.label_idx[i, 0]
            if li < 0:
                assert ans_ids[i] == -1
                continue
            s = runner.answer_table.convert_ans(enc.dataset.label2ans[li])
            if s in set(kept):
                assert ans_ids[i] == kept.index(s)
                checked_in += 1
            else:
                assert ans_ids[i] == -1
                checked_out += 1
        # The synthetic split covers both sides of the filter.
        assert checked_in > 0 and checked_out > 0

        # One epoch end-to-end with the filtered answer space.
        history = runner.train()
        assert np.isfinite(history["eval"][-1])
        assert np.isfinite(history["train"][0]["qa"])

    def test_no_qa_sets_keeps_all(self, tmp_path):
        from rgqa_tpu.pretrain import PretrainRunner

        root, answers, _ = self._make_root(tmp_path)
        cfg = self._cfg(root, tmp_path)  # qa_sets=None
        runner = PretrainRunner(cfg)
        assert runner.answer_table.all_answers() == answers
        ans_ids = runner._ans_cache[runner.train_set]
        assert (ans_ids >= 0).any()


class TestPretrainRunner:
    def test_end_to_end_synthetic(self, tmp_path):
        from rgqa_tpu.pretrain import PretrainRunner

        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=1, r_layers=1,
            num_objects=36, visual_feat_dim=2048,
        )
        cfg = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=enc, max_text_len=12),
            train=TrainConfig(
                batch_size=16, epochs=2, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=str(tmp_path / "gqa"), synthetic=True),
            output=str(tmp_path / "snap"),
        )
        runner = PretrainRunner(cfg)
        history = runner.train()
        assert len(history["eval"]) == 2
        assert np.isfinite(history["eval"][-1])
        losses0 = history["train"][0]
        assert set(losses0) == {"mask_lm", "matched", "obj", "attr", "feat", "qa"}
        import os

        assert os.path.isdir(str(tmp_path / "snap" / "BEST_EVAL_LOSS"))

    def test_train_chunk_trajectory_parity(self, tmp_path):
        """--train_chunk K groups K pretrain steps per dispatch with the
        per-step key splits folded INSIDE the chunk jit — the trajectory
        must be bitwise the per-step loop's (same contract the finetune
        loop pins in tests/test_runner.py)."""
        import dataclasses

        from rgqa_tpu.pretrain import PretrainRunner

        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=1, r_layers=1,
            num_objects=36, visual_feat_dim=2048,
        )
        base = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=enc, max_text_len=12),
            train=TrainConfig(
                batch_size=16, epochs=1, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            data=DataConfig(data_root=str(tmp_path / "gqa"), synthetic=True),
            output=str(tmp_path / "snap1"),
        )
        h1 = PretrainRunner(base).train()
        chunked = base.replace(
            train=dataclasses.replace(base.train, train_chunk=2),
            output=str(tmp_path / "snap2"),
        )
        h2 = PretrainRunner(chunked).train()
        # Identical eval losses => identical parameter trajectories
        # (eval uses a fixed rng and the same data order).
        np.testing.assert_allclose(
            h1["eval"], h2["eval"], rtol=1e-6, atol=1e-7
        )
        for k, v in h1["train"][0].items():
            np.testing.assert_allclose(
                v, h2["train"][0][k], rtol=1e-5, atol=1e-6
            )
