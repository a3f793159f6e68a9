"""Dataset/encoding/batching tests over the synthetic GQA tree."""

import numpy as np
import pytest

from rgqa_tpu.data import (
    EncodedGQA,
    GQADataset,
    PackedFeatures,
    SyntheticSpec,
    WordPieceTokenizer,
    batch_iterator,
    make_synthetic_gqa,
)
from rgqa_tpu.data.dataset import UQ_ANSWER, build_targets
from rgqa_tpu.data.tokenizer import load_vocab
from rgqa_tpu.models.uniter import uniter_box_transform


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa"))
    info = make_synthetic_gqa(root, SyntheticSpec(n_images=16, n_train=64, n_valid=16, n_testdev=32))
    return info


@pytest.fixture(scope="module")
def tokenizer(synth):
    return WordPieceTokenizer(load_vocab(synth["vocab"]))


class TestGQADataset:
    def test_loads_splits_and_vocab(self, synth):
        ds = GQADataset(synth["root"], "train,valid")
        assert len(ds) == 80
        assert ds.num_answers == synth["num_answers"]
        qid = ds.data[0]["question_id"]
        assert ds.id2datum[qid] is ds.data[0]

    def test_add_uq_appends_last_class(self, synth):
        ds = GQADataset(synth["root"], "train", add_uq=True)
        assert ds.label2ans[-1] == UQ_ANSWER
        assert ds.ans2label[UQ_ANSWER] == ds.num_answers - 1
        assert ds.num_answers == synth["num_answers"] + 1


class TestEncodedGQA:
    def test_encode_and_batch(self, synth, tokenizer):
        ds = GQADataset(synth["root"], "train", add_uq=True)
        feats = PackedFeatures(synth["features"])
        enc = EncodedGQA(ds, feats, tokenizer=tokenizer, max_text_len=20)
        assert len(enc) == 64
        assert enc.input_ids.shape == (64, 20)

        qids, batch, real = next(iter(batch_iterator(enc, 16)))
        assert real == 16
        assert batch["feats"].shape == (16, 36, 2048)
        assert batch["boxes"].shape == (16, 36, 4)
        assert batch["boxes"].min() >= 0.0 and batch["boxes"].max() <= 1.0
        # UQ-extended vocab: target sliced to real answers, id_mask present.
        assert batch["target"].shape == (16, synth["num_answers"])
        assert batch["id_mask"].shape == (16,)
        np.testing.assert_array_equal(batch["id_mask"], 1.0)  # train = all AQ

    def test_uq_split_id_mask_zero(self, synth, tokenizer):
        ds = GQADataset(synth["root"], "train_uq", add_uq=True)
        feats = PackedFeatures(synth["features"])
        enc = EncodedGQA(ds, feats, tokenizer=tokenizer)
        _, batch, _ = next(iter(batch_iterator(enc, 8)))
        np.testing.assert_array_equal(batch["id_mask"], 0.0)
        np.testing.assert_array_equal(batch["target"], 0.0)

    def test_final_batch_padded(self, synth, tokenizer):
        ds = GQADataset(synth["root"], "testdev", add_uq=True)
        feats = PackedFeatures(synth["features"])
        enc = EncodedGQA(ds, feats, tokenizer=tokenizer)
        batches = list(batch_iterator(enc, 24))
        assert len(batches) == 2
        _, last, real = batches[-1]
        assert last["input_ids"].shape == (24, 20)
        assert real == 32 - 24

    def test_uniter_boxes_are_7d_pixel(self, synth, tokenizer):
        ds = GQADataset(synth["root"], "valid", add_uq=True)
        feats = PackedFeatures(synth["features"])
        enc = EncodedGQA(ds, feats, tokenizer=tokenizer, backbone="uniter")
        _, batch, _ = next(iter(batch_iterator(enc, 8)))
        assert batch["boxes"].shape[-1] == 7
        # Pixel-space (reference feeds raw boxes to _uniterBoxes).
        assert batch["boxes"][..., :4].max() > 2.0


class TestUniterBoxTransform:
    def test_matches_reference_column_order(self):
        # Reference _uniterBoxes (gqa_data.py:240-250):
        # out = (y1, x1, y2, x2, x2-x1, y2-y1, (x2-x1)*(y2-y1)).
        box = np.array([[10.0, 20.0, 110.0, 70.0]])  # x1,y1,x2,y2
        out = uniter_box_transform(box)
        np.testing.assert_allclose(
            out[0], [20.0, 10.0, 70.0, 110.0, 100.0, 50.0, 5000.0]
        )


class TestBuildTargets:
    def test_scatter(self):
        idx = np.array([[0, 2, -1], [1, -1, -1]], np.int32)
        score = np.array([[1.0, 0.5, 0.0], [0.3, 0.0, 0.0]], np.float32)
        t = build_targets(idx, score, 4)
        np.testing.assert_allclose(
            t, [[1.0, 0.0, 0.5, 0.0], [0.0, 0.3, 0.0, 0.0]]
        )


class TestTinyFast:
    def test_truncated_view(self, synth):
        from rgqa_tpu.data import PackedFeatures

        feats = PackedFeatures(synth["features"])
        view = feats.truncate(4)
        assert len(view) == 4
        assert view.features.shape[0] == 4
        # Full view unaffected; truncate beyond size is a no-op.
        assert len(feats) == 16
        assert feats.truncate(99) is feats
        row = view.row(view.img_ids[1])
        np.testing.assert_array_equal(row["features"], feats.row(feats.img_ids[1])["features"])


class TestFromRows:
    def test_in_memory_dataset(self, synth):
        rows = [
            {"img_id": "img00000", "question_id": "m1", "sent": "is there a dog ?"},
        ]
        ds = GQADataset.from_rows(
            rows, ans2label={"a": 0, "b": 1}, label2ans=["a", "b"]
        )
        assert len(ds) == 1
        assert ds.id2datum["m1"]["sent"].startswith("is there")
        assert ds.num_answers == 2


class TestPrefetchErrors:
    def test_worker_exception_propagates(self):
        from rgqa_tpu.data.batching import device_prefetch

        def bad_iter():
            yield ["q0"], {"x": np.zeros((2, 2), np.float32)}, 2
            raise RuntimeError("boom")

        it = device_prefetch(bad_iter(), None, depth=1)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)


class TestFeedBf16:
    def test_bulk_float_keys_cast_others_untouched(self):
        import jax.numpy as jnp

        from rgqa_tpu.data.batching import device_prefetch

        def batches():
            yield ["q0"], {
                "feats": np.ones((2, 4, 8), np.float32),
                "boxes": np.ones((2, 4, 4), np.float32),
                "input_ids": np.ones((2, 3), np.int32),
            }, 2

        _, dev, _ = next(device_prefetch(batches(), None, feed_bf16=True))
        assert dev["feats"].dtype == jnp.bfloat16
        # Only the bulk payloads are halved; small floats stay f32.
        assert dev["boxes"].dtype == jnp.float32
        assert dev["input_ids"].dtype == jnp.int32

        _, dev32, _ = next(device_prefetch(batches(), None))
        assert dev32["feats"].dtype == jnp.float32


class TestPipelinedMap:
    def test_order_and_values(self):
        import jax.numpy as jnp

        from rgqa_tpu.data.batching import pipelined_map

        def batches():
            for i in range(7):
                yield [f"q{i}"], {"x": jnp.full((3,), i, jnp.float32)}, 3

        seen = list(
            pipelined_map(lambda b: {"y": b["x"] * 2}, batches(), lag=3)
        )
        assert [q for q, _, _ in seen] == [[f"q{i}"] for i in range(7)]
        for i, (_, out, real) in enumerate(seen):
            assert real == 3
            assert isinstance(out["y"], np.ndarray)
            assert out["y"].tolist() == [2.0 * i] * 3

    def test_fewer_batches_than_lag(self):
        import jax.numpy as jnp

        from rgqa_tpu.data.batching import pipelined_map

        def batches():
            yield ["q0"], jnp.ones((2,)), 2

        out = list(pipelined_map(lambda b: b + 1, batches(), lag=8))
        assert len(out) == 1
        assert out[0][1].tolist() == [2.0, 2.0]


class TestChunkedMap:
    """chunked_map must be stream-equivalent to pipelined_map at every
    (chunk, n_batches) combination, including the padded partial group."""

    @staticmethod
    def _batches(n):
        import jax.numpy as jnp

        for i in range(n):
            yield [f"q{i}"], {"x": jnp.full((3,), i, jnp.float32)}, 3 - (i % 2)

    def test_matches_pipelined(self):
        from rgqa_tpu.data.batching import chunked_map, pipelined_map

        fn = lambda b: {"y": b["x"] * 2 + 1}  # noqa: E731
        for n in (1, 2, 5, 7, 8):
            ref = list(pipelined_map(fn, self._batches(n)))
            for chunk in (1, 2, 3, 4):
                got = list(chunked_map(fn, self._batches(n), chunk=chunk))
                assert [q for q, _, _ in got] == [q for q, _, _ in ref], (n, chunk)
                assert [r for _, _, r in got] == [r for _, _, r in ref], (n, chunk)
                for (_, a, _), (_, b, _) in zip(got, ref):
                    assert isinstance(a["y"], np.ndarray)
                    np.testing.assert_array_equal(a["y"], b["y"])

    def test_runner_cache_reuse_and_collectable(self):
        # The scan wrapper is the per-process compile unit: the same
        # step_fn object must get the same wrapper (serving waves reuse
        # one scorer), distinct (select, captures-mode) must not collide,
        # and dropping the step_fn must release the cache entry (the
        # wrapper holds only a weakref to its key).
        import gc
        import weakref

        from rgqa_tpu.data.batching import _chunk_runner

        fn = lambda c, b: {"y": b["x"], "z": b["x"]}  # noqa: E731
        r1 = _chunk_runner(fn, ("y",), True)
        assert _chunk_runner(fn, ("y",), True) is r1
        assert _chunk_runner(fn, ("z",), True) is not r1
        assert _chunk_runner(fn, ("y",), False) is not r1
        ref = weakref.ref(fn)
        del fn, r1
        gc.collect()
        assert ref() is None

    def test_captures_not_closed_over(self):
        # captures flow through as jit arguments: the same step_fn with
        # different captures must produce different results without
        # retracing issues.
        import jax.numpy as jnp

        from rgqa_tpu.data.batching import chunked_map

        step = lambda c, b: {"y": b["x"] + c}  # noqa: E731
        for cap, expect0 in ((jnp.float32(10.0), 10.0), (jnp.float32(20.0), 20.0)):
            out = list(
                chunked_map(step, self._batches(4), chunk=2, captures=cap)
            )
            assert out[0][1]["y"].tolist() == [expect0] * 3

    def test_grad_scorer_traceable(self):
        # The grad-at-eval scorers (ODIN/Maha) run jax.grad inside the
        # step fn; it must trace through the chunked scan.
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.data.batching import chunked_map

        def fn(b):
            g = jax.grad(lambda x: jnp.sum(x**2))(b["x"])
            return {"g": g}

        got = list(chunked_map(fn, self._batches(5), chunk=2))
        assert len(got) == 5
        for i, (_, out, _) in enumerate(got):
            np.testing.assert_allclose(out["g"], np.full((3,), 2.0 * i))


