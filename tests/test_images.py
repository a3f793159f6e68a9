"""Raw-image pipeline, pseudo-labels, prepare_data CLI, GloVe loader."""

import json
import os

import numpy as np
import pytest


class TestPixelbert:
    def test_transform_shape_and_range(self, tmp_path):
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        from rgqa_tpu.data.images import GQAImageSource, load_image_batch

        os.makedirs(tmp_path / "imgs", exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(3):
            arr = rng.integers(0, 255, (100 + 20 * i, 300, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / "imgs" / f"img{i}.jpg")
        src = GQAImageSource(str(tmp_path / "imgs"), size=64)
        assert "img0" in src and "nope" not in src
        batch = load_image_batch(src, ["img0", "img1", "img2"])
        assert batch.shape == (3, 64, 64, 3)
        assert batch.min() >= -1.0 and batch.max() <= 1.0

    def test_pad_vs_crop_modes(self):
        from PIL import Image

        from rgqa_tpu.data.images import pixelbert_transform

        rng = np.random.default_rng(3)
        # 300w x 100h landscape; brighten so no real pixel normalizes to 0.
        img = Image.fromarray(
            rng.integers(40, 255, (100, 300, 3), dtype=np.uint8)
        )
        pad = pixelbert_transform(img, 64, mode="pad")
        crop = pixelbert_transform(img, 64, mode="crop")
        assert pad.shape == crop.shape == (64, 64, 3)
        # pad: longer side -> 64, so h = round(100*64/300) = 21 centered
        # rows; the bands above/below are exactly zero.
        row_real = np.abs(pad).sum(axis=(1, 2)) > 0
        assert row_real.sum() == 21
        assert row_real[0] == row_real[-1] == False  # noqa: E712
        assert row_real[32]
        # crop: shorter side -> 64, center crop -- every pixel real.
        assert (np.abs(crop).sum(axis=2) > 0).all()
        # crop center matches pad center content-wise (same image, both
        # bicubic; scales differ so just check both carry real signal).
        assert crop.std() > 0.01 and pad[row_real].std() > 0.01

    def test_normalize_arithmetic_exact(self):
        # Numeric pin of the inception-normalize math
        # (reference src/vilt/transforms/utils.py:47-49: (x/255 - .5)/.5):
        # a constant-value image must map to the exact constant, resize
        # included (a normalized resampling kernel preserves constants).
        from PIL import Image

        from rgqa_tpu.data.images import pixelbert_transform

        for v in (0, 37, 128, 255):
            img = Image.fromarray(np.full((64, 64, 3), v, np.uint8))
            out = pixelbert_transform(img, 64, mode="crop")
            expect = (v / 255.0 - 0.5) / 0.5
            np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_resize_linear_precision(self):
        # Numeric pin of the resize arithmetic: PIL's convolution
        # resampling (BICUBIC, the reference's MinMaxResize kernel) has
        # linear precision, so a horizontal ramp v(x) = 2x downscaled 2x
        # must read v(out j) = 4j + 1 in the interior (output pixel j's
        # center maps to source coordinate 2j + 0.5).  Pinning against
        # the analytic values (not a PIL round-trip) keeps the test
        # non-circular; +-1 absorbs uint8 rounding.
        from PIL import Image

        from rgqa_tpu.data.images import pixelbert_transform

        w, h, size = 128, 128, 64
        ramp = np.broadcast_to(
            (2 * np.arange(w, dtype=np.uint8))[None, :, None], (h, w, 3)
        )
        out = pixelbert_transform(Image.fromarray(np.ascontiguousarray(ramp)), size, mode="crop")
        vals = out[size // 2] * 0.5 + 0.5  # undo normalize -> [0, 1]
        got = vals[:, 0] * 255.0
        expect = 4.0 * np.arange(size) + 1.0
        interior = slice(2, size - 2)  # kernel support clips at borders
        np.testing.assert_allclose(got[interior], expect[interior], atol=1.0)

    def test_resize_size_arithmetic_vs_reference(self):
        # Pin the crop-mode scale choice against the reference's
        # MinMaxResize size arithmetic (src/vilt/transforms/utils.py:
        # 5-26: shorter -> size, longer capped at size*1333/800, both
        # int(x+0.5) then //32*32), re-derived here.  For the typical
        # 4:3 GQA shape both agree exactly; in general ours differs only
        # by the //32 floor (< 32 px on the longer side, pre-crop) until
        # the cap engages.
        from PIL import Image

        from rgqa_tpu.data.images import _resize_keep_ratio

        size = 384
        longer_cap = int((1333 / 800) * size)

        def reference_minmax(w, h):
            scale = size / min(w, h)
            neww, newh = (scale * w, size) if h < w else (size, scale * h)
            if max(newh, neww) > longer_cap:
                s2 = longer_cap / max(newh, neww)
                newh, neww = newh * s2, neww * s2
            neww, newh = int(neww + 0.5), int(newh + 0.5)
            return neww // 32 * 32, newh // 32 * 32

        for w, h in [(500, 375), (375, 500), (400, 400), (640, 480)]:
            img = Image.new("RGB", (w, h))
            ours = _resize_keep_ratio(img, size, by="shorter").size
            ref = reference_minmax(w, h)
            # shorter side: identical scale target
            assert min(ours) == size and min(ref) in (size - 32, size)
            # longer side: within one 32-px floor step while uncapped
            if max(size / min(w, h) * max(w, h), size) <= longer_cap:
                assert 0 <= max(ours) - max(ref) < 32, (w, h, ours, ref)
        # exact agreement on the canonical 4:3 landscape
        assert _resize_keep_ratio(Image.new("RGB", (500, 375)), size, by="shorter").size == reference_minmax(500, 375) == (512, 384)

    def test_randaug_changes_pixels(self, tmp_path):
        from PIL import Image

        from rgqa_tpu.data.images import pixelbert_transform

        rng_img = np.random.default_rng(1)
        img = Image.fromarray(
            rng_img.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        )
        clean = pixelbert_transform(img, 64)
        auged = pixelbert_transform(img, 64, rng=np.random.default_rng(2))
        assert clean.shape == auged.shape == (64, 64, 3)


class TestPixelWireU8:
    """The uint8 pixel transport adds ZERO quantization error vs the
    legacy f32 feed: same f32 normalize expression on device (bitwise
    in eager; <= 1-ulp reciprocal-multiply reassociation under jit),
    pad zeroing and the pad-patch mask carried as rect geometry."""

    def _img(self, w=300, h=100, seed=3):
        from PIL import Image

        rng = np.random.default_rng(seed)
        return Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        )

    def test_u8_split_matches_f32_transform(self):
        from rgqa_tpu.data.images import (
            pixelbert_normalize, pixelbert_transform, pixelbert_u8,
        )

        img = self._img()
        for mode in ("pad", "crop"):
            f32 = pixelbert_transform(img, 64, mode=mode)
            u8, rect = pixelbert_u8(img, 64, mode=mode)
            assert u8.dtype == np.uint8 and rect.dtype == np.int32
            # bit-exact: identical f32 ops on the same uint8 source
            np.testing.assert_array_equal(pixelbert_normalize(u8, rect), f32)
        # pad-mode rect marks the real rows: h = round(100*64/300) = 21
        u8, rect = pixelbert_u8(img, 64, mode="pad")
        assert rect[2] == 21 and rect[3] == 64

    def test_jnp_normalize_bit_exact(self):
        import jax.numpy as jnp

        from rgqa_tpu.data.images import pixelbert_normalize, pixelbert_u8
        from rgqa_tpu.ops.pixels import pixelbert_normalize_jnp

        u8s, rects, hosts = [], [], []
        for mode, seed in (("pad", 0), ("crop", 1), ("pad", 2)):
            u8, rect = pixelbert_u8(self._img(seed=seed), 64, mode=mode)
            u8s.append(u8)
            rects.append(rect)
            hosts.append(pixelbert_normalize(u8, rect))
        got = np.asarray(
            pixelbert_normalize_jnp(
                jnp.asarray(np.stack(u8s)), jnp.asarray(np.stack(rects))
            )
        )
        np.testing.assert_array_equal(got, np.stack(hosts))

    def test_rect_mask_equals_model_content_mask(self):
        import jax.numpy as jnp

        from rgqa_tpu.data.images import (
            pixelbert_normalize, pixelbert_u8, rect_patch_mask,
        )
        from rgqa_tpu.models.vilt import ViltForGQA

        size, patch = 64, 16
        # Shapes that produce full, empty, and PARTIAL boundary patches
        # (h=21 -> patch rows 1..2 partially real).
        u8s, rects = [], []
        for w, h in ((300, 100), (100, 300), (64, 64), (200, 90)):
            u8, rect = pixelbert_u8(self._img(w, h), size, mode="pad")
            u8s.append(u8)
            rects.append(rect)
        u8 = np.stack(u8s)
        rects = np.stack(rects)
        geo = rect_patch_mask(rects, size, patch)
        pixels = np.stack(
            [pixelbert_normalize(a, r) for a, r in zip(u8, rects)]
        )
        model = ViltForGQA.__new__(ViltForGQA)
        object.__setattr__(model, "patch_size", patch)
        content = np.asarray(
            ViltForGQA.patch_valid_mask(model, jnp.asarray(pixels), jnp.int32)
        )
        np.testing.assert_array_equal(geo.astype(np.int32), content)

    def test_vilt_forward_identity_u8_vs_f32(self):
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.config import EncoderConfig, ModelConfig
        from rgqa_tpu.data.images import (
            pixelbert_normalize, pixelbert_u8, rect_patch_mask,
        )
        from rgqa_tpu.models.zoo import build_model, example_batch

        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            vocab_size=128, l_layers=2, x_layers=0, r_layers=0,
        )
        cfg = ModelConfig(
            backbone="vilt", encoder=enc, num_answers=7, max_text_len=6,
            vilt_image_size=64, vilt_patch_size=16,
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=2, seed=0)
        u8s, rects = zip(
            *(pixelbert_u8(self._img(seed=i), 64, mode="pad") for i in range(2))
        )
        u8 = np.stack(u8s)
        rect = np.stack(rects)
        batch["pixels"] = np.stack(
            [pixelbert_normalize(a, r) for a, r in zip(u8, rect)]
        )
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"],
            jb["pixels"],
        )["params"]

        out_f32 = forward(params, jb, deterministic=True)["logits"]
        b8 = {k: v for k, v in jb.items() if k != "pixels"}
        b8["pixels_u8"] = jnp.asarray(u8)
        b8["pixel_rect"] = jnp.asarray(rect)
        b8["pixel_mask"] = jnp.asarray(rect_patch_mask(rect, 64, 16))
        out_u8 = forward(params, b8, deterministic=True)["logits"]
        np.testing.assert_array_equal(np.asarray(out_u8), np.asarray(out_f32))

    def test_clip_normalize_jnp_matches_host(self):
        import jax.numpy as jnp

        from rgqa_tpu.ops.pixels import clip_normalize_jnp
        from rgqa_tpu.scorers.clip import clip_normalize

        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(clip_normalize_jnp(jnp.asarray(u8))),
            clip_normalize(u8),
        )

    def test_pixel_pack_roundtrip(self, tmp_path):
        from PIL import Image

        from rgqa_tpu.data.images import (
            GQAImageSource, PixelPack, load_image_batch_u8, pack_pixels,
        )

        img_root = tmp_path / "imgs"
        os.makedirs(img_root)
        rng = np.random.default_rng(1)
        for i in range(3):
            arr = rng.integers(0, 255, (100, 160 + i, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_root / f"g{i}.jpg")
        pack = pack_pixels(str(img_root), str(tmp_path / "pack"), size=64)
        assert sorted(pack.img_ids) == ["g0", "g1", "g2"]
        src = GQAImageSource(str(img_root), size=64)
        for g in pack.img_ids:
            pu8, prect = pack.load_u8(g)
            su8, srect = src.load_u8(g)
            np.testing.assert_array_equal(pu8, su8)
            np.testing.assert_array_equal(prect, srect)
            np.testing.assert_array_equal(pack.load(g), src.load(g))
        # reopen from disk + batch loader over the pack
        pack2 = PixelPack(str(tmp_path / "pack"))
        u8, rects = load_image_batch_u8(pack2, ["g2", "g0"])
        assert u8.shape == (2, 64, 64, 3) and rects.shape == (2, 4)
        with pytest.raises(ValueError):
            pack2.load_u8("g0", rng=np.random.default_rng(0))


class TestGlove:
    def test_build_matrix(self, tmp_path):
        from rgqa_tpu.models.butd import build_glove_matrix

        glove = tmp_path / "glove.txt"
        glove.write_text(
            "dog " + " ".join(["0.5"] * 4) + "\n"
            "cat " + " ".join(["-0.25"] * 4) + "\n"
        )
        w2i = {"dog": 0, "zebra": 1, "cat": 2}
        m = build_glove_matrix(w2i, str(glove), dim=4)
        assert m.shape == (4, 4)  # 3 words + padding row
        np.testing.assert_allclose(m[0], 0.5)
        np.testing.assert_allclose(m[1], 0.0)  # OOV
        np.testing.assert_allclose(m[2], -0.25)
        np.testing.assert_allclose(m[3], 0.0)  # padding


class TestButdPreprocessCache:
    """Reference ``butd/preprocess.py:54-123`` caches the question
    dictionary + GloVe matrix to ``data/butd/``; the rebuild must hit the
    same cache instead of re-scanning every split JSON per process."""

    @pytest.fixture()
    def root(self, tmp_path):
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(
            root,
            SyntheticSpec(n_images=8, n_train=16, n_valid=8, n_testdev=8),
        )
        return root

    def _dummy(self, root):
        from types import SimpleNamespace

        from rgqa_tpu.config import DataConfig, RunConfig

        cfg = RunConfig(data=DataConfig(data_root=root, synthetic=True))
        return SimpleNamespace(cfg=cfg)

    def test_dictionary_cache_hit(self, root):
        import json
        import os

        from rgqa_tpu.runner import GQARunner

        dummy = self._dummy(root)
        words = GQARunner._butd_dictionary(dummy, root)
        cache = os.path.join(root, "butd", "dictionary.json")
        assert os.path.exists(cache)
        # Mutate a split on disk: a cache HIT must ignore the new word.
        with open(os.path.join(root, "train.json")) as f:
            rows = json.load(f)
        rows.append(dict(rows[0], sent="zzz_new_word here", question_id="q_zzz"))
        with open(os.path.join(root, "train.json"), "w") as f:
            json.dump(rows, f)
        again = GQARunner._butd_dictionary(dummy, root)
        assert again == words
        assert "zzz_new_word" not in again
        # A different split list changes the key -> rebuild sees the word.
        import dataclasses

        dummy.cfg = dummy.cfg.replace(
            data=dataclasses.replace(dummy.cfg.data, test_splits="extra")
        )
        rebuilt = GQARunner._butd_dictionary(dummy, root)
        assert "zzz_new_word" in rebuilt

    def test_glove_init_and_cache(self, root, tmp_path):
        import os

        from rgqa_tpu.config import (
            DataConfig,
            ModelConfig,
            RunConfig,
            TrainConfig,
        )
        from rgqa_tpu.runner import GQARunner, np_params

        dummy = self._dummy(root)
        words = GQARunner._butd_dictionary(dummy, root)
        first = next(iter(words))
        dim = 4
        os.makedirs(os.path.join(root, "butd"), exist_ok=True)
        with open(os.path.join(root, "butd", "glove.6B.300d.txt"), "w") as f:
            f.write(first + " " + " ".join(["0.625"] * dim) + "\n")

        cfg = RunConfig(
            model=ModelConfig(
                backbone="butd", butd_embed_dim=dim, butd_hidden_dim=8,
                max_text_len=12,
            ),
            train=TrainConfig(batch_size=4, epochs=1, use_bf16=False),
            data=DataConfig(data_root=root, synthetic=True),
            output=str(tmp_path / "snap_butd"),
        )
        runner = GQARunner(cfg, init_train=False)
        emb = np_params(runner.params)["w_emb"]["embedding"]
        np.testing.assert_allclose(emb[words[first]], 0.625)
        npy = os.path.join(root, "butd", "glove.npy")
        assert os.path.exists(npy)
        # Overwrite the npy cache with a sentinel: a second construction
        # must consume the cache, not rebuild from the txt.
        sentinel = np.full((len(words) + 1, dim), -1.5, np.float32)
        np.save(npy, sentinel)
        runner2 = GQARunner(cfg, init_train=False)
        emb2 = np_params(runner2.params)["w_emb"]["embedding"]
        np.testing.assert_allclose(emb2[words[first]], -1.5)
        # A CHANGED GloVe txt must invalidate the cache (the meta
        # fingerprint covers path/mtime/size): the sentinel is dropped
        # and the new vectors load.
        glove_txt = os.path.join(root, "butd", "glove.6B.300d.txt")
        with open(glove_txt, "w") as f:
            f.write(first + " " + " ".join(["0.875"] * dim) + "\n")
        os.utime(glove_txt, (1, 1))  # force a distinct mtime
        runner3 = GQARunner(cfg, init_train=False)
        emb3 = np_params(runner3.params)["w_emb"]["embedding"]
        np.testing.assert_allclose(emb3[words[first]], 0.875)

    def test_dictionary_rebuilds_when_missing_split_appears(self, root):
        import json
        import os
        import shutil

        from rgqa_tpu.runner import GQARunner

        dummy = self._dummy(root)
        # Hide a configured split, build (partial vocab cached), then
        # restore it: the cache key includes which files existed, so the
        # next build must pick up the restored split's words.
        valid = os.path.join(root, "valid.json")
        hidden = os.path.join(root, "valid.json.hidden")
        shutil.move(valid, hidden)
        partial = GQARunner._butd_dictionary(dummy, root)
        shutil.move(hidden, valid)
        with open(valid) as f:
            rows = json.load(f)
        rows.append(
            dict(rows[0], sent="qqq_fresh token", question_id="q_fresh")
        )
        with open(valid, "w") as f:
            json.dump(rows, f)
        rebuilt = GQARunner._butd_dictionary(dummy, root)
        assert "qqq_fresh" in rebuilt
        assert set(partial) <= set(rebuilt)


class TestPrepareData:
    def test_end_to_end(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_native import _write_tsv

        tsv = str(tmp_path / "feat.tsv")
        _write_tsv(tsv, n_rows=5, feat_dim=16)
        json_dir = tmp_path / "jsons"
        os.makedirs(json_dir)
        (json_dir / "train.json").write_text(json.dumps([]))
        (json_dir / "trainval_ans2label.json").write_text(json.dumps({"a": 0}))
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\nhello\n")

        from rgqa_tpu.cli.prepare_data import main

        out = str(tmp_path / "packed_root")
        main([
            "--tsv", tsv, "--json_dir", str(json_dir),
            "--vocab", str(vocab), "--out", out, "--num_boxes", "36",
        ])
        assert os.path.exists(os.path.join(out, "train.json"))
        assert os.path.exists(os.path.join(out, "vocab.txt"))
        from rgqa_tpu.data import PackedFeatures

        packed = PackedFeatures(os.path.join(out, "features"))
        assert len(packed) == 5
        assert packed.features.shape[2] == 16


class TestClipPixelPack:
    def test_clip_pack_rows_and_meta(self, tmp_path):
        from PIL import Image

        from rgqa_tpu.data.images import PixelPack, pack_pixels
        from rgqa_tpu.scorers.clip import clip_resize_crop

        img_root = tmp_path / "imgs"
        os.makedirs(img_root)
        rng = np.random.default_rng(5)
        for i in range(3):
            arr = rng.integers(0, 255, (50, 80 + i, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_root / f"c{i}.jpg")
        pack = pack_pixels(
            str(img_root), str(tmp_path / "pack"), size=32, transform="clip"
        )
        assert pack.transform == "clip" and pack.size == 32
        for g in pack.img_ids:
            with Image.open(img_root / f"{g}.jpg") as im:
                expect = clip_resize_crop(im, 32)
            u8, rect = pack.load_u8(g)
            np.testing.assert_array_equal(u8, expect)
            np.testing.assert_array_equal(rect, [0, 0, 32, 32])
        # pixelbert normalize does not apply to clip rows
        with pytest.raises(ValueError, match="pixelbert_normalize"):
            pack.load("c0")
        # transform survives reopen
        assert PixelPack(str(tmp_path / "pack")).transform == "clip"


class TestPixelPackSourceMatch:
    """Pack auto-detection must require the pack to be built from the
    exact image root being scored — a stale/foreign pack is silently
    wrong pixels, not a cache hit."""

    def _root(self, tmp_path):
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(
            root,
            SyntheticSpec(n_images=8, n_train=16, n_valid=8, n_testdev=8,
                          num_boxes=6, feat_dim=64),
        )
        return root

    def test_matches_source(self, tmp_path):
        from PIL import Image

        from rgqa_tpu.data.images import pack_pixels

        img_root = tmp_path / "imgs"
        os.makedirs(img_root)
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            img_root / "a.jpg"
        )
        pack = pack_pixels(str(img_root), str(tmp_path / "p"), size=32)
        assert pack.matches_source(str(img_root))
        assert pack.matches_source(str(tmp_path / "x" / ".." / "imgs"))
        assert not pack.matches_source(str(tmp_path))
        # packs without a recorded source never match
        meta = os.path.join(str(tmp_path / "p"), "meta.json")
        m = json.load(open(meta))
        del m["img_root"]
        json.dump(m, open(meta, "w"))
        from rgqa_tpu.data.images import PixelPack

        assert not PixelPack(str(tmp_path / "p")).matches_source(
            str(img_root)
        )

    def test_runner_vilt_pack_autodetect_and_foreign_reject(self, tmp_path):
        from rgqa_tpu.config import (
            DataConfig, EncoderConfig, ModelConfig, RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import GQADataset
        from rgqa_tpu.data.images import GQAImageSource, PixelPack, pack_pixels
        from rgqa_tpu.runner import GQARunner

        root = self._root(tmp_path)
        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=0, r_layers=0,
        )
        cfg = RunConfig(
            model=ModelConfig(backbone="vilt", encoder=enc, max_text_len=8,
                              vilt_image_size=64, vilt_patch_size=16),
            train=TrainConfig(batch_size=8, use_bf16=False),
            data=DataConfig(data_root=root, synthetic=True,
                            test_splits="testdev"),
            output=str(tmp_path / "snap"),
        )
        runner = GQARunner(cfg, init_train=False)
        ds = GQADataset(root, "testdev", add_uq=True)
        # no pack -> JPEG source
        assert isinstance(runner._encode(ds).image_source, GQAImageSource)
        # matching pack -> picked up
        pack_pixels(
            os.path.join(root, "images"),
            os.path.join(root, "pixels_64_pad"), size=64,
        )
        assert isinstance(runner._encode(ds).image_source, PixelPack)
        # foreign source recorded -> rejected, decode path kept
        meta = os.path.join(root, "pixels_64_pad", "meta.json")
        m = json.load(open(meta))
        m["img_root"] = "/somewhere/else/images"
        json.dump(m, open(meta, "w"))
        assert isinstance(runner._encode(ds).image_source, GQAImageSource)


class TestViltTrainRandaug:
    """Reference parity: the ViLT dataset applies pixelbert_randaug at
    train time (gqa_data.py:341).  Train encodes thread an augment rng
    into the image loads; eval pixels stay deterministic."""

    def _runner(self, tmp_path, **data_kw):
        from rgqa_tpu.config import (
            DataConfig, EncoderConfig, ModelConfig, RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.runner import GQARunner

        root = str(tmp_path / "gqa")
        if not os.path.exists(root):
            make_synthetic_gqa(
                root,
                SyntheticSpec(n_images=8, n_train=16, n_valid=8,
                              n_testdev=8, num_boxes=6, feat_dim=64),
            )
        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=0, r_layers=0,
        )
        cfg = RunConfig(
            model=ModelConfig(backbone="vilt", encoder=enc, max_text_len=8,
                              vilt_image_size=64, vilt_patch_size=16),
            train=TrainConfig(batch_size=8, use_bf16=False),
            data=DataConfig(data_root=root, synthetic=True,
                            test_splits="testdev", **data_kw),
            output=str(tmp_path / "snap"),
        )
        return GQARunner(cfg), root

    def test_train_augments_eval_does_not(self, tmp_path):
        runner, root = self._runner(tmp_path)
        assert runner.train_set.image_augment_rng is not None
        idx = np.arange(4)
        a = runner.train_set.gather_batch(idx)["pixels_u8"]
        b = runner.train_set.gather_batch(idx)["pixels_u8"]
        assert not np.array_equal(a, b)  # photometric aug varies
        assert runner.valid_set.image_augment_rng is None
        va = runner.valid_set.gather_batch(idx)["pixels_u8"]
        vb = runner.valid_set.gather_batch(idx)["pixels_u8"]
        np.testing.assert_array_equal(va, vb)

    def test_no_randaug_flag_disables(self, tmp_path):
        runner, _ = self._runner(tmp_path, vilt_randaug=False)
        assert runner.train_set.image_augment_rng is None
        idx = np.arange(4)
        a = runner.train_set.gather_batch(idx)["pixels_u8"]
        b = runner.train_set.gather_batch(idx)["pixels_u8"]
        np.testing.assert_array_equal(a, b)

    def test_train_split_skips_pack_when_augmenting(self, tmp_path):
        from rgqa_tpu.data.images import GQAImageSource, PixelPack, pack_pixels

        runner, root = self._runner(tmp_path)
        pack_pixels(
            os.path.join(root, "images"),
            os.path.join(root, "pixels_64_pad"), size=64,
        )
        from rgqa_tpu.data import GQADataset

        train_ds = GQADataset(root, "train", add_uq=True)
        tr = runner._encode(train_ds, train=True)
        assert isinstance(tr.image_source, GQAImageSource)  # raw for aug
        ev = runner._encode(GQADataset(root, "testdev", add_uq=True))
        assert isinstance(ev.image_source, PixelPack)  # eval rides the pack
