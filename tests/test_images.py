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
