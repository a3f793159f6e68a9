"""TSV decode/pack round-trip and config CLI tests."""

import base64
import os

import numpy as np
import pytest

from rgqa_tpu.config import parse_cli
from rgqa_tpu.data.tsv import PackedFeatures, load_obj_tsv, pack_obj_tsv


def make_tsv(path, n_images=5, n_boxes=36, feat_dim=64, rng=None):
    rng = rng or np.random.default_rng(0)
    rows = []
    for i in range(n_images):
        feats = rng.standard_normal((n_boxes, feat_dim)).astype(np.float32)
        boxes = np.abs(rng.standard_normal((n_boxes, 4))).astype(np.float32)
        oid = rng.integers(0, 1600, n_boxes).astype(np.int64)
        oconf = rng.random(n_boxes).astype(np.float32)
        aid = rng.integers(0, 400, n_boxes).astype(np.int64)
        aconf = rng.random(n_boxes).astype(np.float32)
        enc = lambda a: base64.b64encode(a.tobytes()).decode()
        rows.append(
            "\t".join(
                [
                    f"img{i}",
                    "480",
                    "640",
                    enc(oid),
                    enc(oconf),
                    enc(aid),
                    enc(aconf),
                    str(n_boxes),
                    enc(boxes),
                    enc(feats),
                ]
            )
        )
    path.write_text("\n".join(rows) + "\n")
    return path


class TestTSV:
    def test_load_decodes_shapes(self, tmp_path):
        tsv = make_tsv(tmp_path / "feats.tsv", n_images=3, feat_dim=32)
        rows = load_obj_tsv(str(tsv))
        assert len(rows) == 3
        r = rows[0]
        assert r["features"].shape == (36, 32)
        assert r["boxes"].shape == (36, 4)
        assert r["objects_id"].dtype == np.int64
        assert r["img_h"] == 480 and r["img_w"] == 640

    def test_topk(self, tmp_path):
        tsv = make_tsv(tmp_path / "feats.tsv", n_images=5)
        assert len(load_obj_tsv(str(tsv), topk=2)) == 2

    def test_pack_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        tsv = make_tsv(tmp_path / "feats.tsv", n_images=4, feat_dim=16, rng=rng)
        raw = load_obj_tsv(str(tsv))
        packed = pack_obj_tsv(str(tsv), str(tmp_path / "packed"), num_boxes=36)
        assert len(packed) == 4
        for row in raw:
            p = packed.row(row["img_id"])
            np.testing.assert_array_equal(p["features"], row["features"])
            np.testing.assert_array_equal(p["boxes"], row["boxes"])
            np.testing.assert_array_equal(p["objects_id"], row["objects_id"])

        # Reopen from disk: memory-mapped load.
        reopened = PackedFeatures(str(tmp_path / "packed"))
        np.testing.assert_array_equal(
            reopened.features[:], packed.features[:]
        )

    def test_pack_int8(self, tmp_path):
        """int8 pack (prepare_data --int8): features stored as per-RoI
        int8 + scales, read back through the dequantizing f32 view within
        the quantization tolerance; --feed_int8 re-quantization of the
        dequantized values round-trips to the stored ints."""
        from rgqa_tpu.data.batching import quantize_feats

        rng = np.random.default_rng(11)
        tsv = make_tsv(tmp_path / "feats.tsv", n_images=4, feat_dim=16, rng=rng)
        raw = load_obj_tsv(str(tsv))
        packed = pack_obj_tsv(
            str(tsv), str(tmp_path / "packed8"), num_boxes=36, int8=True
        )
        assert packed.int8
        assert not os.path.exists(tmp_path / "packed8" / "features.npy")
        assert packed.features_q.dtype == np.int8
        for row in raw:
            p = packed.row(row["img_id"])
            assert p["features"].dtype == np.float32
            f = row["features"]
            n = f.shape[0] if f.shape[0] < 36 else 36
            # Per-RoI symmetric int8: error bounded by scale/2 per element.
            tol = (np.abs(f[:n]).max(axis=-1, keepdims=True) / 127.0) * 0.51
            assert np.all(np.abs(p["features"][:n] - f[:n]) <= tol + 1e-9)
            np.testing.assert_array_equal(p["boxes"], row["boxes"])

        # Reopen + truncate keep the int8 layout (no eager f32 blowup).
        reopened = PackedFeatures(str(tmp_path / "packed8"))
        assert reopened.int8
        view = reopened.truncate(2)
        assert view.int8 and len(view) == 2
        np.testing.assert_array_equal(view.features[:], reopened.features[:2])

        # Transport re-quantization (--feed_int8 over an int8 pack)
        # reproduces the stored ints — no double-quantization drift.
        feats = reopened.features[:]
        q2, s2 = quantize_feats(feats)
        np.testing.assert_array_equal(q2, np.asarray(reopened.features_q))

    def test_repack_format_switch_removes_stale_files(self, tmp_path):
        """Re-packing into a directory that held the OTHER feature format
        must remove the stale files — PackedFeatures prefers features.npy
        when both exist, so a leftover f32 array would silently serve old
        data after an --int8 repack (and vice versa)."""
        rng = np.random.default_rng(3)
        tsv1 = make_tsv(tmp_path / "a.tsv", n_images=2, feat_dim=8, rng=rng)
        tsv2 = make_tsv(tmp_path / "b.tsv", n_images=2, feat_dim=8, rng=rng)
        out = str(tmp_path / "pack")
        pack_obj_tsv(str(tsv1), out, num_boxes=36)
        p8 = pack_obj_tsv(str(tsv2), out, num_boxes=36, int8=True)
        assert p8.int8
        assert not os.path.exists(os.path.join(out, "features.npy"))
        fresh = load_obj_tsv(str(tsv2))[0]
        got = PackedFeatures(out).row(fresh["img_id"])["features"]
        n = min(fresh["features"].shape[0], 36)
        tol = np.abs(fresh["features"][:n]).max() / 127.0
        assert np.all(np.abs(got[:n] - fresh["features"][:n]) <= tol)
        # ...and back to f32 removes the int8 pair.
        pf = pack_obj_tsv(str(tsv1), out, num_boxes=36)
        assert not pf.int8
        assert not os.path.exists(os.path.join(out, "features_q.npy"))
        raw1 = load_obj_tsv(str(tsv1))[0]
        n1 = min(raw1["features"].shape[0], 36)
        np.testing.assert_array_equal(
            PackedFeatures(out).row(raw1["img_id"])["features"][:n1],
            raw1["features"][:n1],
        )


class TestConfigCLI:
    def test_reference_flag_names(self):
        cfg, ns = parse_cli(
            [
                "--llayers", "9", "--xlayers", "5", "--rlayers", "5",
                "--batchSize", "32", "--lr", "1e-5", "--epochs", "4",
                "--loadLXMERTQA", "snap/pretrained/model",
                "--tau", "0.3", "--temperature", "1e5", "--noise", "1e-4",
                "--sample_pair", "--tiny", "--mceLoss",
                "--seed_list", "1,2,3",
            ]
        )
        assert cfg.model.encoder.l_layers == 9
        assert cfg.train.batch_size == 32
        assert cfg.train.optim.lr == pytest.approx(1e-5)
        assert cfg.load_lxmert_qa == "snap/pretrained/model"
        assert cfg.ood.tau == pytest.approx(0.3)
        assert cfg.ood.temperature == pytest.approx(1e5)
        assert cfg.train.sample_pair is True
        assert cfg.data.tiny is True
        assert cfg.train.loss == "mce"
        assert cfg.ood.seed_list == (1, 2, 3)

    def test_defaults_match_reference(self):
        cfg, _ = parse_cli([])
        assert cfg.model.encoder.l_layers == 9
        assert cfg.model.encoder.x_layers == 5
        assert cfg.model.encoder.r_layers == 5
        assert cfg.ood.tau == 0.5
        assert cfg.train.seed == 9595
        assert cfg.train.optim.grad_clip == 5.0
