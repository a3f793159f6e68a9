"""End-to-end runner tests: synthetic data -> train -> reject-score -> metrics.

The reference's quality bar (SURVEY.md §4) is checkpoint/golden parity plus
smoke runs; here the full loop runs in-process on the CPU mesh, and the
dumped prediction JSON round-trips through the metric stack (and the
reference CLI's contract).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rgqa_tpu.config import (
    DataConfig,
    EncoderConfig,
    ModelConfig,
    OODConfig,
    OptimConfig,
    RunConfig,
    TrainConfig,
)
from rgqa_tpu.data import GQADataset, SyntheticSpec, make_synthetic_gqa
from rgqa_tpu.runner import GQARunner

TINY_ENC = EncoderConfig(
    hidden_size=32,
    num_heads=4,
    intermediate_size=64,
    l_layers=1,
    x_layers=1,
    r_layers=1,
    num_objects=36,
    visual_feat_dim=2048,
    hidden_dropout=0.1,
    attention_dropout=0.1,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gqa_e2e"))
    make_synthetic_gqa(
        root, SyntheticSpec(n_images=24, n_train=96, n_valid=24, n_testdev=48)
    )
    return root


def _cfg(root, out, **train_kw):
    train_kw = {
        "batch_size": 16,
        "epochs": 5,
        "optim": OptimConfig(lr=3e-3),
        "use_bf16": False,
        **train_kw,
    }
    return RunConfig(
        model=ModelConfig(backbone="lxmert", encoder=TINY_ENC, max_text_len=12),
        train=TrainConfig(**train_kw),
        ood=OODConfig(scorer="msp"),
        data=DataConfig(data_root=root, test_splits="testdev", synthetic=True),
        output=out,
    )


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snap"))
    runner = GQARunner(_cfg(synth_root, out))
    history = runner.train()
    return runner, history, out


class TestTrainLoop:
    def test_loss_decreases_and_checkpoints_exist(self, trained):
        runner, history, out = trained
        assert history["loss"][-1] < history["loss"][0] * 1.5
        assert os.path.isdir(os.path.join(out, "LAST"))
        assert os.path.exists(os.path.join(out, "log.log"))

    def test_valid_accuracy_above_chance(self, trained):
        runner, history, _ = trained
        # 38 answers; the synthetic signal should lift it well above 1/38.
        assert history["valid"][-1] > 0.10

    def test_train_chunk_trajectory_identical(self, synth_root, tmp_path):
        # --train_chunk scans K optimizer steps per dispatch using the
        # SAME per-step key sequence as the plain loop — losses and final
        # params must match (3 batches/epoch at chunk 2 also exercises
        # the partial-group per-step fallback).
        import jax

        def run(train_chunk, out):
            cfg = _cfg(
                synth_root, out, epochs=2, batch_size=32,
                train_chunk=train_chunk, chart=True,
            )
            runner = GQARunner(cfg)
            history = runner.train()
            return history, runner.params

        h1, p1 = run(1, str(tmp_path / "plain"))
        h2, p2 = run(2, str(tmp_path / "chunked"))
        np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            p1, p2,
        )
        # chart pickles exist for both (per-member aux unpacking works)
        assert os.path.exists(
            os.path.join(str(tmp_path / "chunked"), "chart", "epoch_0.pkl")
        )

    def test_predict_invariant_to_eval_chunk(self, trained, synth_root):
        # --eval_chunk (batches per device dispatch, chunked_map) is a
        # serving-dispatch knob; it must not change any prediction.
        import dataclasses

        runner, _, _ = trained
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        encoded = runner._encode(ds)
        base = runner.predict(encoded)
        base_scores = runner.score_split(encoded)
        old_cfg = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                train=dataclasses.replace(old_cfg.train, eval_chunk=3),
            )
            assert runner.predict(encoded) == base
            chunked_scores = runner.score_split(encoded)
        finally:
            runner.cfg = old_cfg
        assert chunked_scores.keys() == base_scores.keys()
        for qid, (ans, s) in base_scores.items():
            ans2, s2 = chunked_scores[qid]
            assert ans2 == ans
            np.testing.assert_allclose(s2, s, rtol=1e-5)

    def test_feed_int8_roundtrip_bound(self):
        # quantize->dequantize error is bounded by half an int8 step of
        # the per-RoI scale (s = maxabs/127).
        from rgqa_tpu.data.batching import dequantize_feats, quantize_feats

        rng = np.random.default_rng(3)
        feats = (rng.standard_normal((4, 6, 32)) * 5).astype(np.float32)
        q, s = quantize_feats(feats)
        assert q.dtype == np.int8 and s.shape == (4, 6)
        back = np.asarray(
            dequantize_feats({"feats_q": jnp.asarray(q),
                              "feats_scale": jnp.asarray(s)})["feats"]
        )
        np.testing.assert_allclose(back, feats, atol=(s.max() / 2) + 1e-6)
        # Unquantized batches pass through untouched.
        plain = {"feats": jnp.asarray(feats)}
        assert dequantize_feats(plain) is plain

    def test_feed_int8_scores_close(self, trained, synth_root):
        # --feed_int8 is a transport knob for wire-bound links; on a
        # trained model the scores must track the exact feed closely and
        # the argmax answers must survive quantization.
        import dataclasses

        runner, _, _ = trained
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        encoded = runner._encode(ds)
        base = runner.score_split(encoded)
        old_cfg = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                data=dataclasses.replace(old_cfg.data, feed_int8=True),
            )
            q_scores = runner.score_split(encoded)
        finally:
            runner.cfg = old_cfg
        assert q_scores.keys() == base.keys()
        flips = sum(
            q_scores[qid][0] != ans for qid, (ans, _) in base.items()
        )
        assert flips <= max(1, len(base) // 20), f"{flips}/{len(base)} flips"
        drift = max(
            abs(q_scores[qid][1] - s) for qid, (_, s) in base.items()
        )
        assert drift < 0.05, drift
        # Composition with --eval_chunk: wrap_dequant's wrapper identity
        # keys chunked_map's compile cache, and the quantized batch dict
        # (feats_q int8 + feats_scale) must stack/scan cleanly.
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                data=dataclasses.replace(old_cfg.data, feed_int8=True),
                train=dataclasses.replace(old_cfg.train, eval_chunk=3),
            )
            chunked_q = runner.score_split(encoded)
        finally:
            runner.cfg = old_cfg
        assert chunked_q.keys() == q_scores.keys()
        for qid, (ans, s) in q_scores.items():
            ans2, s2 = chunked_q[qid]
            assert ans2 == ans
            np.testing.assert_allclose(s2, s, rtol=1e-5)

    def test_feed_int8_exempts_maha_fit(self, trained):
        # The Mahalanobis scorer feeds exact f32 (needs_f32_inputs), so
        # the estimator it consumes must be FITTED on the exact feed too
        # — and the fit result is pickled to <output>/sample_estimates.pkl
        # and reused by later runs, so an int8-feed fit would poison every
        # one of them.  With --feed_int8 on, the fit must be bit-identical
        # to the exact-feed fit.
        import dataclasses

        runner, _, _ = trained
        cache = os.path.join(runner.output, "sample_estimates.pkl")
        if os.path.exists(cache):
            os.remove(cache)
        est_exact = runner.fit_maha_estimator()
        os.remove(cache)
        old_cfg = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                data=dataclasses.replace(old_cfg.data, feed_int8=True),
            )
            est_q = runner.fit_maha_estimator()
        finally:
            runner.cfg = old_cfg
        np.testing.assert_array_equal(
            np.asarray(est_exact.class_mean), np.asarray(est_q.class_mean)
        )
        np.testing.assert_array_equal(
            np.asarray(est_exact.precision), np.asarray(est_q.precision)
        )

    def test_train_validation_feeds_exact(self, trained, capsys):
        # --feed_int8 is eval-only transport: the per-epoch validation
        # that picks the BEST checkpoint must run on the exact feed even
        # when the flag is set (a quantized feed could flip near-tied
        # epochs), and say so once.
        import dataclasses

        runner, _, _ = trained
        base = runner.evaluate(runner.valid_set)
        old_cfg = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old_cfg,
                data=dataclasses.replace(old_cfg.data, feed_int8=True),
            )
            runner._int8_train_noted = False
            val = runner._validate_exact()
        finally:
            runner.cfg = old_cfg
        assert val == base  # identical floats: same feed, same step fn
        assert not getattr(runner, "_feed_exact", False)
        assert "feed exact" in capsys.readouterr().out

    def test_ood_evaluate_and_dump_roundtrip(self, trained, synth_root):
        runner, _, out = trained
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        encoded = runner._encode(ds)
        dump = os.path.join(out, "testdev_predict.json")
        results = runner.ood_evaluate(encoded, dump=dump)
        for key in ("auaf", "fpr@0.95acc", "full_acc", "auroc"):
            assert key in results, key
        assert 0.0 <= results["auaf"] <= 1.0

        # The dumped JSON must satisfy the compute_accfpr contract.
        with open(dump) as f:
            records = json.load(f)
        assert len(records) == len(encoded)
        assert set(records[0]) == {"questionId", "prediction", "confidence"}
        from rgqa_tpu.metrics import RGQAEvaluator

        again = RGQAEvaluator(ds.qid2label).evaluate(records)
        assert again["full_acc"] == pytest.approx(results["full_acc"], abs=1e-6)

    def test_save_load_roundtrip(self, trained, synth_root):
        runner, _, out = trained
        ds = GQADataset(synth_root, "valid", add_uq=True)
        encoded = runner._encode(ds)
        before = runner.evaluate(encoded)
        runner.load(os.path.join(out, "LAST"))
        after = runner.evaluate(encoded)
        assert after == pytest.approx(before, abs=1e-6)

    def test_other_scorers_run(self, trained, synth_root):
        runner, _, _ = trained
        ds = GQADataset(synth_root, "testdev", add_uq=True)
        encoded = runner._encode(ds)
        for scorer in ("energy", "odin", "dropout", "maha"):
            res = runner.ood_evaluate(encoded, scorer=runner.make_scorer(scorer))
            assert np.isfinite(res["auaf"]), scorer


class TestRPTraining:
    def test_rp_strategy_trains(self, synth_root, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("snap_rp"))
        cfg = _cfg(synth_root, out, sample_pair=True, epochs=1)
        runner = GQARunner(cfg)
        history = runner.train()
        assert np.isfinite(history["loss"][-1])


class TestViltPixelWire:
    def test_u8_wire_predictions_identical_to_f32(self, synth_root, tmp_path):
        """--pixel_wire u8 (uint8 + rect wire, in-jit normalize) is
        EXACT: prediction/score surface must match the legacy f32 feed
        bit-for-bit through the full runner path."""
        import dataclasses

        from rgqa_tpu.config import EncoderConfig

        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=2, x_layers=0, r_layers=0,
        )

        def run(pixel_wire, out, use_bf16=False):
            cfg = _cfg(synth_root, out, batch_size=16, use_bf16=use_bf16)
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, backbone="vilt", encoder=enc,
                    vilt_image_size=64, vilt_patch_size=16, max_text_len=12,
                ),
                data=dataclasses.replace(cfg.data, pixel_wire=pixel_wire),
            )
            runner = GQARunner(cfg, init_train=False)
            ds = GQADataset(synth_root, "testdev", add_uq=True)
            encoded = runner._encode(ds)
            return runner.score_split(encoded)

        u8 = run("u8", str(tmp_path / "u8"))
        f32 = run("f32", str(tmp_path / "f32"))
        assert u8.keys() == f32.keys() and len(u8) > 0
        for q in u8:
            assert u8[q][0] == f32[q][0], q
            # Scores: zero quantization error; the only drift is XLA's
            # reciprocal-multiply lowering of the in-jit /255 and /0.5
            # (<= 1 f32 ulp on the pixels; measured score drift ~6e-8,
            # vs the int8 feed's ~2e-3 |dconf|).
            assert abs(u8[q][1] - f32[q][1]) <= 2e-6, (
                q, u8[q][1], f32[q][1]
            )

        # bf16 serving (the production config): the 1-ulp f32 pixel
        # drift can flip bf16 rounding on ~1/30k pixels, amplified by
        # the patch conv — bound the score drift at the int8 feed's
        # shipped tolerance and require near-total label agreement
        # (ops/pixels.py fidelity story; measured mean ~4e-4 on the
        # chip at full size).
        u8b = run("u8", str(tmp_path / "u8b"), use_bf16=True)
        f32b = run("f32", str(tmp_path / "f32b"), use_bf16=True)
        flips = sum(u8b[q][0] != f32b[q][0] for q in u8b)
        assert flips <= max(1, len(u8b) // 10), flips
        drift = max(abs(u8b[q][1] - f32b[q][1]) for q in u8b)
        assert drift <= 5e-3, drift
