"""Scorer registry tests on a tiny LXMERT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.config import EncoderConfig, ModelConfig
from rgqa_tpu.models.zoo import build_model, example_batch
from rgqa_tpu.scorers import (
    MahaEstimator,
    calibrate_tau,
    coverage_scores,
    ensemble_merge,
    fit_estimator,
    make_scorer,
)

TINY_ENC = EncoderConfig(
    hidden_size=32,
    num_heads=4,
    intermediate_size=64,
    vocab_size=256,
    l_layers=1,
    x_layers=1,
    r_layers=1,
    num_objects=6,
    visual_feat_dim=16,
)
TINY_CFG = ModelConfig(
    backbone="lxmert", encoder=TINY_ENC, num_answers=7, max_text_len=6
)


@pytest.fixture(scope="module")
def tiny():
    model, forward = build_model(TINY_CFG)
    batch = example_batch(TINY_CFG, batch_size=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"],
        batch["input_mask"],
        batch["segment_ids"],
        batch["feats"],
        batch["boxes"],
    )["params"]
    return forward, params, batch


def _check(out, b=4):
    assert out["label"].shape == (b,)
    assert out["score"].shape == (b,)
    assert np.all(np.isfinite(np.asarray(out["score"])))


class TestJittableScorers:
    def test_msp(self, tiny):
        forward, params, batch = tiny
        out = make_scorer("msp", forward)(params, batch)
        _check(out)
        assert np.asarray(out["score"]).max() <= 1.0

    def test_energy_top2(self, tiny):
        forward, params, batch = tiny
        out = make_scorer("energy", forward)(params, batch)
        _check(out)
        # score must equal softplus sum of top-2 logits of a plain forward.
        plain = forward(params, batch, deterministic=True)
        logits = np.asarray(plain["logits"], np.float32)
        top2 = np.sort(logits, axis=-1)[:, -2:]
        expect = np.log1p(np.exp(top2)).sum(-1)
        np.testing.assert_allclose(np.asarray(out["score"]), expect, rtol=1e-4)

    def test_odin_perturbs_score(self, tiny):
        forward, params, batch = tiny
        msp = make_scorer("msp", forward)(params, batch)
        odin = make_scorer("odin", forward, temperature=1000.0, noise=1e-2)(
            params, batch
        )
        _check(odin)
        # Temperature-scaled scores live near sigmoid(0)=0.5.
        assert np.all(np.abs(np.asarray(odin["score"]) - 0.5) < 0.1)
        assert not np.allclose(np.asarray(odin["score"]), np.asarray(msp["score"]))

    def test_dropout_scorer_averages(self, tiny):
        forward, params, batch = tiny
        out = make_scorer("dropout", forward, seed_list=(0, 1, 2))(params, batch)
        _check(out)

    def test_maha_fit_and_score(self, tiny):
        forward, params, batch = tiny
        rng = np.random.default_rng(0)
        batches = []
        for _ in range(3):
            pooled = forward(params, batch, deterministic=True)["pooled"]
            t = np.zeros((4, 7), np.float32)
            t[np.arange(4), rng.integers(0, 7, 4)] = 1.0
            batches.append((np.asarray(pooled), t))
        est = fit_estimator(batches, num_classes=7, feat_dim=32)
        assert est.class_mean.shape == (7, 32)
        assert est.precision.shape == (32, 32)
        out = make_scorer("maha", forward, estimator=est)(params, batch)
        _check(out)
        # Without input perturbation, Gaussian scores are <= 0.
        assert np.asarray(out["score"]).max() <= 1e-3  # expanded-form f32 round-off (maha.py:_gaussian_scores)
        noised = make_scorer("maha", forward, estimator=est, noise=1e-3)(
            params, batch
        )
        _check(noised)
        # Perturbation changes the scores (the gradient actually flowed).
        assert not np.allclose(
            np.asarray(noised["score"]), np.asarray(out["score"])
        )

    def test_maha_gaussian_matches_reference_loop(self):
        # Closed-form batched score == per-class loop (gqa_maha.py:229-236).
        from rgqa_tpu.scorers.maha import _gaussian_scores

        rng = np.random.default_rng(1)
        f = rng.standard_normal((5, 8)).astype(np.float32)
        mu = rng.standard_normal((3, 8)).astype(np.float32)
        a = rng.standard_normal((8, 8)).astype(np.float32)
        prec = a @ a.T
        got = np.asarray(_gaussian_scores(jnp.asarray(f), jnp.asarray(mu), jnp.asarray(prec)))
        for c in range(3):
            z = f - mu[c]
            expect = -0.5 * np.einsum("bd,de,be->b", z, prec, z)
            np.testing.assert_allclose(got[:, c], expect, rtol=1e-5, atol=1e-4)

    def test_branched_scorer(self):
        cfg = ModelConfig(
            backbone="lxmert", encoder=TINY_ENC, num_answers=7,
            max_text_len=6, branched=True,
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=4, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0),
            batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"],
        )["params"]
        out = make_scorer("branched", forward)(params, batch)
        _check(out)
        mixed = make_scorer("branched", forward, mix=True)(params, batch)
        assert np.all(np.asarray(mixed["score"]) <= np.asarray(out["score"]) + 1e-6)


class TestEnsembleMerge:
    def test_mean_and_product(self):
        p1 = jnp.asarray([[0.2, 0.8], [0.6, 0.4]])
        p2 = jnp.asarray([[0.4, 0.6], [0.8, 0.2]])
        mean = ensemble_merge([p1, p2], "mean")
        np.testing.assert_allclose(np.asarray(mean["probs"]), [[0.3, 0.7], [0.7, 0.3]])
        prod = ensemble_merge([p1, p2], "multiply")
        np.testing.assert_allclose(
            np.asarray(prod["probs"]), [[0.08, 0.48], [0.48, 0.08]], rtol=1e-6
        )


class TestCoverage:
    def test_coverage_scores(self):
        vocab = ["dog", "cat", "tabl"]  # stemmed names
        sents = ["is there a dog ?", "where is the zebra ?"]
        objects = [[0, 2], [0, 1]]
        s = coverage_scores(sents, objects, vocab)
        np.testing.assert_allclose(s, [1.0, 0.0])

    def test_stoplist_words_ignored(self):
        s = coverage_scores(
            ["what color is the thing on the left ?"], [[0]], ["dog"]
        )
        np.testing.assert_allclose(s, [1.0])  # only stoplist nouns -> covered


class TestCalibration:
    def test_calibrate_tau_hits_target_acc(self):
        rng = np.random.default_rng(0)
        n = 200
        targets = np.array(["a"] * (n // 2) + ["UQ"] * (n // 2))
        preds = np.array(["a"] * n)
        # AQ rows score high, UQ rows lower, with overlap.
        scores = np.concatenate(
            [rng.random(n // 2) * 0.6 + 0.4, rng.random(n // 2) * 0.6]
        )
        tau = calibrate_tau(targets, preds, scores, target_acc=0.5)
        accepted_correct = ((scores >= tau) & (targets == "a")).sum()
        acc = accepted_correct / (targets == "a").sum()
        assert abs(acc - 0.5) < 0.05
