"""Does `--feed_int8` move the OOD metrics?  (accfpr-level ablation)

The int8 feats feed ships per-RoI int8 + f32 scales over the
host->device wire (2.48x production q/s on the wire-bound tunnel,
docs/kernels.md "Feats-wire int8") and was shipped OPT-IN with the
caveat that confidence calibration deserved an accfpr-level ablation
before anyone enables it blind.  This is that ablation: train a model
end-to-end on synthetic GQA (CPU — quantization drift is
hardware-independent), score the UQ-augmented testdev split with the
exact feed and the int8 feed, and compare the FULL metric bundle
(AUAF / FPR@0.95acc / full_acc / AUROC / AUPR / FPR95 / F1 /
accuracies) plus per-question confidence drift, for the two single-pass
scorers the flag applies to (MSP, Energy; grad-at-eval scorers exempt
themselves).

The model must actually be discriminative for the comparison to mean
anything: a 6-epoch lr-3e-3 first attempt plateaued at 10% valid with
saturated-low confidences (|dconf| ~1e-7 — f32 noise, not quantization)
— a sweep found lr 1e-3 x 25 epochs reaches ~80-95% valid on the
synthetic task (the answer is readable off a boosted feature dim), and
``sample_pair`` RP training gives MSP real UQ separation.

RESULT (2026-08-19, CPU, hidden-64 2/1/1 LXMERT + RP trained 25 epochs
on 768 synthetic questions, 768-question testdev + UQ):  see the table
printed by the run — recorded in docs/kernels.md "Feats-wire int8".

Round-4 addendum: a third arm scores the same split through the
asymmetric-uint4 lattice of experiments/feats_wire_exp.py (QDQ view
over the feature pack — int4 transport is measurement-only, so there
is no flag to exercise); results in the same docs section.
"""

import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
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
    from rgqa_tpu.metrics import RGQAEvaluator
    from rgqa_tpu.runner import GQARunner

    root = tempfile.mkdtemp(prefix="int8_ablation_")
    make_synthetic_gqa(
        root,
        SyntheticSpec(n_images=64, n_train=768, n_valid=96, n_testdev=768),
    )
    enc = EncoderConfig(
        hidden_size=64, num_heads=4, intermediate_size=128,
        l_layers=2, x_layers=1, r_layers=1,
        num_objects=36, visual_feat_dim=2048,
    )
    cfg = RunConfig(
        model=ModelConfig(backbone="lxmert", encoder=enc, max_text_len=12),
        train=TrainConfig(
            batch_size=32, epochs=25, optim=OptimConfig(lr=1e-3),
            use_bf16=False, sample_pair=True,
        ),
        ood=OODConfig(scorer="msp"),
        data=DataConfig(data_root=root, test_splits="testdev", synthetic=True),
        output=os.path.join(root, "snap"),
    )
    runner = GQARunner(cfg)
    history = runner.train()
    print(f"train loss {history['loss'][0]:.2f} -> {history['loss'][-1]:.2f}; "
          f"valid {history['valid'][-1] * 100:.1f}")

    ds = GQADataset(root, "testdev", add_uq=True)
    encoded = runner._encode(ds)
    evaluator = RGQAEvaluator(ds.qid2label, tau=cfg.ood.tau)

    keys = (
        "auaf", "fpr@0.95acc", "full_acc", "auroc", "aupr_in", "aupr_out",
        "fpr95", "detection_error", "f1", "accuracy", "accuracy_accept",
        "accuracy_indomain",
    )
    # Int4 arm: QDQ through the asymmetric uint4 lattice of
    # experiments/feats_wire_exp.py (measurement-only — no shipped flag),
    # applied as a feature-pack view so the exact feed path is reused.
    # Lattice drift is what moves metrics; transport form is irrelevant.
    # NOTE: this dequantizes in f32, while the wire path (dequant_u4)
    # rounds scale/zero through bfloat16 first — so the ablation isolates
    # the lattice and slightly understates the real transport's drift
    # (the shipped int8 path has the same f32-vs-bf16 asymmetry).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from feats_wire_exp import quantize_feats_u4

    class _QDQ4View:
        def __init__(self, base):
            self._base = base

        def __getitem__(self, rows):
            f = np.asarray(self._base[rows], np.float32)
            p, s, z = quantize_feats_u4(f)
            q = np.stack(
                [p & 0xF, (p >> 4) & 0xF], axis=-1
            ).reshape(*p.shape[:-1], -1)
            return (q * s[..., None] + z[..., None]).astype(np.float32)

    class _QDQ4Pack:
        # Relies on EncodedGQA reading only `.features[rows]` at scoring
        # time (boxes/index were consumed at encode time); every other
        # attribute lookup falls through to the wrapped pack.
        def __init__(self, pack):
            self._pack = pack
            self.features = _QDQ4View(pack.features)

        def __getattr__(self, name):
            return getattr(self._pack, name)

    for scorer_name in ("msp", "energy"):
        scorer = runner.make_scorer(scorer_name)
        base = runner.score_split(encoded, scorer=scorer)
        old = runner.cfg
        try:
            runner.cfg = dataclasses.replace(
                old, data=dataclasses.replace(old.data, feed_int8=True)
            )
            quant = runner.score_split(encoded, scorer=scorer)
        finally:
            runner.cfg = old
        old_pack = encoded.features
        try:
            encoded.features = _QDQ4Pack(old_pack)
            quant4 = runner.score_split(encoded, scorer=scorer)
        finally:
            encoded.features = old_pack

        m_base = evaluator.evaluate_quesid2ans(base)
        m_quant = evaluator.evaluate_quesid2ans(quant)
        m_quant4 = evaluator.evaluate_quesid2ans(quant4)
        print(f"\n=== {scorer_name} (n={len(base)}) ===")
        for name, arm in (("int8", quant), ("int4", quant4)):
            flips = sum(arm[q][0] != a for q, (a, _) in base.items())
            drift = np.array(
                [abs(arm[q][1] - s) for q, (_, s) in base.items()]
            )
            print(f"{name}: answer flips {flips}/{len(base)}; |dconf| mean "
                  f"{drift.mean():.2e} max {drift.max():.2e}")
        print(f"{'metric':18s} {'exact':>9s} {'int8':>9s} {'d8':>8s} "
              f"{'int4':>9s} {'d4':>8s}")
        for k in keys:
            if k in m_base:
                d8 = m_quant[k] - m_base[k]
                d4 = m_quant4[k] - m_base[k]
                print(f"{k:18s} {m_base[k]:9.4f} {m_quant[k]:9.4f} "
                      f"{d8:+8.4f} {m_quant4[k]:9.4f} {d4:+8.4f}")


if __name__ == "__main__":
    main()
