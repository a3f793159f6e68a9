"""Evaluation CLI (reference ``src/tasks/gqa_conf.py`` __main__, test path,
plus the ensemble / coverage / match eval drivers).

Runs rejection-scored inference over one or more test splits and writes
``<output>/<split>_predict.json`` (the compute_accfpr-compatible contract)
plus ``<output>/<split>_result.json`` with the metric dict.

Scorers:
  msp | energy | odin | dropout | maha | branched   — jittable, on-device
  ensemble   — ``--load ckpt1,ckpt2,...`` (gqa_ensemble.py)
  frcnn      — object coverage; needs ``<data_root>/objects_vocab.txt``
  match      — pretraining matched head; ``--loadLXMERT <pretrain ckpt>``

Example:
    python -m rgqa_tpu.cli.evaluate --synthetic --data_root /tmp/gqa \
        --test testdev --load snap/smoke/BEST --scorer msp --output snap/smoke
"""

from __future__ import annotations

import json
import os

from rgqa_tpu.config import parse_cli
from rgqa_tpu.data import GQADataset
from rgqa_tpu.runner import GQARunner


def main(argv=None):
    cfg, ns = parse_cli(argv)
    if not cfg.data.test_splits:
        raise SystemExit("--test <split[,split...]> is required")
    scorer_name = cfg.ood.scorer
    ensemble_paths = None
    if cfg.load and "," in cfg.load:
        scorer_name = "ensemble"
        ensemble_paths = cfg.load.split(",")
        cfg = cfg.replace(load=ensemble_paths[0])
    if scorer_name in ("separate", "caption"):
        # The detector/matcher model has a 1-logit head; the runner derives
        # that shape from the train strategy.
        import dataclasses

        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, strategy=scorer_name)
        )

    runner = GQARunner(cfg, init_train=scorer_name == "maha")

    all_results = {}
    for split in cfg.data.test_splits.split(","):
        ds = GQADataset(cfg.data.data_root, split, add_uq=True)
        encoded = runner._encode(ds)
        dump = os.path.join(cfg.output, f"{split}_predict.json")
        if ns.target_acc is not None:
            out = runner.predict_with_thresh(encoded, dump=dump)
            results = {"tau": out["tau"]}
        elif scorer_name == "ensemble":
            results = runner.ensemble_ood_evaluate(
                encoded, ensemble_paths, dump=dump
            )
        elif scorer_name == "clip":
            # CLIP image-question similarity (gqa_clip.py:76-110): answers
            # from --load'ed model, confidence from a local CLIP ckpt
            # (--clip_path) over <data_root>/images/<img_id>.jpg.
            from rgqa_tpu.scorers.clip import ClipScorer

            if not cfg.ood.clip_path:
                raise SystemExit(
                    "--scorer clip needs --clip_path <local CLIP checkpoint "
                    "dir> (zero-egress: no hub downloads)"
                )
            scorer = ClipScorer(cfg.ood.clip_path)
            results = runner.clip_ood_evaluate(
                encoded,
                scorer.scores,
                os.path.join(cfg.data.data_root, "images"),
                dump=dump,
            )
        elif scorer_name == "frcnn":
            results = runner.coverage_ood_evaluate(
                encoded,
                os.path.join(cfg.data.data_root, "objects_vocab.txt"),
                dump=dump,
            )
        elif scorer_name == "match":
            if not cfg.load_lxmert:
                raise SystemExit("--scorer match needs --loadLXMERT <ckpt>")
            from rgqa_tpu.checkpoint import load_checkpoint

            directory, name = os.path.split(cfg.load_lxmert.rstrip("/"))
            pre = load_checkpoint(directory or ".", name)["params"]
            results = runner.match_ood_evaluate(encoded, pre, dump=dump)
        elif scorer_name in ("separate", "caption"):
            # Gated evaluation: this runner scores answerability, a frozen
            # GQA answerer (--load_gqa) supplies the answers
            # (gqa_separate.py:200-234, gqa_caption.py:149-171).
            import dataclasses

            if not cfg.load_gqa:
                raise SystemExit(f"--scorer {scorer_name} needs --load_gqa <ckpt>")
            # The answerer's backbone (reference passes --backbone butd to
            # gqa_caption_test.bash while the matcher stays a BERT):
            # --ans_backbone overrides; a caps matcher defaults to lxmert.
            ans_model = cfg.model
            if getattr(ns, "ans_backbone", None):
                ans_model = dataclasses.replace(
                    ans_model, backbone=ns.ans_backbone
                )
            elif ans_model.backbone == "caps":
                ans_model = dataclasses.replace(ans_model, backbone="lxmert")
            answerer = GQARunner(
                cfg.replace(
                    load=cfg.load_gqa,
                    model=ans_model,
                    train=dataclasses.replace(cfg.train, strategy="conf"),
                    output=cfg.output + "/answerer",
                ),
                init_train=False,
            )
            results = runner.gated_ood_evaluate(encoded, answerer, dump=dump)
        else:
            results = runner.ood_evaluate(encoded, dump=dump)
        all_results[split] = results
        with open(os.path.join(cfg.output, f"{split}_result.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(split, json.dumps(results))
    return all_results


if __name__ == "__main__":
    main()
