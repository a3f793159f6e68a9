"""Evaluation CLI (reference ``src/tasks/gqa_conf.py`` __main__, test path).

Runs rejection-scored inference over one or more test splits and writes
``<output>/<split>_predict.json`` (the compute_accfpr-compatible contract)
plus ``<output>/<split>_result.json`` with the metric dict.

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
    runner = GQARunner(cfg, init_train=cfg.ood.scorer == "maha")

    all_results = {}
    for split in cfg.data.test_splits.split(","):
        ds = GQADataset(cfg.data.data_root, split, add_uq=True)
        encoded = runner._encode(ds)
        dump = os.path.join(cfg.output, f"{split}_predict.json")
        if ns.target_acc is not None:
            out = runner.predict_with_thresh(encoded, dump=dump)
            results = {"tau": out["tau"]}
        else:
            results = runner.ood_evaluate(encoded, dump=dump)
        all_results[split] = results
        with open(os.path.join(cfg.output, f"{split}_result.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(split, json.dumps(results))
    return all_results


if __name__ == "__main__":
    main()
