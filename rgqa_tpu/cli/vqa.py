"""VQA task CLI (reference ``src/tasks/vqa.py`` __main__, :171-214).

Train:
    python -m rgqa_tpu.cli.vqa --synthetic --data_root /tmp/vqa \
        --train train --valid minival --epochs 1 --batchSize 16 \
        --output snap/vqa_smoke
Test (dumps the VQA-challenge submission JSON):
    python -m rgqa_tpu.cli.vqa ... --test minival --load snap/vqa_smoke/BEST
"""

from __future__ import annotations

import json
import os

from rgqa_tpu.config import parse_cli
from rgqa_tpu.vqa_task import VQARunner


def main(argv=None):
    cfg, ns = parse_cli(argv)
    test = cfg.data.test_splits
    runner = VQARunner(cfg, init_train=test is None)

    if test is not None:
        # Reference dispatch (vqa.py:183-203): 'test' -> predict-only dump,
        # 'val' in the name -> evaluate minival and dump.
        if "test" in test:
            runner.predict(
                test, dump=os.path.join(cfg.output, "test_predict.json")
            )
            print(json.dumps({"split": test, "dumped": True}))
        else:
            result = runner.evaluate(
                test, dump=os.path.join(cfg.output, f"{test}_predict.json")
            )
            print(json.dumps({"split": test, "accuracy": result}))
        return None

    print("Splits in Train data:", runner.dataset.splits)
    if cfg.data.valid_splits:
        print(
            "Valid Oracle: %0.2f"
            % (runner.oracle_score(cfg.data.valid_splits) * 100)
        )
    history = runner.train()
    print(
        json.dumps(
            {
                "final_loss": history["loss"][-1] if history["loss"] else None,
                "train": history["train"],
                "valid": history["valid"],
            }
        )
    )
    return history


if __name__ == "__main__":
    main()
