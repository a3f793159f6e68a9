"""LXMERT pretraining CLI (reference ``run/lxmert_pretrain.bash`` ->
``src/pretrain/lxmert_pretrain.py``).

Task toggles follow the reference flags: ``--taskMaskLM --taskMatched
--taskObjPredict --taskQA --visualLosses obj,attr,feat``; with none given,
all tasks run (the reference's standard recipe).

Example (synthetic):
    python -m rgqa_tpu.cli.pretrain --synthetic --data_root /tmp/gqa \
        --epochs 2 --batchSize 16 --lr 1e-4 --output snap/pretrain
"""

from __future__ import annotations

import json

from rgqa_tpu.config import parse_cli
from rgqa_tpu.pretrain import PretrainRunner


def main(argv=None):
    cfg, ns = parse_cli(argv)
    tasks = []
    if ns.task_mask_lm:
        tasks.append("mask_lm")
    if ns.task_matched:
        tasks.append("matched")
    if ns.task_obj_predict:
        tasks.extend(ns.visual_losses.split(","))
    if ns.task_qa:
        tasks.append("qa")
    if not tasks:
        tasks = ["mask_lm", "matched", "obj", "attr", "feat", "qa"]

    runner = PretrainRunner(cfg, tasks=tuple(tasks))
    history = runner.train()
    print(json.dumps({"eval_loss": history["eval"]}))
    return history


if __name__ == "__main__":
    main()
