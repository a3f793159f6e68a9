"""Training CLI (reference ``src/tasks/gqa_conf.py`` __main__, train path).

Example (synthetic smoke run):
    python -m rgqa_tpu.cli.train --synthetic --data_root /tmp/gqa \
        --train train --valid valid --epochs 1 --batchSize 16 --tiny \
        --output snap/smoke
"""

from __future__ import annotations

import json

from rgqa_tpu.config import parse_cli
from rgqa_tpu.runner import GQARunner


def main(argv=None):
    cfg, ns = parse_cli(argv)
    runner = GQARunner(cfg)
    history = runner.train()
    print(json.dumps({"final_loss": history["loss"][-1] if history["loss"] else None,
                      "valid": history["valid"]}))
    return history


if __name__ == "__main__":
    main()
