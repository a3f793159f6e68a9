"""Distillation data-generation CLI (reference ``src/tasks/gqa_distill.py``).

Loads a teacher, samples re-paired candidates, scores them with multiple
stochastic passes, selects pseudo-AQ/UQ by cartography thresholds, and
writes a student training split JSON.

Example:
    python -m rgqa_tpu.cli.distill --synthetic --data_root /tmp/gqa \
        --load snap/teacher/BEST --output snap/distill \
        --n_candidates 1000 --output_name distill_train
"""

from __future__ import annotations

import argparse
import os
import sys

from rgqa_tpu.config import parse_cli
from rgqa_tpu.distill import build_distill_split
from rgqa_tpu.runner import GQARunner


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # allow_abbrev=False: otherwise --output prefix-matches --output_name.
    extra = argparse.ArgumentParser(allow_abbrev=False)
    extra.add_argument("--n_candidates", type=int, default=1000)
    extra.add_argument("--passes", type=int, default=3)
    extra.add_argument("--output_name", default="distill_train")
    extra.add_argument("--tau_aq_c", type=float, default=0.5)
    extra.add_argument("--tau_aq_v", type=float, default=0.15)
    extra.add_argument("--tau_uq_c", type=float, default=0.1)
    extra.add_argument("--tau_uq_v", type=float, default=0.05)
    extra.add_argument("--balance", action="store_true")
    own, rest = extra.parse_known_args(argv)
    cfg, ns = parse_cli(rest)

    runner = GQARunner(cfg)
    out_path = os.path.join(cfg.data.data_root, f"{own.output_name}.json")
    if cfg.teacher_path and "," in cfg.teacher_path:
        # Ensemble-teacher pseudo-labeling (gqa_ensemble_distill.py):
        # --teacher_path a,b,c multiplies per-checkpoint sigmoids over the
        # train splits and writes the pseudo-labeled student split.
        from rgqa_tpu.distill import build_ensemble_distill_split

        rows = build_ensemble_distill_split(
            runner,
            cfg.teacher_path.split(","),
            splits=cfg.data.train_splits,
            out_path=out_path,
        )
        print(f"wrote {len(rows)} ensemble-distilled rows to {out_path}")
        return rows
    rows = build_distill_split(
        runner,
        n_candidates=own.n_candidates,
        passes=own.passes,
        out_path=out_path,
        balance=own.balance,
        tau_aq_c=own.tau_aq_c,
        tau_aq_v=own.tau_aq_v,
        tau_uq_c=own.tau_uq_c,
        tau_uq_v=own.tau_uq_v,
    )
    print(f"wrote {len(rows)} distilled rows to {out_path}")
    return rows


if __name__ == "__main__":
    main()
