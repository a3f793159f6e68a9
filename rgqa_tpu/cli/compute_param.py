"""Trainable-parameter counter (reference ``src/compute_param.py:38-61``).

Usage: ``python -m rgqa_tpu.cli.compute_param [backbone ...]``
Prints the parameter count per backbone at RGQA shapes.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from rgqa_tpu.config import ModelConfig
from rgqa_tpu.models.zoo import BACKBONES, build_model, example_batch


def count_params(backbone: str) -> int:
    cfg = ModelConfig(backbone=backbone)
    model, _ = build_model(cfg)
    batch = example_batch(cfg, batch_size=1, seed=0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    if backbone == "butd":
        args = (jb["token_ids"], jb["feats"], jb["boxes"])
    elif backbone == "vilt":
        args = (jb["input_ids"], jb["input_mask"], jb["pixels"])
    elif backbone == "caps":
        args = (jb["input_ids"], jb["input_mask"], jb["segment_ids"])
    else:
        args = (
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
        )
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args)
    )["params"]
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def main(argv=None):
    names = (argv or sys.argv[1:]) or sorted(BACKBONES)
    for name in names:
        n = count_params(name)
        print(f"{name}: {n:,} trainable parameters")


if __name__ == "__main__":
    main()
