"""Training: optimizer, losses, train-state, jitted SPMD step factories.

Rebuilds the reference training stack (``src/lxrt/optimization.py``,
``src/tasks/gqa_conf.py:140-243`` and friends) as pure functional JAX:
optax-style BertAdam, jittable losses, and step functions compiled once
over a device mesh.
"""

from rgqa_tpu.train.optimizer import (
    bert_adam,
    make_optimizer,
    warmup_linear,
    warmup_constant,
    warmup_cosine,
)
from rgqa_tpu.train.losses import (
    bce_answer_loss,
    mce_answer_loss,
    energy_regularizer,
    branched_loss,
)
from rgqa_tpu.train.state import TrainState, create_train_state
from rgqa_tpu.train.step import (
    make_chunked_train_step,
    make_eval_step,
    make_train_step,
    make_weighted_clip_train_step,
)

__all__ = [
    "bert_adam",
    "make_optimizer",
    "warmup_linear",
    "warmup_constant",
    "warmup_cosine",
    "bce_answer_loss",
    "mce_answer_loss",
    "energy_regularizer",
    "branched_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_chunked_train_step",
    "make_eval_step",
    "make_weighted_clip_train_step",
]
