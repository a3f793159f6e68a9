"""LXMERT pretraining: on-device masking, multi-task losses, trainer.

Rebuild of the reference pretraining stack (``src/pretrain/``): masked LM,
masked-object prediction (obj CE / attr CE / feat SmoothL1), cross-modal
matching, and QA — with the reference's host-side per-example Python
masking (``lxmert_pretrain.py:71-132``) moved *inside the jitted step* as
vectorized ``jax.random`` ops, and the matched-task image swap
(``lxmert_data.py:171-178``) done by an on-device batch roll.
"""

from rgqa_tpu.pretrain.masking import mask_words, mask_objects, matched_swap
from rgqa_tpu.pretrain.losses import pretrain_loss, VISUAL_LOSS_CONFIG
from rgqa_tpu.pretrain.answer_table import AnswerTable
from rgqa_tpu.pretrain.trainer import PretrainRunner, make_pretrain_step

__all__ = [
    "mask_words",
    "mask_objects",
    "matched_swap",
    "pretrain_loss",
    "VISUAL_LOSS_CONFIG",
    "AnswerTable",
    "PretrainRunner",
    "make_pretrain_step",
]
