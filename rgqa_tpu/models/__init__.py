"""Model zoo: one shared transformer library, many backbones.

Where the reference vendors four near-identical BERT stacks
(``src/lxrt``, ``src/lxrt_adv``, ``src/lxrt_vis``, ``src/uniter``), this
package has a single parameterized encoder (``transformer.py``); the
adversarial-delta and attention-visualization variants are call-time
arguments, and UNITER/caption-BERT reuse the same blocks.
"""

from rgqa_tpu.models.lxmert import (
    LxmertConfigLike,
    LxmertModel,
    LxmertForGQA,
    LxmertPretraining,
)
from rgqa_tpu.models.uniter import UniterModel, UniterForGQA, uniter_box_transform
from rgqa_tpu.models.butd import ButdForGQA, tokenize_front_padded
from rgqa_tpu.models.caps import CaptionMatcher
from rgqa_tpu.models.vilt import ViltForGQA
from rgqa_tpu.models.clip import ClipConfig, ClipModel

__all__ = [
    "LxmertConfigLike",
    "LxmertModel",
    "LxmertForGQA",
    "LxmertPretraining",
    "UniterModel",
    "UniterForGQA",
    "uniter_box_transform",
    "ButdForGQA",
    "tokenize_front_padded",
    "CaptionMatcher",
    "ViltForGQA",
    "ClipConfig",
    "ClipModel",
]
