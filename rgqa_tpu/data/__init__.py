"""Data layer: tokenization, feature decoding, datasets, sharded batching.

TPU-first redesign of the reference data path (``src/tasks/gqa_data.py``,
``src/utils.py``, ``src/lxrt/tokenization.py``): tokenize once at dataset
build time, pack features into fixed-shape arrays, and feed the device with
a double-buffered sharded iterator — no per-batch host tokenization.
"""

from rgqa_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from rgqa_tpu.data.tsv import load_obj_tsv, pack_obj_tsv, PackedFeatures, OBJ_TSV_FIELDS
from rgqa_tpu.data.dataset import GQADataset, EncodedGQA, normalize_boxes, build_targets
from rgqa_tpu.data.batching import batch_iterator, device_prefetch
from rgqa_tpu.data.synthetic import make_synthetic_gqa, SyntheticSpec

__all__ = [
    "WordPieceTokenizer",
    "build_vocab",
    "load_obj_tsv",
    "pack_obj_tsv",
    "PackedFeatures",
    "OBJ_TSV_FIELDS",
    "GQADataset",
    "EncodedGQA",
    "normalize_boxes",
    "build_targets",
    "batch_iterator",
    "device_prefetch",
    "make_synthetic_gqa",
    "SyntheticSpec",
]
