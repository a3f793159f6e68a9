"""Data layer: tokenization, feature decoding, datasets, sharded batching.

TPU-first redesign of the reference data path (``src/tasks/gqa_data.py``,
``src/utils.py``, ``src/lxrt/tokenization.py``): tokenize once at dataset
build time, pack features into fixed-shape arrays, and feed the device with
a double-buffered sharded iterator — no per-batch host tokenization.
"""

from rgqa_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from rgqa_tpu.data.tsv import load_obj_tsv, OBJ_TSV_FIELDS

__all__ = [
    "WordPieceTokenizer",
    "build_vocab",
    "load_obj_tsv",
    "OBJ_TSV_FIELDS",
]
