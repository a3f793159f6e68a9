"""Checkpointing: orbax-native save/load + PyTorch reference importers.

The torch importers give weight-level parity with the reference's released
checkpoints (SURVEY.md §7.3: ``module.`` strips, gamma/beta renames,
``bert.`` -> ``uniter.``, answer-string head transplant).
"""

from rgqa_tpu.checkpoint.orbax_io import (
    load_checkpoint,
    load_params,
    save_checkpoint,
    wait_for_saves,
    save_params,
)
from rgqa_tpu.checkpoint.torch_import import (
    assign_into_tree,
    butd_key_map,
    bert_caps_key_map,
    clip_key_map,
    import_bert_caps,
    import_clip,
    import_butd_gqa,
    import_lxmert_gqa,
    import_lxmert_pretraining,
    import_uniter_gqa,
    lxmert_pretrain_key_map,
    load_lxmert_qa,
    load_torch_state_dict,
    lxmert_key_map,
    uniter_key_map,
)

__all__ = [
    "save_checkpoint",
    "wait_for_saves",
    "load_checkpoint",
    "save_params",
    "load_params",
    "load_torch_state_dict",
    "import_lxmert_gqa",
    "import_uniter_gqa",
    "import_butd_gqa",
    "butd_key_map",
    "import_clip",
    "clip_key_map",
    "import_bert_caps",
    "bert_caps_key_map",
    "import_lxmert_pretraining",
    "lxmert_pretrain_key_map",
    "load_lxmert_qa",
    "lxmert_key_map",
    "uniter_key_map",
    "assign_into_tree",
]
