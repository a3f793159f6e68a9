"""PyTorch checkpoint importer: reference ``state_dict`` -> flax params.

Maps the reference's released checkpoints (``snap/gqa/...BEST.pth``,
``snap/pretrained/model_LXRT.pth``) onto this framework's parameter trees,
reproducing the reference's own loading quirks:

- ``module.`` DataParallel prefix strip (``src/tasks/gqa.py:259-265``);
- ``gamma``/``beta`` -> LayerNorm weight/bias renames
  (``src/lxrt/modeling.py:792-801``);
- ``bert.`` -> ``uniter.`` renames for UNITER (``src/uniter/entry.py:101-119``);
- torch ``nn.Linear`` weights are (out, in) -> flax kernels (in, out).

Key layout derived from ``src/lxrt/modeling.py`` module attributes
(BertAttention 295-347, BertAttOutput 350-362, LXRTXLayer 439-488,
VisualFeatEncoder 491-517) and ``src/tasks/gqa_model.py:20-27``
(``logit_fc.{0,2,3}``).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "import_lxmert_gqa",
    "import_uniter_gqa",
    "import_vilt_gqa",
    "import_clip",
    "lxmert_key_map",
    "uniter_key_map",
    "vilt_key_map",
    "clip_key_map",
    "assign_into_tree",
]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` state_dict to numpy, applying the reference's
    ``module.`` strip and gamma/beta renames."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw and not any(
        hasattr(v, "numpy") for v in raw.values()
    ):
        raw = raw["state_dict"]
    out = {}
    for key, value in raw.items():
        if key.startswith("module."):
            key = key[len("module."):]
        key = key.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[key] = value.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# Key maps.  Each entry: torch key -> (flax path tuple, transpose?).
# ---------------------------------------------------------------------------

_LN = [("weight", "scale"), ("bias", "bias")]
_DENSE = [("weight", "kernel"), ("bias", "bias")]


def _dense(tkey: str, fpath: tuple) -> list:
    return [
        (f"{tkey}.weight", fpath + ("kernel",), True),
        (f"{tkey}.bias", fpath + ("bias",), False),
    ]


def _ln(tkey: str, fpath: tuple) -> list:
    return [
        (f"{tkey}.weight", fpath + ("scale",), False),
        (f"{tkey}.bias", fpath + ("bias",), False),
    ]


def _bert_layer(tprefix: str, fprefix: tuple) -> list:
    """One BertLayer: attention.self/output + intermediate + output."""
    m = []
    for name in ("query", "key", "value"):
        m += _dense(f"{tprefix}.attention.self.{name}", fprefix + ("att", name))
    m += _dense(f"{tprefix}.attention.output.dense", fprefix + ("att", "out"))
    m += _ln(f"{tprefix}.attention.output.LayerNorm", fprefix + ("att", "out_ln"))
    m += _dense(f"{tprefix}.intermediate.dense", fprefix + ("mlp", "inter"))
    m += _dense(f"{tprefix}.output.dense", fprefix + ("mlp", "out"))
    m += _ln(f"{tprefix}.output.LayerNorm", fprefix + ("mlp", "out_ln"))
    return m


def _att_block(tprefix: str, fprefix: tuple, *, self_attr: str) -> list:
    """A BertCrossattLayer (att/output) or BertSelfattLayer (self/output)."""
    m = []
    for name in ("query", "key", "value"):
        m += _dense(f"{tprefix}.{self_attr}.{name}", fprefix + (name,))
    m += _dense(f"{tprefix}.output.dense", fprefix + ("out",))
    m += _ln(f"{tprefix}.output.LayerNorm", fprefix + ("out_ln",))
    return m


def _embeddings(tprefix: str, fprefix: tuple) -> list:
    m = []
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        m.append((f"{tprefix}.{name}.weight", fprefix + (name, "embedding"), False))
    m += _ln(f"{tprefix}.LayerNorm", fprefix + ("layer_norm",))
    return m


def lxmert_key_map(
    l_layers: int = 9,
    x_layers: int = 5,
    r_layers: int = 5,
    *,
    encoder_prefix: str = "bert.",
    flax_prefix: tuple = ("lxmert",),
    answer_head: bool = True,
    branched: bool = False,
) -> list[tuple[str, tuple, bool]]:
    """Key map for GQAModel-style checkpoints.

    Torch model layout: ``lxrt_encoder.model.bert.*`` + ``logit_fc.*``
    (``gqa_model.py:14-43``); pretraining checkpoints use bare ``bert.*``.
    """
    p = encoder_prefix
    f = flax_prefix
    m: list = []
    m += _embeddings(f"{p}embeddings", f + ("embeddings",))
    # VisualFeatEncoder (modeling.py:491-517).
    m += _dense(f"{p}encoder.visn_fc.visn_fc", f + ("visual", "feat_proj"))
    m += _ln(f"{p}encoder.visn_fc.visn_layer_norm", f + ("visual", "feat_ln"))
    m += _dense(f"{p}encoder.visn_fc.box_fc", f + ("visual", "box_proj"))
    m += _ln(f"{p}encoder.visn_fc.box_layer_norm", f + ("visual", "box_ln"))
    for i in range(l_layers):
        m += _bert_layer(f"{p}encoder.layer.{i}", f + (f"lang_{i}",))
    for i in range(r_layers):
        m += _bert_layer(f"{p}encoder.r_layers.{i}", f + (f"visn_{i}",))
    for i in range(x_layers):
        t = f"{p}encoder.x_layers.{i}"
        fx = f + (f"x_{i}",)
        m += _att_block(f"{t}.visual_attention", fx + ("cross_att",), self_attr="att")
        m += _att_block(f"{t}.lang_self_att", fx + ("lang_self",), self_attr="self")
        m += _att_block(f"{t}.visn_self_att", fx + ("visn_self",), self_attr="self")
        m += _dense(f"{t}.lang_inter.dense", fx + ("lang_mlp", "inter"))
        m += _dense(f"{t}.lang_output.dense", fx + ("lang_mlp", "out"))
        m += _ln(f"{t}.lang_output.LayerNorm", fx + ("lang_mlp", "out_ln"))
        m += _dense(f"{t}.visn_inter.dense", fx + ("visn_mlp", "inter"))
        m += _dense(f"{t}.visn_output.dense", fx + ("visn_mlp", "out"))
        m += _ln(f"{t}.visn_output.LayerNorm", fx + ("visn_mlp", "out_ln"))
    m += _dense(f"{p}pooler.dense", f + ("pooler", "dense"))
    if answer_head:
        # logit_fc = Sequential(Linear, GeLU, BertLayerNorm, Linear)
        # (gqa_model.py:20-27) -> indices 0, 2, 3.
        m += _dense("logit_fc.0", ("answer_head", "dense"))
        m += _ln("logit_fc.2", ("answer_head", "ln"))
        m += _dense("logit_fc.3", ("answer_head", "logits"))
    if branched:
        m += _dense("conf_fc.0", ("conf_head", "dense"))
        m += _ln("conf_fc.2", ("conf_head", "ln"))
        m += _dense("conf_fc.3", ("conf_head", "logits"))
    return m


def uniter_key_map(
    num_layers: int = 12,
    *,
    encoder_prefix: str = "uniter.",
    flax_prefix: tuple = ("uniter",),
    answer_head: bool = True,
) -> list[tuple[str, tuple, bool]]:
    """Key map for UNITER checkpoints (``src/uniter/modeling.py:560-655``).

    ``UniterEncoder.load`` renames ``bert.`` -> ``uniter.``
    (``entry.py:101-119``); embeddings/encoder follow BERT layout, image
    embeddings add img/pos linears + their LayerNorms.
    """
    p = encoder_prefix
    f = flax_prefix
    m: list = []
    m += _embeddings(f"{p}embeddings", f + ("embeddings",))
    m += _dense(f"{p}img_embeddings.img_linear", f + ("img_embeddings", "img_linear"))
    m += _ln(f"{p}img_embeddings.img_layer_norm", f + ("img_embeddings", "img_ln"))
    m += _dense(f"{p}img_embeddings.pos_linear", f + ("img_embeddings", "pos_linear"))
    m += _ln(f"{p}img_embeddings.pos_layer_norm", f + ("img_embeddings", "pos_ln"))
    m += _ln(f"{p}img_embeddings.LayerNorm", f + ("img_embeddings", "ln"))
    for i in range(num_layers):
        m += _bert_layer(f"{p}encoder.layer.{i}", f + (f"layer_{i}",))
    m += _dense(f"{p}pooler.dense", f + ("pooler", "dense"))
    if answer_head:
        m += _dense("logit_fc.0", ("answer_head", "dense"))
        m += _ln("logit_fc.2", ("answer_head", "ln"))
        m += _dense("logit_fc.3", ("answer_head", "logits"))
    return m


def assign_into_tree(
    params: Any,
    state_dict: Mapping[str, np.ndarray],
    key_map: list[tuple[str, tuple, bool]],
    *,
    strict: bool = False,
    torch_prefix: str = "",
) -> tuple[Any, list[str], list[str]]:
    """Copy mapped torch tensors into (a copy of) the flax param tree.

    Returns (new_params, missing_torch_keys, unused_torch_keys) — the same
    diff the reference prints on load (``src/lxrt/entry.py:138-149``).
    """
    import jax

    flat = dict(state_dict)
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def setpath(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{old.shape} vs {value.shape}"
            )
        node[path[-1]] = value.astype(np.asarray(old).dtype)

    # flax FrozenDict vs plain dict: work on plain nested dicts.
    new = jax.tree_util.tree_map(np.asarray, _to_mutable(new))

    missing, used = [], set()
    for tkey, fpath, transpose in key_map:
        tk = torch_prefix + tkey
        if tk not in flat:
            missing.append(tk)
            continue
        val = flat[tk]
        if transpose:
            val = val.T
        # NOT ascontiguousarray: it promotes 0-d scalars (weight-norm g) to 1-d.
        setpath(new, fpath, np.asarray(val, order="C"))
        used.add(tk)
    unused = [k for k in flat if k not in used]
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]}...")
    return new, missing, unused


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def import_lxmert_gqa(
    params: Any,
    path: str,
    *,
    l_layers: int = 9,
    x_layers: int = 5,
    r_layers: int = 5,
    branched: bool = False,
    from_pretrain: bool = False,
) -> tuple[Any, list[str], list[str]]:
    """Import a reference GQA-LXMERT ``.pth`` into LxmertForGQA params.

    ``from_pretrain`` loads a bare-encoder checkpoint
    (``model_LXRT.pth``, keys ``bert.*``) instead of a full GQA model
    (keys ``lxrt_encoder.model.bert.*`` + ``logit_fc.*``).
    """
    sd = load_torch_state_dict(path)
    prefix = "" if from_pretrain else "lxrt_encoder.model."
    key_map = lxmert_key_map(
        l_layers, x_layers, r_layers,
        answer_head=not from_pretrain,
        branched=branched,
    )
    key_map = [
        (("" if t.startswith("logit_fc") or t.startswith("conf_fc") else prefix) + t, f, tr)
        for t, f, tr in key_map
    ]
    return assign_into_tree(params, sd, key_map)


def lxmert_pretrain_key_map(
    l_layers: int = 9, x_layers: int = 5, r_layers: int = 5
) -> list[tuple[str, tuple, bool]]:
    """Key map for LXRTPretraining checkpoints (``model_LXRT.pth``;
    reference ``modeling.py:889-921``): the encoder plus MLM head
    (``cls.predictions``), matched head (``cls.seq_relationship``), visual
    heads (``obj_predict_head``), and the 9500-answer QA head."""
    m = lxmert_key_map(l_layers, x_layers, r_layers, answer_head=False)
    m += _dense("cls.predictions.transform.dense", ("mlm_head", "dense"))
    m += _ln("cls.predictions.transform.LayerNorm", ("mlm_head", "ln"))
    m.append(("cls.predictions.bias", ("mlm_head", "bias"), False))
    m += _dense("cls.seq_relationship", ("matched_head",))
    m += _dense("obj_predict_head.transform.dense", ("obj_head", "dense"))
    m += _ln("obj_predict_head.transform.LayerNorm", ("obj_head", "ln"))
    for key in ("obj", "attr", "feat"):
        m += _dense(
            f"obj_predict_head.decoder_dict.{key}",
            ("obj_head", f"decoder_{key}"),
        )
    m += _dense("answer_head.logit_fc.0", ("answer_head", "dense"))
    m += _ln("answer_head.logit_fc.2", ("answer_head", "ln"))
    m += _dense("answer_head.logit_fc.3", ("answer_head", "logits"))
    return m


def import_lxmert_pretraining(
    params: Any,
    path: str,
    *,
    l_layers: int = 9,
    x_layers: int = 5,
    r_layers: int = 5,
) -> tuple[Any, list[str], list[str]]:
    """Import a reference pretraining ``.pth`` into LxmertPretraining params
    (the lxrcap match scorer's checkpoint, ``gqa_lxrcap.py``)."""
    sd = load_torch_state_dict(path)
    # The tied MLM decoder weight duplicates the word embedding; drop it.
    sd.pop("cls.predictions.decoder.weight", None)
    return assign_into_tree(
        params, sd, lxmert_pretrain_key_map(l_layers, x_layers, r_layers)
    )


def butd_key_map(*, branched: bool = False) -> list[tuple[str, tuple, bool]]:
    """Key map for BUTD checkpoints (``src/butd/butd.py:107-221``).

    torch ``weight_norm(..., dim=None)`` stores ``weight_g`` (scalar norm
    gain) + ``weight_v``; these map onto WeightNormDense's ``g``/``v``
    (same parameterization, ``w = g * v / ||v||_F``).  The GRU's
    ``weight_ih_l0``/``weight_hh_l0`` are already (3H, in) — no transpose.
    """

    def wn(tkey: str, fpath: tuple) -> list:
        return [
            (f"{tkey}.weight_g", fpath + ("g",), False),
            (f"{tkey}.weight_v", fpath + ("v",), False),
            (f"{tkey}.bias", fpath + ("b",), False),
        ]

    m: list = [
        ("w_emb.emb.weight", ("w_emb", "embedding"), False),
        ("q_enc.rnn.weight_ih_l0", ("gru_w_ih",), False),
        ("q_enc.rnn.weight_hh_l0", ("gru_w_hh",), False),
        ("q_enc.rnn.bias_ih_l0", ("gru_b_ih",), False),
        ("q_enc.rnn.bias_hh_l0", ("gru_b_hh",), False),
    ]
    m += wn("att.image_proj.mlp.0", ("att", "image_proj"))
    m += wn("att.question_proj.mlp.0", ("att", "question_proj"))
    m += wn("att.linear", ("att", "linear"))
    m += wn("q_project.mlp.0", ("q_project",))
    m += wn("img_project.mlp.0", ("img_project",))
    m += wn("ans_classifier.0", ("ans_fc1",))
    m += wn("ans_classifier.3", ("ans_fc2",))
    if branched:
        m += wn("conf_classifier.0", ("conf_fc1",))
        m += wn("conf_classifier.3", ("conf_fc2",))
    return m


def import_butd_gqa(
    params: Any, path: str, *, branched: bool = False
) -> tuple[Any, list[str], list[str]]:
    """Import a reference GQA-BUTD ``.pth`` into ButdForGQA params."""
    sd = load_torch_state_dict(path)
    # weight_g under dim=None carries singleton dims; flatten to scalar.
    for k in list(sd):
        if k.endswith("weight_g"):
            sd[k] = np.asarray(sd[k]).reshape(())
    return assign_into_tree(params, sd, butd_key_map(branched=branched))


def load_lxmert_qa(
    params: Any,
    path: str,
    label2ans: list[str] | Mapping[int, str],
    *,
    src_ans2id: Mapping[str, int],
    l_layers: int = 9,
    x_layers: int = 5,
    r_layers: int = 5,
    convert_ans=None,
) -> tuple[Any, int, int]:
    """Answer-head transplant from a QA-pretrained LXMERT
    (reference ``load_lxmert_qa``, ``qa_answer_table.py:84-158``).

    Loads the encoder (``bert.*``), copies the pretraining answer head's
    dense+LN, and remaps the final-layer rows **by answer string**: rows
    whose answer exists in the 9500-answer pretraining vocab are copied,
    the rest zeroed.  Returns (params, n_loaded, n_zeroed).
    """
    sd = load_torch_state_dict(path)
    enc_map = lxmert_key_map(
        l_layers, x_layers, r_layers, answer_head=False
    )
    params, _, _ = assign_into_tree(params, sd, enc_map)
    head_map = [
        *_dense("answer_head.logit_fc.0", ("answer_head", "dense")),
        *_ln("answer_head.logit_fc.2", ("answer_head", "ln")),
    ]
    params, _, _ = assign_into_tree(params, sd, head_map)

    ans_w = sd["answer_head.logit_fc.3.weight"]  # (9500, hidden)
    ans_b = sd["answer_head.logit_fc.3.bias"]
    kernel = np.array(params["answer_head"]["logits"]["kernel"])  # (h, A)
    bias = np.array(params["answer_head"]["logits"]["bias"])  # (A,)
    if isinstance(label2ans, Mapping):
        items = label2ans.items()
    else:
        items = enumerate(label2ans)
    loaded = zeroed = 0
    for label, ans in items:
        if label >= kernel.shape[1]:
            continue
        key = convert_ans(ans) if convert_ans else ans
        if key in src_ans2id:
            sid = src_ans2id[key]
            kernel[:, label] = ans_w[sid]
            bias[label] = ans_b[sid]
            loaded += 1
        else:
            kernel[:, label] = 0.0
            bias[label] = 0.0
            zeroed += 1
    params["answer_head"]["logits"]["kernel"] = kernel
    params["answer_head"]["logits"]["bias"] = bias
    return params, loaded, zeroed


def import_uniter_gqa(
    params: Any, path: str, *, num_layers: int = 12
) -> tuple[Any, list[str], list[str]]:
    """Import a reference GQA-UNITER ``.pth`` into UniterForGQA params."""
    sd = load_torch_state_dict(path)
    # UNITER GQA models wrap the encoder as ``encoder.model.uniter.*``
    # (uniter/entry.py + uniter.py); bare pretrained ckpts use ``bert.*``
    # or ``uniter.*``.
    if any(k.startswith("encoder.model.") for k in sd):
        prefix = "encoder.model.uniter."
    elif any(k.startswith("uniter.") for k in sd):
        prefix = "uniter."
    else:
        prefix = "bert."
    key_map = uniter_key_map(
        num_layers,
        encoder_prefix=prefix,
        answer_head=any(k.startswith("logit_fc") for k in sd),
    )
    return assign_into_tree(params, sd, key_map)


def vilt_key_map(num_layers: int = 12) -> list[tuple[str, tuple, bool]]:
    """Key map for reference GQAViLT checkpoints (``src/vilt/vilt.py:8-44``
    over the vendored timm ViT-B/32, ``src/vilt/modules/
    vision_transformer.py``).

    Expects the fused ``attn.qkv`` tensors to have been pre-split into
    ``attn.{query,key,value}`` by :func:`import_vilt_gqa`.
    """
    m: list[tuple[str, tuple, bool]] = []
    m += _embeddings("text_embeddings", ("text_embeddings",))
    # GQAViLT's own modality token-type table (vilt.py:28-29).
    m.append(
        ("token_type_embeddings.weight", ("modality_type", "embedding"), False)
    )
    m.append(("transformer.cls_token", ("cls_token",), False))
    m.append(("transformer.pos_embed", ("pos_embed",), False))
    # Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out):
    # handled with a custom transpose marker below (import_vilt_gqa).
    m.append(
        ("transformer.patch_embed.proj.weight#conv",
         ("patch_embed", "proj", "kernel"), False)
    )
    m.append(
        ("transformer.patch_embed.proj.bias",
         ("patch_embed", "proj", "bias"), False)
    )
    for i in range(num_layers):
        t = f"transformer.blocks.{i}"
        f = (f"block_{i}",)
        m += _ln(f"{t}.norm1", f + ("norm1",))
        for name in ("query", "key", "value"):
            m += _dense(f"{t}.attn.{name}", f + (name,))
        m += _dense(f"{t}.attn.proj", f + ("att_out",))
        m += _ln(f"{t}.norm2", f + ("norm2",))
        m += _dense(f"{t}.mlp.fc1", f + ("mlp_in",))
        m += _dense(f"{t}.mlp.fc2", f + ("mlp_out",))
    m += _ln("transformer.norm", ("norm",))
    m += _dense("pooler.dense", ("pooler", "dense"))
    m += _dense("vqa_classifier.0", ("answer_head", "dense"))
    m += _ln("vqa_classifier.1", ("answer_head", "ln"))
    m += _dense("vqa_classifier.3", ("answer_head", "logits"))
    return m


def bert_caps_key_map(
    num_layers: int = 12, *, pooler: bool = True, match_head: bool = False
) -> list[tuple[str, tuple, bool]]:
    """Key map for a plain HF ``BertModel`` state_dict onto
    :class:`rgqa_tpu.models.caps.CaptionMatcher` (the Q-C matcher's
    ``BertModel.from_pretrained("bert-base-uncased")`` init,
    ``src/caps/caps.py:17``).  ``match_head`` additionally maps a trained
    GQABERT checkpoint's ``logit_fc`` head (``caps.py:23-28``)."""
    m: list = []
    m += _embeddings("embeddings", ("embeddings",))
    for i in range(num_layers):
        m += _bert_layer(f"encoder.layer.{i}", (f"layer_{i}",))
    if pooler:
        m += _dense("pooler.dense", ("pooler", "dense"))
    if match_head:
        m += _dense("logit_fc.0", ("match_head", "dense"))
        m += _ln("logit_fc.2", ("match_head", "ln"))
        m += _dense("logit_fc.3", ("match_head", "logits"))
    return m


def import_bert_caps(
    params: Any, path: str, *, num_layers: int = 12
) -> tuple[Any, list[str], list[str]]:
    """Import an HF BERT (or a trained reference GQABERT) ``.pth``/
    ``.bin`` into CaptionMatcher params.

    Accepts three layouts: a bare ``BertModel`` state_dict
    (``embeddings.* / encoder.layer.*``), a task model carrying a
    ``bert.`` prefix (``BertForPreTraining`` and friends), and the
    reference's trained matcher (``encoder.*`` BertModel inside GQABERT +
    ``logit_fc.*`` head, ``caps.py:14-28``).  ``path`` may also be an HF
    checkpoint dir containing ``pytorch_model.bin``."""
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin/model.bin under {path!r} "
                "(safetensors-only checkpoints are not supported here)"
            )
    sd = dict(load_torch_state_dict(path))
    for key in list(sd):
        if key.endswith("position_ids"):
            sd.pop(key)  # buffer, not a parameter
    if any(k.startswith("encoder.embeddings.") for k in sd):
        prefix = "encoder."  # trained GQABERT (caps.py wraps BertModel)
    elif any(k.startswith("bert.") for k in sd):
        prefix = "bert."
    else:
        prefix = ""
    has_head = any(k.startswith("logit_fc") for k in sd)
    key_map = [
        (
            (("" if t.startswith("logit_fc") else prefix) + t),
            f,
            tr,
        )
        for t, f, tr in bert_caps_key_map(
            num_layers, match_head=has_head
        )
    ]
    return assign_into_tree(params, sd, key_map)


def clip_key_map(
    vision_layers: int = 12, text_layers: int = 12
) -> list[tuple[str, tuple, bool]]:
    """Key map for HF ``CLIPModel`` checkpoints
    (``openai/clip-vit-base-patch32``; reference loads them in
    ``src/tasks/gqa_clip.py:76-79`` / ``gqa_weight.py:80``).

    The patch-embedding Conv2d weight (out, in, kh, kw) is pre-transposed
    by :func:`import_clip` (marker ``#conv``); projections are bias-free.
    """

    def clip_layer(tprefix: str, fprefix: tuple) -> list:
        m: list = []
        m += _ln(f"{tprefix}.layer_norm1", fprefix + ("layer_norm1",))
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m += _dense(f"{tprefix}.self_attn.{name}", fprefix + (name,))
        m += _ln(f"{tprefix}.layer_norm2", fprefix + ("layer_norm2",))
        m += _dense(f"{tprefix}.mlp.fc1", fprefix + ("fc1",))
        m += _dense(f"{tprefix}.mlp.fc2", fprefix + ("fc2",))
        return m

    m: list = [("logit_scale", ("logit_scale",), False)]
    # Text tower.
    m.append(
        ("text_model.embeddings.token_embedding.weight",
         ("text_model", "token_embedding", "embedding"), False)
    )
    m.append(
        ("text_model.embeddings.position_embedding.weight",
         ("text_model", "position_embedding", "embedding"), False)
    )
    for i in range(text_layers):
        m += clip_layer(
            f"text_model.encoder.layers.{i}", ("text_model", f"layers_{i}")
        )
    m += _ln(
        "text_model.final_layer_norm", ("text_model", "final_layer_norm")
    )
    m.append(
        ("text_projection.weight", ("text_projection", "kernel"), True)
    )
    # Vision tower.
    m.append(
        ("vision_model.embeddings.class_embedding",
         ("vision_model", "class_embedding"), False)
    )
    m.append(
        ("vision_model.embeddings.patch_embedding.weight#conv",
         ("vision_model", "patch_embedding", "kernel"), False)
    )
    m.append(
        ("vision_model.embeddings.position_embedding.weight",
         ("vision_model", "position_embedding", "embedding"), False)
    )
    # HF spells it "pre_layrnorm" (sic).
    m += _ln("vision_model.pre_layrnorm", ("vision_model", "pre_layernorm"))
    for i in range(vision_layers):
        m += clip_layer(
            f"vision_model.encoder.layers.{i}",
            ("vision_model", f"layers_{i}"),
        )
    m += _ln(
        "vision_model.post_layernorm", ("vision_model", "post_layernorm")
    )
    m.append(
        ("visual_projection.weight", ("visual_projection", "kernel"), True)
    )
    return m


def import_clip(
    params: Any,
    path: str,
    *,
    vision_layers: int = 12,
    text_layers: int = 12,
) -> tuple[Any, list[str], list[str]]:
    """Import an HF ``CLIPModel`` ``.bin``/``.pth`` state_dict into
    :class:`rgqa_tpu.models.clip.ClipModel` params.  ``path`` may be the
    checkpoint file or an HF checkpoint dir (``pytorch_model.bin``)."""
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.bin", "pytorch_model.pth"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin under {path!r} (safetensors-only "
                "checkpoints are not supported in this zero-egress env)"
            )
    sd = dict(load_torch_state_dict(path))
    for key in list(sd):
        if key.endswith("position_ids"):
            sd.pop(key)  # non-parameter buffers
        elif key == "vision_model.embeddings.patch_embedding.weight":
            # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out).
            sd[key + "#conv"] = sd.pop(key).transpose(2, 3, 1, 0)
    return assign_into_tree(
        params, sd, clip_key_map(vision_layers, text_layers)
    )


def import_vilt_gqa(
    params: Any, path: str, *, num_layers: int = 12
) -> tuple[Any, list[str], list[str]]:
    """Import a reference GQAViLT ``.pth`` into ViltForGQA params.

    Handles the two layout differences a plain key map cannot express:
    the vendored timm blocks use one fused ``attn.qkv`` Linear (2304 rows
    split here into query/key/value), and the patch-embedding Conv2d
    weight is (out, in, kh, kw) in torch vs (kh, kw, in, out) in flax.
    """
    sd = dict(load_torch_state_dict(path))
    e = None
    for key in list(sd):
        if key.endswith(".attn.qkv.weight"):
            w = sd.pop(key)  # (3E, E)
            e = w.shape[1]
            base = key[: -len("qkv.weight")]
            sd[base + "query.weight"] = w[:e]
            sd[base + "key.weight"] = w[e : 2 * e]
            sd[base + "value.weight"] = w[2 * e :]
        elif key.endswith(".attn.qkv.bias"):
            b = sd.pop(key)
            e = b.shape[0] // 3
            base = key[: -len("qkv.bias")]
            sd[base + "query.bias"] = b[:e]
            sd[base + "key.bias"] = b[e : 2 * e]
            sd[base + "value.bias"] = b[2 * e :]
        elif key == "transformer.patch_embed.proj.weight":
            sd[key + "#conv"] = sd.pop(key).transpose(2, 3, 1, 0)
        elif key.endswith("position_ids"):
            sd.pop(key)  # HF BertEmbeddings buffer, not a parameter
    return assign_into_tree(params, sd, vilt_key_map(num_layers))
