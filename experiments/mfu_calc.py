"""Analytic dense-op FLOPs per question and MFU for every backbone.

Counts matmul/conv FLOPs only (2*m*k*n per (m,k)@(k,n); embedding
gathers, LayerNorms, softmaxes, and elementwise chains are excluded —
the standard MFU convention), using the SHIPPED model shapes from
rgqa_tpu.config, and divides the measured bench.py throughput by the
v5e bf16 peak (197 TFLOP/s) to get model FLOP utilization.

The measured q/s numbers below are the chained-scan single-chip figures
from docs/kernels.md "Per-backbone inference throughput" (batch 384)
and "TPU-native CLIP" (batch 256).  Run after re-benching to refresh
the table in docs/kernels.md "Backbone roofline (MFU)".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TFLOP/s (TPU v5e, bf16 MXU)

# docs/kernels.md measured throughputs (q/s/chip, chained scan, bf16).
MEASURED = {
    "lxmert": 11144.0,
    "uniter": 10120.0,
    "butd": 93648.0,
    "vilt": 3756.0,
    "clip": 10498.0,  # pairs/s, batch 256
}


def mm(m, k, n):
    return 2.0 * m * k * n


def bert_layer(s, e, f, s_kv=None):
    """Self-att (QKV+out) + scores/PV + FFN for one stream of length s."""
    s_kv = s if s_kv is None else s_kv
    att_proj = mm(s, e, e) * 3 + mm(s, e, e)  # QKV + out
    att_core = mm(s, s_kv, e) * 2  # scores + PV
    ffn = mm(s, e, f) + mm(s, f, e)
    return att_proj + att_core + ffn


def lxmert_flops(cfg):
    e = cfg.encoder.hidden_size
    f = cfg.encoder.intermediate_size
    sl, sv = cfg.max_text_len, cfg.encoder.num_objects
    total = mm(sv, cfg.encoder.visual_feat_dim, e) + mm(sv, 4, e)
    total += cfg.encoder.l_layers * bert_layer(sl, e, f)
    total += cfg.encoder.r_layers * bert_layer(sv, e, f)
    # x-layer: bidirectional cross (shared weights, computed both ways:
    # Q+out on each stream, K+V on the other) + per-modality self + FFN.
    cross = (
        mm(sl, e, e) * 2 + mm(sv, e, e) * 2  # Q+out both directions
        + mm(sv, e, e) * 2 + mm(sl, e, e) * 2  # K+V both directions
        + mm(sl, sv, e) * 2 + mm(sv, sl, e) * 2  # scores+PV both
    )
    self_ffn = (
        mm(sl, e, e) * 4 + mm(sl, sl, e) * 2 + mm(sl, e, f) + mm(sl, f, e)
        + mm(sv, e, e) * 4 + mm(sv, sv, e) * 2 + mm(sv, e, f) + mm(sv, f, e)
    )
    total += cfg.encoder.x_layers * (cross + self_ffn)
    total += mm(1, e, e)  # pooler
    total += mm(1, e, 2 * e) + mm(1, 2 * e, cfg.num_answers)  # answer head
    return total


def uniter_flops(cfg):
    e = cfg.encoder.hidden_size
    f = cfg.encoder.intermediate_size
    s = cfg.max_text_len + cfg.encoder.num_objects
    total = mm(cfg.encoder.num_objects, cfg.encoder.visual_feat_dim, e)
    total += mm(cfg.encoder.num_objects, 7, e)
    total += cfg.encoder.num_layers * bert_layer(s, e, f)
    total += mm(1, e, e)
    total += mm(1, e, 2 * e) + mm(1, 2 * e, cfg.num_answers)
    return total


def butd_flops(cfg):
    h = cfg.butd_hidden_dim
    emb = cfg.butd_embed_dim
    s = 40  # MAX_GQA_LENGTH, front-padded
    k = cfg.encoder.num_objects
    img_dim = cfg.encoder.visual_feat_dim + 4  # concat feats+boxes = 2052
    total = mm(s, emb, 3 * h)  # hoisted GRU input projection
    total += s * mm(1, h, 3 * h)  # recurrent matmuls (sequential!)
    total += mm(k, img_dim, h) + mm(1, h, h)  # attention projections
    total += mm(k, h, 1)  # attention logits
    total += mm(1, img_dim, h) + mm(1, h, h)  # img/q projections
    total += mm(1, h, 2 * h) + mm(1, 2 * h, cfg.num_answers)
    return total


def vilt_flops(cfg):
    e = cfg.encoder.hidden_size
    f = cfg.encoder.intermediate_size
    n_patch = (cfg.vilt_image_size // cfg.vilt_patch_size) ** 2
    s = n_patch + 1 + cfg.max_text_len
    total = mm(n_patch, cfg.vilt_patch_size ** 2 * 3, e)  # conv patch embed
    total += cfg.encoder.num_layers * bert_layer(s, e, f)
    total += mm(1, e, e)  # pooler
    total += mm(1, e, 2 * e) + mm(1, 2 * e, cfg.num_answers)
    return total


def clip_flops():
    # openai/clip-vit-base-patch32: vision E=768 F=3072 S=50 (49 patches
    # + cls at 224px/32), text E=512 F=2048 S=77, projection dim 512.
    ev, fv, sv = 768, 3072, 50
    et, ft, st = 512, 2048, 77
    total = mm(49, 32 * 32 * 3, ev)  # conv patch embed
    total += 12 * bert_layer(sv, ev, fv)
    total += 12 * bert_layer(st, et, ft)
    total += mm(1, ev, 512) + mm(1, et, 512)  # projections
    return total


def main():
    from rgqa_tpu.config import ModelConfig

    rows = [
        ("lxmert", lxmert_flops(ModelConfig(backbone="lxmert"))),
        ("uniter", uniter_flops(ModelConfig(backbone="uniter"))),
        ("butd", butd_flops(ModelConfig(backbone="butd"))),
        ("vilt", vilt_flops(ModelConfig(backbone="vilt"))),
        ("clip", clip_flops()),
    ]
    print(f"{'backbone':8s} {'GFLOP/q':>9s} {'q/s':>9s} {'TFLOP/s':>9s} {'MFU':>6s}")
    for name, fl in rows:
        qps = MEASURED[name]
        tf = fl * qps / 1e12
        print(
            f"{name:8s} {fl / 1e9:9.2f} {qps:9.0f} {tf:9.1f} "
            f"{100 * tf * 1e12 / V5E_BF16_PEAK:5.1f}%"
        )


if __name__ == "__main__":
    main()
