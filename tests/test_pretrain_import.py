"""LXRTPretraining checkpoint import + match/MLM forward parity, and the
answer-head transplant (load_lxmert_qa)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.config import EncoderConfig, ModelConfig
from rgqa_tpu.models.lxmert import LxmertPretraining
from rgqa_tpu.models.zoo import example_batch
from test_torch_import import _stub_boto3

SHAPE = dict(l_layers=2, x_layers=1, r_layers=1)
ENC = EncoderConfig(
    hidden_size=64, num_heads=4, intermediate_size=128, vocab_size=300,
    visual_feat_dim=48, num_objects=5, obj_vocab_size=30, attr_vocab_size=10,
    **SHAPE,
)
NUM_QA = 17


@pytest.fixture(scope="module")
def ref_pretrain(reference_dir):
    torch = pytest.importorskip("torch")
    _stub_boto3()
    sys.path.insert(0, str(reference_dir / "src"))
    try:
        from lxrt import modeling
    finally:
        sys.path.pop(0)
    modeling.VISUAL_CONFIG.l_layers = SHAPE["l_layers"]
    modeling.VISUAL_CONFIG.x_layers = SHAPE["x_layers"]
    modeling.VISUAL_CONFIG.r_layers = SHAPE["r_layers"]
    modeling.VISUAL_CONFIG.set_visual_dims(ENC.visual_feat_dim, 4)
    # visual_loss_config is baked at VisualConfig() construction and NOT
    # refreshed by set_visual_dims (modeling.py:158-166) — patch the head
    # dims to the test shapes.
    vlc = modeling.VISUAL_CONFIG.visual_loss_config
    vlc["obj"] = (ENC.obj_vocab_size, *vlc["obj"][1:])
    vlc["attr"] = (ENC.attr_vocab_size, *vlc["attr"][1:])
    # feat's label_shape (-1, 2048) must track the test feat dim too —
    # the loss path views the regression target through it.
    vlc["feat"] = (
        ENC.visual_feat_dim, vlc["feat"][1],
        (-1, ENC.visual_feat_dim), vlc["feat"][3],
    )
    cfg = modeling.BertConfig(
        vocab_size_or_config_json_file=ENC.vocab_size,
        hidden_size=ENC.hidden_size,
        num_hidden_layers=2,
        num_attention_heads=ENC.num_heads,
        intermediate_size=ENC.intermediate_size,
    )
    torch.manual_seed(0)
    model = modeling.LXRTPretraining(
        cfg, visual_losses="obj,attr,feat", num_answers=NUM_QA
    )
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    model.eval()
    return model


def _jax_setup(tmp_path, ref, torch):
    torch.save(ref.state_dict(), tmp_path / "pre.pth")
    model = LxmertPretraining(ENC, num_answers=NUM_QA)
    cfg = ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=7)
    batch = example_batch(cfg, batch_size=3, seed=1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        jb["input_ids"], jb["input_mask"], jb["segment_ids"],
        jb["feats"], jb["boxes"],
    )["params"]
    from rgqa_tpu.checkpoint import import_lxmert_pretraining

    params, missing, unused = import_lxmert_pretraining(
        params, str(tmp_path / "pre.pth"), **SHAPE
    )
    return model, params, batch, jb, missing, unused


class TestPretrainImportParity:
    def test_match_and_mlm_forward_parity(self, ref_pretrain, tmp_path):
        import torch

        model, params, batch, jb, missing, unused = _jax_setup(
            tmp_path, ref_pretrain, torch
        )
        assert not missing, missing[:5]
        assert not unused, unused[:5]

        out = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
        )
        with torch.no_grad():
            match_t = ref_pretrain.forward_match(
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["segment_ids"], dtype=torch.long),
                torch.tensor(batch["input_mask"], dtype=torch.long),
                visual_feats=torch.tensor(batch["feats"]),
                pos=torch.tensor(batch["boxes"]),
            ).numpy()
            (lang_out, _), pooled = ref_pretrain.bert(
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["segment_ids"], dtype=torch.long),
                torch.tensor(batch["input_mask"], dtype=torch.long),
                visual_feats=(
                    torch.tensor(batch["feats"]),
                    torch.tensor(batch["boxes"]),
                ),
            )
            mlm_t, _ = ref_pretrain.cls(lang_out, pooled)
            mlm_t = mlm_t.numpy()

        np.testing.assert_allclose(
            np.asarray(out["matched"]), match_t, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["mlm"]), mlm_t, rtol=2e-4, atol=2e-4
        )

    def test_visual_heads_and_loss_parity(self, ref_pretrain, tmp_path):
        """Pin the obj-CE / attr-CE / feat-SmoothL1 heads AND the full
        5-loss composition (1/0.15 visual weighting) against the torch
        reference forward (``modeling.py:922-989``)."""
        import torch

        from rgqa_tpu.pretrain.losses import pretrain_loss

        model, params, batch, jb, _, _ = _jax_setup(
            tmp_path, ref_pretrain, torch
        )
        B, R = batch["feats"].shape[:2]
        rng = np.random.default_rng(7)
        obj_l = rng.integers(0, ENC.obj_vocab_size, (B, R)).astype(np.int32)
        attr_l = rng.integers(0, ENC.attr_vocab_size, (B, R)).astype(np.int32)
        # mask_conf: fractional confidences (the reference feeds detector
        # confidences, not just 0/1) with some exact zeros.
        conf = rng.random((B, R)).astype(np.float32)
        conf[rng.random((B, R)) < 0.3] = 0.0
        lm_l = rng.integers(0, ENC.vocab_size, batch["input_ids"].shape)
        lm_l[rng.random(lm_l.shape) < 0.7] = -1  # CE ignore_index=-1
        lm_l = lm_l.astype(np.int32)
        matched = rng.integers(0, 2, (B,)).astype(np.int32)
        ans = rng.integers(0, NUM_QA, (B,)).astype(np.int32)
        ans[0] = -1  # unlabeled questions carry -1 (ignored)

        out = model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
        )
        total, parts = pretrain_loss(
            out,
            lm_labels=jnp.asarray(lm_l),
            matched=jnp.asarray(matched),
            obj_labels=jnp.asarray(obj_l),
            attr_labels=jnp.asarray(attr_l),
            feat_target=jb["feats"].astype(jnp.float32),
            feat_mask=jnp.asarray(conf),
            ans=jnp.asarray(ans),
        )

        with torch.no_grad():
            obj_labels = {
                "obj": (torch.tensor(obj_l, dtype=torch.long),
                        torch.tensor(conf)),
                "attr": (torch.tensor(attr_l, dtype=torch.long),
                         torch.tensor(conf)),
                "feat": (torch.tensor(batch["feats"]), torch.tensor(conf)),
            }
            total_t, losses_t, _ = ref_pretrain(
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["segment_ids"], dtype=torch.long),
                torch.tensor(batch["input_mask"], dtype=torch.long),
                masked_lm_labels=torch.tensor(lm_l, dtype=torch.long),
                visual_feats=torch.tensor(batch["feats"]),
                pos=torch.tensor(batch["boxes"]),
                obj_labels=obj_labels,
                matched_label=torch.tensor(matched, dtype=torch.long),
                ans=torch.tensor(ans, dtype=torch.long),
            )
            # Raw head outputs, for the logit-level pin.
            (_, visn_out), _ = ref_pretrain.bert(
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["segment_ids"], dtype=torch.long),
                torch.tensor(batch["input_mask"], dtype=torch.long),
                visual_feats=(
                    torch.tensor(batch["feats"]),
                    torch.tensor(batch["boxes"]),
                ),
            )
            visn_t = {
                k: v.numpy()
                for k, v in ref_pretrain.obj_predict_head(visn_out).items()
            }

        for key in ("obj", "attr", "feat"):
            np.testing.assert_allclose(
                np.asarray(out["visn"][key]), visn_t[key],
                rtol=2e-4, atol=2e-4, err_msg=f"visn head {key}",
            )
        # Per-task losses, reference order (mask_lm, matched,
        # VISUAL_LOSSES order, qa) — modeling.py:940-989.
        losses_t = losses_t.numpy()[0]
        order = ("mask_lm", "matched", "obj", "attr", "feat", "qa")
        assert len(losses_t) == len(order)
        for i, key in enumerate(order):
            np.testing.assert_allclose(
                float(parts[key]), losses_t[i], rtol=5e-4, atol=5e-5,
                err_msg=f"loss {key}",
            )
        # QA loss ignores the -1 row: recompute with the row restored and
        # check it moves (guards the masked_ce ignore path).
        np.testing.assert_allclose(float(total), float(total_t), rtol=5e-4)

    def test_load_lxmert_qa_transplant(self, ref_pretrain, tmp_path):
        import torch

        from rgqa_tpu.checkpoint import load_lxmert_qa
        from rgqa_tpu.models.zoo import build_model

        torch.save(ref_pretrain.state_dict(), tmp_path / "qa.pth")
        cfg = ModelConfig(
            backbone="lxmert", encoder=ENC, num_answers=5, max_text_len=7
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=2, seed=0)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0),
            jb["input_ids"], jb["input_mask"], jb["segment_ids"],
            jb["feats"], jb["boxes"],
        )["params"]

        # Pretraining vocab: ids 0..NUM_QA-1 named a0..a16; finetune vocab
        # overlaps on 3 answers.
        src_ans2id = {f"a{i}": i for i in range(NUM_QA)}
        label2ans = ["a3", "zzz", "a7", "unknown", "a0"]
        params, loaded, zeroed = load_lxmert_qa(
            params, str(tmp_path / "qa.pth"), label2ans,
            src_ans2id=src_ans2id, **SHAPE,
        )
        assert loaded == 3 and zeroed == 2
        kernel = np.asarray(params["answer_head"]["logits"]["kernel"])
        sd = {k: v.detach().numpy() for k, v in ref_pretrain.state_dict().items()}
        ans_w = sd["answer_head.logit_fc.3.weight"]
        np.testing.assert_allclose(kernel[:, 0], ans_w[3], rtol=1e-6)
        np.testing.assert_allclose(kernel[:, 2], ans_w[7], rtol=1e-6)
        np.testing.assert_allclose(kernel[:, 1], 0.0)
        np.testing.assert_allclose(kernel[:, 3], 0.0)


class TestRunnerLoadLxmertQa:
    def test_runner_wires_loadLXMERTQA(self, ref_pretrain, tmp_path):
        """--loadLXMERTQA must transplant encoder + answer head into the
        runner's params (the reference's standard finetune init)."""
        import json
        import os

        import torch

        from rgqa_tpu.config import (
            DataConfig, ModelConfig, OptimConfig, RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.runner import GQARunner

        root = str(tmp_path / "gqa")
        make_synthetic_gqa(
            root, SyntheticSpec(n_images=8, n_train=16, n_valid=8, n_testdev=8,
                                num_boxes=ENC.num_objects,
                                feat_dim=ENC.visual_feat_dim)
        )
        torch.save(ref_pretrain.state_dict(), tmp_path / "qa_LXRT.pth")
        # Pretraining answer vocab covering some synthetic answers.
        with open(os.path.join(root, "trainval_label2ans.json")) as f:
            answers = json.load(f)
        all_ans = [{"ans": a, "dsets": ["gqa"]} for a in answers[:NUM_QA]]
        with open(os.path.join(root, "all_ans.json"), "w") as f:
            json.dump(all_ans, f)

        cfg = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=ENC, max_text_len=7),
            train=TrainConfig(batch_size=8, epochs=1, optim=OptimConfig(lr=1e-3),
                              use_bf16=False),
            data=DataConfig(data_root=root, synthetic=True),
            output=str(tmp_path / "snap"),
            load_lxmert_qa=str(tmp_path / "qa"),  # runner appends _LXRT.pth
        )
        runner = GQARunner(cfg)
        # Encoder weights must equal the pretraining checkpoint's.
        sd = {k: v.detach().numpy() for k, v in ref_pretrain.state_dict().items()}
        word = np.asarray(
            runner.params["lxmert"]["embeddings"]["word_embeddings"]["embedding"]
        )
        np.testing.assert_allclose(
            word, sd["bert.embeddings.word_embeddings.weight"], rtol=1e-6
        )
        # Transplanted answer rows: column c equals pretraining row for the
        # matching answer string; unmatched columns are zero.
        kernel = np.asarray(runner.params["answer_head"]["logits"]["kernel"])
        ans_w = sd["answer_head.logit_fc.3.weight"]
        src = {a["ans"]: i for i, a in enumerate(all_ans)}
        hits = zeros = 0
        for col, ans in enumerate(runner.label2ans[: kernel.shape[1]]):
            key = ans.lower()
            if key in src:
                np.testing.assert_allclose(kernel[:, col], ans_w[src[key]], rtol=1e-5)
                hits += 1
            else:
                np.testing.assert_allclose(kernel[:, col], 0.0)
                zeros += 1
        assert hits > 0 and zeros > 0
