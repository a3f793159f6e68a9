"""TPU-native CLIP: forward parity vs in-process torch HF CLIP, tokenizer
parity vs HF CLIPTokenizer, image-pipeline parity vs CLIPImageProcessor,
and the ClipScorer end-to-end on a local tiny checkpoint.

Pattern follows tests/test_vilt_import.py: the torch side is built
in-process from the reference architecture (HF ``CLIPModel``, the exact
class ``src/tasks/gqa_clip.py:76-79`` loads) with random weights — no
downloads.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rgqa_tpu.data.clip_tokenizer import ClipBPETokenizer, bytes_to_unicode

TINY = dict(
    projection_dim=20,
    logit_scale_init_value=2.6592,
    text_config=dict(
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=32,
        vocab_size=600,
        max_position_embeddings=12,
        eos_token_id=2,
        hidden_act="quick_gelu",
    ),
    vision_config=dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=32,
        patch_size=16,
        hidden_act="quick_gelu",
    ),
)


def _torch_clip(seed=0):
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(seed)
    cfg = CLIPConfig(
        projection_dim=TINY["projection_dim"],
        logit_scale_init_value=TINY["logit_scale_init_value"],
        text_config=TINY["text_config"],
        vision_config=TINY["vision_config"],
    )
    cfg._attn_implementation = "eager"
    model = CLIPModel(cfg)
    model.eval()
    return model, cfg


def _jax_clip_from(model, tmp_path):
    import jax

    from rgqa_tpu.checkpoint import import_clip
    from rgqa_tpu.models.clip import ClipModel, clip_config_from_hf

    path = str(tmp_path / "clip.pth")
    torch.save(model.state_dict(), path)
    jcfg = clip_config_from_hf(TINY)
    jmodel = ClipModel(jcfg)
    dummy = (
        np.zeros((1, jcfg.max_text_len), np.int32),
        np.ones((1, jcfg.max_text_len), np.int32),
        np.zeros((1, jcfg.image_size, jcfg.image_size, 3), np.float32),
    )
    shapes = jax.eval_shape(
        lambda *a: jmodel.init(jax.random.PRNGKey(0), *a), *dummy
    )["params"]
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    params, missing, unused = import_clip(
        template, path,
        vision_layers=jcfg.vision.num_layers,
        text_layers=jcfg.text.num_layers,
    )
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    return jmodel, params, jcfg


def _rand_inputs(jcfg, b=3, seed=1):
    rng = np.random.default_rng(seed)
    # ids: BOT=0-ish low ids, EOT = highest id so argmax pooling finds it
    # (the eos_token_id == 2 original-config path).
    s = jcfg.max_text_len
    ids = rng.integers(5, jcfg.vocab_size - 1, (b, s)).astype(np.int32)
    lengths = rng.integers(4, s, b)
    mask = np.zeros((b, s), np.int32)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = 1
        ids[i, ln - 1] = jcfg.vocab_size - 1  # EOT
        ids[i, ln:] = 3  # pad
    pixels = rng.standard_normal(
        (b, jcfg.image_size, jcfg.image_size, 3)
    ).astype(np.float32)
    return ids, mask, pixels


class TestClipForwardParity:
    def test_towers_and_logits(self, tmp_path):
        tmodel, _ = _torch_clip()
        jmodel, params, jcfg = _jax_clip_from(tmodel, tmp_path)
        ids, mask, pixels = _rand_inputs(jcfg)

        with torch.no_grad():
            t_img = tmodel.get_image_features(
                pixel_values=torch.from_numpy(
                    pixels.transpose(0, 3, 1, 2)
                )
            ).numpy()
            t_txt = tmodel.get_text_features(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).numpy()
            t_out = tmodel(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
                pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            )
            t_logits = t_out.logits_per_image.numpy()

        from rgqa_tpu.models.clip import ClipModel

        j_img = np.asarray(
            jmodel.apply(
                {"params": params}, pixels, method=ClipModel.image_features
            )
        )
        j_txt = np.asarray(
            jmodel.apply(
                {"params": params}, ids, mask,
                method=ClipModel.text_features,
            )
        )
        j_out = jmodel.apply({"params": params}, ids, mask, pixels)
        np.testing.assert_allclose(j_img, t_img, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(j_txt, t_txt, atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(j_out["logits_per_image"]), t_logits,
            atol=5e-4, rtol=1e-4,
        )
        # cosine == diag(logits_per_image) / logit_scale.exp()
        # (gqa_clip.py:104's rejection score).
        j_cos = np.asarray(
            jmodel.apply(
                {"params": params}, ids, mask, pixels,
                method=ClipModel.cosine,
            )
        )
        scale = float(np.exp(np.asarray(params["logit_scale"])))
        np.testing.assert_allclose(
            j_cos, np.diagonal(t_logits) / scale, atol=2e-5, rtol=1e-4
        )

    def test_first_eos_pooling_variant(self, tmp_path):
        """Configs re-exported after HF #24773 carry the real EOT id and
        pool at its FIRST occurrence; parity for that path too."""
        from transformers import CLIPConfig, CLIPModel as TorchClip

        cfg_dict = dict(TINY, text_config=dict(
            TINY["text_config"], eos_token_id=599
        ))
        torch.manual_seed(3)
        tcfg = CLIPConfig(
            projection_dim=cfg_dict["projection_dim"],
            text_config=cfg_dict["text_config"],
            vision_config=cfg_dict["vision_config"],
        )
        tcfg._attn_implementation = "eager"
        tmodel = TorchClip(tcfg)
        tmodel.eval()

        import jax

        from rgqa_tpu.checkpoint import import_clip
        from rgqa_tpu.models.clip import ClipModel, clip_config_from_hf

        path = str(tmp_path / "clip2.pth")
        torch.save(tmodel.state_dict(), path)
        jcfg = clip_config_from_hf(cfg_dict)
        assert jcfg.eos_token_id == 599
        jmodel = ClipModel(jcfg)
        shapes = jax.eval_shape(
            lambda *a: jmodel.init(jax.random.PRNGKey(0), *a),
            np.zeros((1, jcfg.max_text_len), np.int32),
            np.ones((1, jcfg.max_text_len), np.int32),
            np.zeros((1, jcfg.image_size, jcfg.image_size, 3), np.float32),
        )["params"]
        params, missing, _ = import_clip(
            jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes
            ),
            path, vision_layers=2, text_layers=2,
        )
        assert not missing

        ids, mask, _ = _rand_inputs(jcfg)
        # EOT id 599 at the length position, followed by pad 599 too
        # (pad == eos is the HF hack) -> first occurrence must win.
        for i in range(ids.shape[0]):
            ids[i, mask[i].sum() - 1 :] = 599
        with torch.no_grad():
            t_txt = tmodel.get_text_features(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).numpy()
        j_txt = np.asarray(
            jmodel.apply(
                {"params": params}, ids, mask,
                method=ClipModel.text_features,
            )
        )
        np.testing.assert_allclose(j_txt, t_txt, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


def make_tiny_vocab(tmp_path):
    """A small but VALID CLIP BPE vocab: full byte alphabet (+</w>),
    a few real merges, and the specials last (EOT = max id, as in the
    real vocab)."""
    b2u = bytes_to_unicode()
    tokens = list(b2u.values())
    tokens += [t + "</w>" for t in b2u.values()]
    merges = [
        ("t", "h"), ("th", "e</w>"), ("i", "s</w>"), ("a", "n"),
        ("an", "d</w>"), ("o", "n</w>"), ("r", "e"), ("re", "d</w>"),
        ("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
        ("w", "h"), ("wh", "a"), ("wha", "t</w>"), ("th", "e"),
        ("c", "o"), ("co", "l"), ("col", "o"), ("colo", "r</w>"),
        ("'", "s</w>"),
    ]
    for a, b in merges:
        merged = a + b
        if merged not in tokens:
            tokens.append(merged)
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    vdir = tmp_path / "clip_ckpt"
    vdir.mkdir(exist_ok=True)
    with open(vdir / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(vdir / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(vdir), vocab


SENTENCES = [
    "Is there a red apple on the table?",
    "What color is the dog's tail?",
    "the THE   The",
    "hello, world!! 12 cats AND a dog.",
    "what is this",
]


class TestClipTokenizerParity:
    def test_matches_hf(self, tmp_path):
        from transformers import CLIPTokenizer

        vdir, vocab = make_tiny_vocab(tmp_path)
        hf = CLIPTokenizer(
            os.path.join(vdir, "vocab.json"),
            os.path.join(vdir, "merges.txt"),
        )
        mine = ClipBPETokenizer.from_dir(vdir)
        for sent in SENTENCES:
            assert mine.token_ids(sent) == hf(sent)["input_ids"][1:-1], sent

    def test_padded_encode_matches_hf(self, tmp_path):
        from transformers import CLIPTokenizer

        vdir, _ = make_tiny_vocab(tmp_path)
        hf = CLIPTokenizer(
            os.path.join(vdir, "vocab.json"),
            os.path.join(vdir, "merges.txt"),
        )
        mine = ClipBPETokenizer.from_dir(vdir)
        for sent in SENTENCES:
            ref = hf(
                sent, padding="max_length", max_length=16, truncation=True
            )
            ids, mask = mine.encode(sent, max_len=16)
            assert ids.tolist() == ref["input_ids"], sent
            assert mask.tolist() == ref["attention_mask"], sent


class TestClipImagePipeline:
    def test_preprocess_matches_hf(self):
        from PIL import Image
        from transformers import CLIPImageProcessor

        from rgqa_tpu.scorers.clip import clip_preprocess

        rng = np.random.default_rng(0)
        for size in ((48, 64), (100, 40), (32, 32)):
            img = Image.fromarray(
                rng.integers(0, 255, (*size, 3), np.uint8)
            )
            proc = CLIPImageProcessor(
                size={"shortest_edge": 32},
                crop_size={"height": 32, "width": 32},
            )
            ref = proc(images=img, return_tensors="np")["pixel_values"][0]
            mine = clip_preprocess(img, size=32)
            np.testing.assert_allclose(
                mine, ref.transpose(1, 2, 0), atol=1e-5
            )


class TestClipCliAndWeightStrategy:
    @pytest.fixture(scope="class")
    def clip_ckpt(self, tmp_path_factory):
        """A complete tiny local CLIP checkpoint dir (config.json +
        pytorch_model.bin + vocab.json + merges.txt)."""
        tmp = tmp_path_factory.mktemp("clipdir")
        vdir, _ = make_tiny_vocab(tmp)
        tmodel, _ = _torch_clip(seed=11)
        tmodel.save_pretrained(vdir, safe_serialization=False)
        return vdir

    @pytest.fixture(scope="class")
    def synth(self, tmp_path_factory):
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa

        root = str(tmp_path_factory.mktemp("gqa_clip"))
        make_synthetic_gqa(
            root,
            SyntheticSpec(n_images=16, n_train=48, n_valid=16, n_testdev=16),
        )
        return root

    def test_clip_scorer_cli_no_stub(self, clip_ckpt, synth, tmp_path):
        """The clip.sh recipe path without any stub: train a tiny GQA
        model, then --scorer clip over real (synthetic) JPEGs with the
        TPU-native CLIP (VERDICT r3 missing #1 done criterion)."""
        from rgqa_tpu.cli import evaluate, train

        snap = str(tmp_path / "snap")
        flags = (
            "--synthetic --fp32 --llayers 1 --xlayers 1 --rlayers 1 "
            "--hidden_size 32 --num_heads 4 --batchSize 16"
        ).split()
        train.main(
            flags + ["--data_root", synth, "--epochs", "1", "--lr", "3e-3",
                     "--output", snap]
        )
        results = evaluate.main(
            flags + ["--data_root", synth, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "clip", "--clip_path", clip_ckpt,
                     "--output", snap]
        )
        assert np.isfinite(results["testdev"]["auaf"])
        with open(os.path.join(snap, "testdev_predict.json")) as f:
            rows = json.load(f)
        assert {"questionId", "prediction", "confidence"} == set(rows[0])
        # Cosine similarities, not stub constants.
        confs = {r["confidence"] for r in rows}
        assert len(confs) > 1
        assert all(-1.01 <= c <= 1.01 for c in confs)

    def test_clip_eval_uses_pixel_pack(self, clip_ckpt, synth, tmp_path,
                                       monkeypatch):
        """With a CLIP PixelPack beside the image root, clip_ood_evaluate
        must feed the pre-decoded uint8 rows to the scorer (no JPEG
        decode) and produce identical results to the PIL path."""
        from rgqa_tpu.config import (
            DataConfig, EncoderConfig, ModelConfig, OODConfig, RunConfig,
            TrainConfig,
        )
        from rgqa_tpu.data import GQADataset
        from rgqa_tpu.data.images import pack_pixels
        from rgqa_tpu.runner import GQARunner
        from rgqa_tpu.scorers.clip import ClipScorer

        cfg = RunConfig(
            model=ModelConfig(
                backbone="lxmert",
                encoder=EncoderConfig(
                    hidden_size=32, num_heads=4, intermediate_size=64,
                    l_layers=1, x_layers=1, r_layers=1, num_objects=36,
                    visual_feat_dim=2048,
                ),
                max_text_len=12,
            ),
            train=TrainConfig(batch_size=8, epochs=1, use_bf16=False),
            ood=OODConfig(),
            data=DataConfig(data_root=synth, synthetic=True,
                            test_splits="testdev"),
            output=str(tmp_path / "snap_pack"),
        )
        runner = GQARunner(cfg, init_train=False)
        encoded = runner._encode(GQADataset(synth, "testdev", add_uq=True))
        scorer = ClipScorer(clip_ckpt, backend="jax", batch_size=8)
        assert scorer.image_size
        img_root = os.path.join(synth, "images")
        base = runner.clip_ood_evaluate(encoded, scorer.scores, img_root)

        pack_pixels(
            img_root,
            os.path.join(synth, f"pixels_clip_{scorer.image_size}"),
            size=scorer.image_size, transform="clip",
        )
        import PIL.Image as PILImage

        def boom(*a, **k):
            raise AssertionError("JPEG decode path used despite the pack")

        monkeypatch.setattr(PILImage, "open", boom)
        packed = runner.clip_ood_evaluate(encoded, scorer.scores, img_root)
        # Same resize/crop bytes -> same uint8 rows -> identical scores.
        assert packed == base

    def test_weight_strategy_uses_clip(self, clip_ckpt, synth):
        """--strategy weight with --clip_path: negative-pair similarity
        comes from the CLIP towers (anchor image x negative question,
        scaled by logit_scale — gqa_weight.py:154-186), not the caption
        overlap fallback."""
        from rgqa_tpu.config import (
            DataConfig,
            EncoderConfig,
            ModelConfig,
            OODConfig,
            RunConfig,
            TrainConfig,
        )
        from rgqa_tpu.runner import GQARunner

        cfg = RunConfig(
            model=ModelConfig(
                backbone="lxmert",
                encoder=EncoderConfig(
                    hidden_size=32, num_heads=4, intermediate_size=64,
                    l_layers=1, x_layers=1, r_layers=1, num_objects=36,
                    visual_feat_dim=2048,
                ),
                max_text_len=12,
            ),
            train=TrainConfig(batch_size=8, epochs=1, use_bf16=False),
            ood=OODConfig(clip_path=clip_ckpt),
            data=DataConfig(data_root=synth, synthetic=True),
            output=os.path.join(synth, "snap_w"),
        )
        runner = GQARunner(cfg, init_train=False)
        sim = runner._clip_weight_similarity()
        assert sim is not None
        qids = list(runner.dataset.id2datum)[:6]
        neg = qids[1:] + qids[:1]
        s = sim(qids, neg)
        assert s.shape == (6,)
        assert np.isfinite(s).all()
        assert len(set(np.round(s, 5))) > 1  # real similarities vary

    def test_update_weight_model_e2e(self, clip_ckpt, synth, tmp_path):
        """--strategy weight --update_weight_model end-to-end: the joint
        min-max loop trains, saves the model AND the updated CLIP params
        (gqa_weight.py --update_weight_model)."""
        from rgqa_tpu.config import (
            DataConfig,
            EncoderConfig,
            ModelConfig,
            OODConfig,
            OptimConfig,
            RunConfig,
            TrainConfig,
        )
        from rgqa_tpu.runner import GQARunner

        out = str(tmp_path / "snap_uwm")
        cfg = RunConfig(
            model=ModelConfig(
                backbone="lxmert",
                encoder=EncoderConfig(
                    hidden_size=32, num_heads=4, intermediate_size=64,
                    l_layers=1, x_layers=1, r_layers=1, num_objects=36,
                    visual_feat_dim=2048,
                ),
                max_text_len=12,
            ),
            train=TrainConfig(
                batch_size=8, epochs=1, strategy="weight",
                update_weight_model=True, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            ood=OODConfig(clip_path=clip_ckpt),
            data=DataConfig(data_root=synth, synthetic=True),
            output=out,
        )
        runner = GQARunner(cfg)
        history = runner.train()
        assert np.isfinite(history["loss"][-1])
        assert os.path.isdir(os.path.join(out, "LAST"))
        # The adversary checkpoints beside the model (resume restores
        # both sides of the min-max)...
        assert os.path.isdir(os.path.join(out, "LAST_clip"))
        # ...and the exported clip_params dir is RELOADABLE: config +
        # tokenizer + orbax params; ClipScorer must load it natively with
        # the TRAINED params (different from the source checkpoint's).
        exported = os.path.join(out, "clip_params")
        assert os.path.isdir(os.path.join(exported, "jax_params"))
        from rgqa_tpu.scorers.clip import ClipScorer

        trained = ClipScorer(exported, backend="jax", batch_size=4)
        base = ClipScorer(clip_ckpt, backend="jax", batch_size=4)
        import jax

        moved = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(trained.params),
                jax.tree_util.tree_leaves(base.params),
            )
        ]
        assert any(moved)

        # Resume restores the CLIP tower when the sibling exists (no
        # RuntimeWarning), and warns when it doesn't.
        import warnings

        runner2 = GQARunner(cfg)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            runner2.train(resume="LAST")
        import shutil

        shutil.rmtree(os.path.join(out, "LAST_clip"))
        runner3 = GQARunner(cfg)
        with pytest.warns(RuntimeWarning, match="no LAST_clip"):
            runner3.train(resume="LAST")

    def test_update_weight_model_requires_weight_strategy(
        self, clip_ckpt, synth, tmp_path
    ):
        """--update_weight_model without --strategy weight warns loudly
        instead of silently dropping the flag."""
        from rgqa_tpu.config import (
            DataConfig,
            EncoderConfig,
            ModelConfig,
            OODConfig,
            OptimConfig,
            RunConfig,
            TrainConfig,
        )
        from rgqa_tpu.runner import GQARunner

        cfg = RunConfig(
            model=ModelConfig(
                backbone="lxmert",
                encoder=EncoderConfig(
                    hidden_size=32, num_heads=4, intermediate_size=64,
                    l_layers=1, x_layers=1, r_layers=1, num_objects=36,
                    visual_feat_dim=2048,
                ),
                max_text_len=12,
            ),
            train=TrainConfig(
                batch_size=8, epochs=1, strategy="conf",
                update_weight_model=True, optim=OptimConfig(lr=1e-3),
                use_bf16=False,
            ),
            ood=OODConfig(clip_path=clip_ckpt),
            data=DataConfig(data_root=synth, synthetic=True),
            output=str(tmp_path / "snap_mismatch"),
        )
        runner = GQARunner(cfg)
        with pytest.warns(RuntimeWarning, match="only applies"):
            runner.train()


class TestUpdateWeightModel:
    """--update_weight_model: the joint min-max step (gqa_weight.py:228-238)."""

    def _tiny_gqa(self, b=4):
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.config import EncoderConfig, ModelConfig
        from rgqa_tpu.models.zoo import build_model, example_batch

        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            vocab_size=256, l_layers=1, x_layers=1, r_layers=1,
            num_objects=6, visual_feat_dim=16,
        )
        mcfg = ModelConfig(
            backbone="lxmert", encoder=enc, num_answers=7, max_text_len=6
        )
        model, forward = build_model(mcfg)
        batch = example_batch(mcfg, batch_size=b, seed=0, with_target=True)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0),
            batch["input_ids"], batch["input_mask"], batch["segment_ids"],
            batch["feats"], batch["boxes"],
        )["params"]
        return forward, params, batch

    def test_joint_step_model_update_matches_frozen_weight_step(
        self, tmp_path
    ):
        """The joint step's MODEL update must be bitwise the plain
        weighted-RP update fed the same softmax weights (the min-max
        decomposition is exact: weights depend only on CLIP params)."""
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.models.clip import ClipModel
        from rgqa_tpu.train import bert_adam, create_train_state
        from rgqa_tpu.train.step import (
            make_train_step,
            make_weighted_clip_train_step,
        )

        tmodel, _ = _torch_clip(seed=3)
        jmodel, cparams, jcfg = _jax_clip_from(tmodel, tmp_path)
        forward, params, batch = self._tiny_gqa(b=4)
        ids, mask, pixels = _rand_inputs(jcfg, b=4, seed=7)
        temperature = 2.0

        def clip_similarity(cp, i, m, px):
            sim = jmodel.apply(
                {"params": cp}, i, m, px, method=ClipModel.cosine
            )
            scale = jnp.exp(
                jax.lax.stop_gradient(cp["logit_scale"].astype(jnp.float32))
            )
            return sim * scale

        shift = 1
        jbatch = dict(
            batch,
            pixels=jnp.asarray(pixels),
            clip_ids=jnp.asarray(ids),
            clip_mask=jnp.asarray(mask),
            neg_shift=jnp.asarray(shift, jnp.int32),
        )
        tx = bert_adam(1e-3, warmup=0.0, t_total=10)
        state = create_train_state(params, tx)
        import optax

        cstate = create_train_state(cparams, optax.adam(1e-5))
        joint = make_weighted_clip_train_step(
            forward, clip_similarity, temperature=temperature, donate=False
        )
        key = jax.random.PRNGKey(42)
        new_state, new_cstate, aux = joint(state, cstate, jbatch, key)
        assert np.isfinite(float(aux["loss"]))
        assert np.isfinite(float(aux["loss_w"]))

        # Reference model-side step with the SAME weights, host-computed
        # from the initial CLIP params.
        sim = np.asarray(
            clip_similarity(
                cparams, np.roll(ids, shift, 0), np.roll(mask, shift, 0),
                pixels,
            ),
            np.float32,
        )
        e = np.exp((sim - sim.max()) / temperature)
        w = e / e.sum()
        fbatch = dict(batch)
        fbatch["neg_shift"] = jnp.asarray(shift, jnp.int32)
        fbatch["neg_weights"] = jnp.asarray(w, jnp.float32)
        fstep = make_train_step(forward, weighted_rp=True, donate=False)
        fstate, faux = fstep(create_train_state(params, tx), fbatch, key)

        np.testing.assert_allclose(
            float(aux["loss"]), float(faux["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(fstate.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-4
            )

        # And the CLIP side actually moved (adversarial ascent on the
        # weighted negative loss).
        moved = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(cstate.params),
                jax.tree_util.tree_leaves(new_cstate.params),
            )
        ]
        assert any(moved)

    def test_clip_update_ascends_weighted_negative_loss(self, tmp_path):
        """The weight model's update is an ASCENT on the weighted negative
        loss (gqa_weight.py:228: loss_w = -loss_neg): re-evaluating with
        the updated CLIP params and the UNCHANGED model params must raise
        loss_w."""
        import jax
        import jax.numpy as jnp
        import optax

        from rgqa_tpu.models.clip import ClipModel
        from rgqa_tpu.train import bert_adam, create_train_state
        from rgqa_tpu.train.step import make_weighted_clip_train_step

        tmodel, _ = _torch_clip(seed=5)
        jmodel, cparams, jcfg = _jax_clip_from(tmodel, tmp_path)
        forward, params, batch = self._tiny_gqa(b=4)
        ids, mask, pixels = _rand_inputs(jcfg, b=4, seed=9)

        def clip_similarity(cp, i, m, px):
            sim = jmodel.apply(
                {"params": cp}, i, m, px, method=ClipModel.cosine
            )
            return sim * jnp.exp(
                jax.lax.stop_gradient(cp["logit_scale"].astype(jnp.float32))
            )

        jbatch = dict(
            batch,
            pixels=jnp.asarray(pixels),
            clip_ids=jnp.asarray(ids),
            clip_mask=jnp.asarray(mask),
            neg_shift=jnp.asarray(1, jnp.int32),
        )
        tx = bert_adam(1e-3, warmup=0.0, t_total=10)
        state = create_train_state(params, tx)
        cstate = create_train_state(cparams, optax.adam(1e-3))
        joint = make_weighted_clip_train_step(
            forward, clip_similarity, temperature=1.0, donate=False
        )
        key = jax.random.PRNGKey(0)
        _, cstate1, aux0 = joint(state, cstate, jbatch, key)
        # Same model params + same rng, CLIP params one ascent step later.
        _, _, aux1 = joint(state, cstate1, jbatch, key)
        assert float(aux1["loss_w"]) > float(aux0["loss_w"])


class TestClipScorerEndToEnd:
    def test_jax_scorer_matches_torch_model(self, tmp_path):
        """Full local-checkpoint flow: save an HF CLIPModel + processor
        files to a dir, run ClipScorer's jax backend, compare against the
        torch model driven the reference way (gqa_clip.py:96-104)."""
        from PIL import Image
        from transformers import CLIPImageProcessor, CLIPTokenizer

        from rgqa_tpu.scorers.clip import ClipScorer

        vdir, _ = make_tiny_vocab(tmp_path)
        tmodel, tcfg = _torch_clip(seed=7)
        # Shrink the text vocab to the tiny tokenizer's size.
        tmodel.save_pretrained(vdir, safe_serialization=False)
        with open(os.path.join(vdir, "config.json")) as f:
            saved = json.load(f)
        assert saved["text_config"]["vocab_size"] == 600

        rng = np.random.default_rng(5)
        images = [
            Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8))
            for _ in range(3)
        ]
        texts = ["what color is the cat", "is this a dog", "red and red"]

        scorer = ClipScorer(vdir, backend="jax", batch_size=2)
        got = scorer.scores(images, texts)

        hf_tok = CLIPTokenizer(
            os.path.join(vdir, "vocab.json"),
            os.path.join(vdir, "merges.txt"),
        )
        proc = CLIPImageProcessor(
            size={"shortest_edge": 32},
            crop_size={"height": 32, "width": 32},
        )
        enc = hf_tok(
            texts, padding="max_length", max_length=12, truncation=True,
            return_tensors="pt",
        )
        px = torch.from_numpy(
            proc(images=images, return_tensors="np")["pixel_values"]
        )
        with torch.no_grad():
            out = tmodel(
                input_ids=enc["input_ids"],
                attention_mask=enc["attention_mask"],
                pixel_values=px,
            )
            want = (
                out.logits_per_image / tmodel.logit_scale.exp()
            ).diagonal().numpy()
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
