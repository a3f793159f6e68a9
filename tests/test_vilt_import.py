"""ViLT checkpoint-importer parity against the *actual* reference model.

Builds the reference ``GQAViLT`` (``src/vilt/vilt.py`` over the vendored
timm ViT-B/32-384) in-process — timm/torchvision are absent in this
environment, so the handful of symbols the vendored file imports are
stubbed — random-initializes it, imports its ``state_dict`` through
``rgqa_tpu.checkpoint.import_vilt_gqa``, and checks key-map coverage plus
forward parity (pooled output + logits).

The reference's ``visual_embed`` randomly *permutes* dense patches
(``vision_transformer.py:624-627``: a ``torch.multinomial`` over all 144
valid patches); since position embeddings travel with the patches and
attention is permutation-invariant, the outputs agree with our
fixed-order encoder up to f32 summation order.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgqa_tpu.config import EncoderConfig, ModelConfig
from rgqa_tpu.models.zoo import build_model, example_batch


def _stub_timm(torch):
    """Stub the timm/torchvision symbols the vendored ViT file imports
    (only used for pretrained-weight download / hybrid backbones)."""

    import importlib.machinery

    def mod(name):
        m = types.ModuleType(name)
        # transformers probes availability via importlib.util.find_spec.
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
        return m

    timm = mod("timm")
    data = mod("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = mod("timm.models")
    helpers = mod("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    layers = mod("timm.models.layers")
    layers.StdConv2dSame = torch.nn.Conv2d
    layers.DropPath = torch.nn.Identity

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    resnet = mod("timm.models.resnet")
    resnet.resnet26d = resnet.resnet50d = lambda *a, **k: None
    resnetv2 = mod("timm.models.resnetv2")
    resnetv2.ResNetV2 = object
    registry = mod("timm.models.registry")
    registry.register_model = lambda fn: fn
    timm.data, timm.models = data, models
    tv = mod("torchvision")
    tv.transforms = mod("torchvision.transforms")
    tv.transforms.Compose = lambda fns: (lambda x: x)
    # vilt_utils does `from transformers.optimization import AdamW` —
    # removed in modern transformers; it's only used for training setup.
    import transformers.optimization as topt

    if not hasattr(topt, "AdamW"):
        topt.AdamW = torch.optim.AdamW


@pytest.fixture(scope="module")
def ref_vilt(reference_dir):
    torch = pytest.importorskip("torch")
    _stub_timm(torch)
    sys.path.insert(0, str(reference_dir / "src"))
    try:
        from vilt.vilt import GQAViLT
    finally:
        sys.path.pop(0)
    return GQAViLT


NUM_ANSWERS = 7


def _build_ref(GQAViLT, torch):
    torch.manual_seed(0)
    model = GQAViLT(NUM_ANSWERS)
    model.eval()
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return model


class TestViltImportParity:
    def test_key_map_covers_state_dict(self, ref_vilt):
        import torch

        from rgqa_tpu.checkpoint.torch_import import vilt_key_map

        model = _build_ref(ref_vilt, torch)
        sd_keys = {
            k for k in model.state_dict() if not k.endswith("position_ids")
        }
        # emulate import_vilt_gqa's qkv split / conv marker
        expect = set()
        for k in sd_keys:
            if k.endswith(".attn.qkv.weight"):
                for n in ("query", "key", "value"):
                    expect.add(k.replace("qkv.weight", f"{n}.weight"))
            elif k.endswith(".attn.qkv.bias"):
                for n in ("query", "key", "value"):
                    expect.add(k.replace("qkv.bias", f"{n}.bias"))
            elif k == "transformer.patch_embed.proj.weight":
                expect.add(k + "#conv")
            else:
                expect.add(k)
        mapped = {t for t, _, _ in vilt_key_map()}
        missing = sorted(expect - mapped)
        extra = sorted(mapped - expect)
        assert not missing, f"torch keys not mapped: {missing[:8]}"
        assert not extra, f"mapped keys not in torch model: {extra[:8]}"

    def test_forward_parity(self, ref_vilt, tmp_path):
        import torch

        from rgqa_tpu.checkpoint.torch_import import import_vilt_gqa

        ref = _build_ref(ref_vilt, torch)
        torch.save(ref.state_dict(), tmp_path / "vilt.pth")

        # Full reference shape: ViT-B/32-384, 12 layers, 768 hidden.
        enc = EncoderConfig(num_layers=12, max_position_embeddings=40)
        cfg = ModelConfig(
            backbone="vilt", encoder=enc, num_answers=NUM_ANSWERS,
            max_text_len=8, vilt_image_size=384, vilt_patch_size=32,
        )
        model, forward = build_model(cfg)
        batch = example_batch(cfg, batch_size=2, seed=3)
        batch["input_mask"][0, 5:] = 0
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            jax.random.PRNGKey(0), jb["input_ids"], jb["input_mask"],
            jb["pixels"],
        )["params"]
        params, missing, unused = import_vilt_gqa(
            params, str(tmp_path / "vilt.pth")
        )
        assert not missing, missing[:8]
        assert not unused, unused[:8]

        out = forward(params, jb, deterministic=True)

        torch.manual_seed(5)  # fixes visual_embed's patch permutation
        with torch.no_grad():
            ref_logits = ref(
                {
                    "text_ids": torch.from_numpy(batch["input_ids"]).long(),
                    "text_labels": None,
                    "text_masks": torch.from_numpy(batch["input_mask"]).long(),
                    "image": [
                        torch.from_numpy(
                            batch["pixels"].transpose(0, 3, 1, 2)
                        ).float()
                    ],
                }
            ).numpy()

        np.testing.assert_allclose(
            np.asarray(out["logits"], np.float32), ref_logits,
            atol=2e-3, rtol=1e-3,
        )
