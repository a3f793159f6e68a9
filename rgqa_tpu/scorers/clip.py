"""CLIP image-question similarity scorers.

Rebuild of the CLIP rejection score (``src/tasks/gqa_clip.py:76-110``:
``logits_per_image / logit_scale.exp()`` = cosine similarity of image and
question embeddings) and the CLIP-weighted loss helper
(``src/tasks/gqa_weight.py:80-128``).

The reference runs HF ``CLIPModel`` on GPU per (image, question) pair;
here the default backend is the TPU-native :class:`rgqa_tpu.models.clip.
ClipModel` — both towers jitted on device over fixed-shape batches, with
the from-scratch BPE tokenizer and a bit-matched image pipeline.  The
host-side torch path remains as a fallback (``backend="torch"``).

Zero-egress: weights must already exist locally (an HF checkpoint dir
with ``config.json`` + ``pytorch_model.bin`` + ``vocab.json`` +
``merges.txt``); for pipelines that only need *a* similarity scorer
(tests, synthetic runs), any callable ``(images, texts) -> scores``
plugs in.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "ClipScorer",
    "clip_preprocess",
    "clip_resize_crop",
    "clip_normalize",
    "clip_loss_weights",
]

# HF CLIPImageProcessor normalization constants (OPENAI_CLIP_MEAN/STD).
CLIP_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
CLIP_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


def clip_resize_crop(image, size: int = 224) -> np.ndarray:
    """PIL image -> (size, size, 3) uint8: the decode-side half of
    :func:`clip_preprocess` (bicubic shortest-edge resize + center crop).
    Split out so epoch loops can cache the uint8 stage (150 KB/image)
    and re-apply the cheap normalize per batch."""
    from PIL import Image

    image = image.convert("RGB")
    w, h = image.size
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    image = image.resize((new_w, new_h), Image.BICUBIC)
    arr = np.asarray(image, np.uint8)
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    return arr[top : top + size, left : left + size]


def clip_normalize(arr_u8: np.ndarray) -> np.ndarray:
    """uint8 pixels -> float32: rescale 1/255, CLIP mean/std normalize."""
    return (np.asarray(arr_u8, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def clip_preprocess(image, size: int = 224) -> np.ndarray:
    """PIL image -> (size, size, 3) float32, matching HF
    ``CLIPImageProcessor``: bicubic resize of the shortest edge to
    ``size`` (long edge ``int(size * long / short)``), center crop,
    rescale 1/255, mean/std normalize.  Channels-last (the flax conv's
    native layout; HF's NCHW is a torch artifact)."""
    return clip_normalize(clip_resize_crop(image, size))


class ClipScorer:
    """Image-text similarity from a local HF CLIP checkpoint dir.

    ``backend="jax"`` (default) runs the TPU-native two-tower model;
    ``"torch"`` keeps the reference's host-side HF path; ``"auto"``
    prefers jax and falls back to torch.  ``batch_size`` is the jitted
    compute shape — inputs pad up to it (static shapes, no recompiles).
    """

    def __init__(
        self,
        model_path: str = "openai/clip-vit-base-patch32",
        backend: str = "auto",
        batch_size: int = 32,
        use_bf16: bool = False,
    ):
        self.model_path = model_path
        self.batch_size = batch_size
        self.backend = None
        errors = []
        if backend in ("auto", "jax"):
            try:
                self._init_jax(model_path, use_bf16)
                self.backend = "jax"
            except Exception as e:
                if backend == "jax":
                    raise RuntimeError(
                        f"CLIP checkpoint not loadable from {model_path!r} "
                        "(needs config.json + pytorch_model.bin + "
                        "vocab.json + merges.txt)"
                    ) from e
                errors.append(e)
        if self.backend is None and backend in ("auto", "torch"):
            try:
                self._init_torch(model_path)
                self.backend = "torch"
            except Exception as e:  # no local weights in zero-egress envs
                errors.append(e)
        if self.backend is None:
            raise RuntimeError(
                "CLIP weights not available locally; download "
                f"{model_path!r} beforehand or inject a custom scorer"
            ) from (errors[-1] if errors else None)

    # ------------------------------------------------------------------
    # TPU-native backend
    # ------------------------------------------------------------------

    def _init_jax(self, path: str, use_bf16: bool) -> None:
        import jax
        import jax.numpy as jnp

        from rgqa_tpu.checkpoint.torch_import import import_clip
        from rgqa_tpu.data.clip_tokenizer import ClipBPETokenizer
        from rgqa_tpu.models.clip import ClipModel, clip_config_from_hf

        with open(os.path.join(path, "config.json")) as f:
            cfg = clip_config_from_hf(json.load(f))
        self.cfg = cfg
        self.tokenizer = ClipBPETokenizer.from_dir(path)
        model = ClipModel(
            cfg, dtype=jnp.bfloat16 if use_bf16 else jnp.float32
        )
        # Param template from eval_shape (no 150M-param random init; the
        # import overwrites every leaf — strict-checked below).
        dummy = (
            np.zeros((1, cfg.max_text_len), np.int32),
            np.ones((1, cfg.max_text_len), np.int32),
            np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32),
        )
        shapes = jax.eval_shape(
            lambda *a: model.init(jax.random.PRNGKey(0), *a), *dummy
        )["params"]
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )
        if os.path.isdir(os.path.join(path, "jax_params")):
            # A trained-adversary export (runner._export_clip_params:
            # config + tokenizer files + orbax params) — load natively,
            # no torch weights involved.
            from rgqa_tpu.checkpoint import load_params

            params = load_params(path, "jax_params", template=template)
        else:
            params, missing, _ = import_clip(
                template, path,
                vision_layers=cfg.vision.num_layers,
                text_layers=cfg.text.num_layers,
            )
            if missing:
                raise ValueError(
                    f"CLIP checkpoint missing keys: {missing[:5]}"
                )
        self.model = model  # the flax module (train_weight_model re-applies it)
        self.params = jax.device_put(params)

        # uint8 pixel wire: pixels ship as uint8 (the resize/crop output's
        # native dtype) and the mean/std normalize runs INSIDE the jit —
        # zero quantization error vs the host clip_normalize (same f32
        # expression, <= 1-ulp jit reassociation; ops/pixels.py) at 1/4
        # the f32 host->device bytes.  f32 pixels (already-normalized
        # callers, e.g. the weight strategy's cached feed) pass through.
        from rgqa_tpu.ops.pixels import clip_normalize_jnp

        def _px(px):
            return clip_normalize_jnp(px) if px.dtype == jnp.uint8 else px

        self._apply = jax.jit(
            lambda p, ids, mask, px: model.apply(
                {"params": p}, ids, mask, _px(px), method=ClipModel.cosine
            )
        )
        self._apply_img = jax.jit(
            lambda p, px: model.apply(
                {"params": p}, _px(px), method=ClipModel.image_features
            )
        )
        self._apply_txt = jax.jit(
            lambda p, ids, mask: model.apply(
                {"params": p}, ids, mask, method=ClipModel.text_features
            )
        )
        self.logit_scale = float(np.exp(np.asarray(params["logit_scale"])))

    def _pixels(self, images) -> np.ndarray:
        """Images -> uint8 (B, S, S, 3) for the u8 wire (already-decoded
        uint8 arrays pass straight through)."""
        return np.stack(
            [
                im
                if isinstance(im, np.ndarray) and im.dtype == np.uint8
                else clip_resize_crop(im, self.cfg.image_size)
                for im in images
            ]
        )

    def _pad(self, arr: np.ndarray) -> tuple[np.ndarray, int]:
        n = arr.shape[0]
        pad = (-n) % self.batch_size
        if pad:
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0
            )
        return arr, n

    def _jax_cosine(self, images, texts: Sequence[str]) -> np.ndarray:
        ids, mask = self.tokenizer.encode_batch(
            list(texts), self.cfg.max_text_len
        )
        px = self._pixels(images)
        out = []
        px, n = self._pad(px)
        ids, _ = self._pad(ids)
        mask, _ = self._pad(mask)
        for s in range(0, px.shape[0], self.batch_size):
            e = s + self.batch_size
            out.append(
                np.asarray(
                    self._apply(self.params, ids[s:e], mask[s:e], px[s:e])
                )
            )
        return np.concatenate(out)[:n]

    # ------------------------------------------------------------------
    # torch fallback (the reference's own path)
    # ------------------------------------------------------------------

    def _init_torch(self, model_path: str) -> None:
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(
            model_path, local_files_only=True
        )
        self.processor = CLIPProcessor.from_pretrained(
            model_path, local_files_only=True
        )
        self.model.eval()
        self.logit_scale = float(self.model.logit_scale.exp())

    def _torch_cosine(self, images, texts: Sequence[str]) -> np.ndarray:
        import torch

        inputs = self.processor(
            text=list(texts), images=images, return_tensors="pt", padding=True
        )
        with torch.no_grad():
            out = self.model(**inputs)
            sim = out.logits_per_image / self.model.logit_scale.exp()
        return sim.diagonal().cpu().numpy()

    # ------------------------------------------------------------------
    # Public surface
    # ------------------------------------------------------------------

    @property
    def image_size(self) -> Optional[int]:
        """Pixel edge the scorer consumes — lets callers substitute
        pre-decoded uint8 rows (a CLIP :class:`PixelPack`) for PIL
        images.  None on the torch backend (its processor resizes)."""
        return self.cfg.image_size if self.backend == "jax" else None

    @property
    def consumes_uint8_rows(self) -> bool:
        """Explicit capability flag: ``scores`` accepts pre-resized
        uint8 (image_size, image_size, 3) rows in place of PIL images
        (the jax backend's u8 wire).  Pack auto-detection keys on this,
        never on duck-typed attribute sniffing."""
        return self.backend == "jax"

    def scores(self, images, texts: Sequence[str]) -> np.ndarray:
        """Cosine similarity per (image, text) pair
        (``gqa_clip.py:96-104``: logits_per_image / logit_scale.exp())."""
        if self.backend == "jax":
            return self._jax_cosine(images, texts)
        return self._torch_cosine(images, texts)

    def weight_similarity(self, images, texts: Sequence[str]) -> np.ndarray:
        """Scaled similarity for the weight strategy
        (``gqa_weight.py:184-186``: embedding inner product *
        ``logit_scale.exp()`` before the temperature softmax)."""
        return self.scores(images, texts) * self.logit_scale

    def image_embeds(self, images) -> np.ndarray:
        """L2-normalized projected image embeddings (jax backend)."""
        assert self.backend == "jax"
        px, n = self._pad(self._pixels(images))
        outs = []
        for s in range(0, px.shape[0], self.batch_size):
            e = self._apply_img(self.params, px[s : s + self.batch_size])
            outs.append(np.asarray(e, np.float32))
        emb = np.concatenate(outs)[:n]
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def text_embeds(self, texts: Sequence[str]) -> np.ndarray:
        """L2-normalized projected text embeddings (jax backend)."""
        assert self.backend == "jax"
        ids, mask = self.tokenizer.encode_batch(
            list(texts), self.cfg.max_text_len
        )
        ids, n = self._pad(ids)
        mask, _ = self._pad(mask)
        outs = []
        for s in range(0, ids.shape[0], self.batch_size):
            e = self._apply_txt(
                self.params, ids[s : s + self.batch_size],
                mask[s : s + self.batch_size],
            )
            outs.append(np.asarray(e, np.float32))
        emb = np.concatenate(outs)[:n]
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def clip_loss_weights(
    similarities: np.ndarray, temperature: float = 1.0
) -> np.ndarray:
    """Per-sample loss weights from CLIP similarity
    (``gqa_weight.py``): softmax-normalized within the batch, scaled so the
    mean weight is 1 (keeps the loss magnitude comparable)."""
    s = np.asarray(similarities, np.float64) / temperature
    e = np.exp(s - s.max())
    w = e / e.sum()
    return (w * len(w)).astype(np.float32)
