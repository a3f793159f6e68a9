"""Backbone registry: build a model + a uniform forward adapter.

The task drivers and train steps are backbone-agnostic: every backbone is
exposed as ``forward(params, batch, *, deterministic, rng, **kw) -> dict``
over a dict batch with static shapes.  Batch keys per backbone:

- lxmert / uniter / caps: ``input_ids (B,T) i32``, ``input_mask (B,T)``,
  ``segment_ids (B,T)``, plus for the vision models ``feats (B,K,2048)``
  and ``boxes`` (4-d normalized for LXMERT, 7-d transform for UNITER).
- butd: ``token_ids (B,40)``, ``feats``, ``boxes``.
- vilt: ``input_ids``, ``input_mask``, ``pixels (B,H,W,3)``.

Replaces the reference's per-driver backbone if/elif ladders
(``src/tasks/gqa_conf.py:79-108``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from rgqa_tpu.config import ModelConfig

__all__ = ["build_model", "example_batch", "BACKBONES"]

Forward = Callable[..., dict]


def _dropout_rngs(rng):
    return {"dropout": rng} if rng is not None else None


def _build_lxmert(cfg: ModelConfig, dtype):
    from rgqa_tpu.models.lxmert import LxmertForGQA

    model = LxmertForGQA(
        cfg.encoder,
        cfg.num_answers,
        branched=cfg.branched,
        branched_layers=cfg.branched_layers,
        project_size=cfg.project_size,
        dtype=dtype,
    )

    def forward(params, batch, *, deterministic=True, rng=None, **kw):
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["input_mask"],
            batch["segment_ids"],
            batch["feats"],
            batch["boxes"],
            deterministic=deterministic,
            rngs=_dropout_rngs(rng),
            **kw,
        )

    return model, forward


def _build_uniter(cfg: ModelConfig, dtype):
    from rgqa_tpu.models.uniter import UniterForGQA

    model = UniterForGQA(cfg.encoder, cfg.num_answers, dtype=dtype)

    def forward(params, batch, *, deterministic=True, rng=None, **kw):
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["input_mask"],
            batch["segment_ids"],
            batch["feats"],
            batch["boxes"],
            deterministic=deterministic,
            rngs=_dropout_rngs(rng),
            **kw,
        )

    return model, forward


def _build_butd(cfg: ModelConfig, dtype):
    from rgqa_tpu.models.butd import ButdForGQA

    model = ButdForGQA(
        vocab_size=cfg.butd_vocab_size,
        num_answers=cfg.num_answers,
        embed_dim=cfg.butd_embed_dim,
        hidden=cfg.butd_hidden_dim,
        branched=cfg.branched,
    )

    def forward(params, batch, *, deterministic=True, rng=None, **kw):
        return model.apply(
            {"params": params},
            batch["token_ids"],
            batch["feats"],
            batch["boxes"],
            deterministic=deterministic,
            rngs=_dropout_rngs(rng),
            **kw,
        )

    return model, forward


def _build_caps(cfg: ModelConfig, dtype):
    from rgqa_tpu.models.caps import CaptionMatcher

    model = CaptionMatcher(cfg.encoder, dtype=dtype)

    def forward(params, batch, *, deterministic=True, rng=None, **kw):
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["input_mask"],
            batch["segment_ids"],
            deterministic=deterministic,
            rngs=_dropout_rngs(rng),
            **kw,
        )

    return model, forward


def _build_vilt(cfg: ModelConfig, dtype):
    from rgqa_tpu.models.vilt import ViltForGQA

    model = ViltForGQA(
        cfg.encoder,
        cfg.num_answers,
        patch_size=cfg.vilt_patch_size,
        image_size=cfg.vilt_image_size,
        dtype=dtype,
    )

    def forward(params, batch, *, deterministic=True, rng=None, **kw):
        pixels = batch.get("pixels")
        # An explicit pixel_mask kwarg (tests, callers probing the mask
        # path) wins over the batch-carried one.
        pixel_mask = kw.pop("pixel_mask", batch.get("pixel_mask"))
        if pixels is None:
            # uint8 wire (--pixel_wire u8): pixels ship as uint8 + the
            # real-pixel rect and normalize INSIDE the jit — zero
            # quantization error at 1/4 the bytes.  The pad-patch mask rides
            # the batch (rect geometry, not pixel content): the model's
            # content rule keys on exactly-zero post-normalize pixels,
            # which the quantized wire must not be asked to reproduce.
            from rgqa_tpu.ops.pixels import pixelbert_normalize_jnp

            pixels = pixelbert_normalize_jnp(
                batch["pixels_u8"], batch["pixel_rect"]
            )
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["input_mask"],
            pixels,
            pixel_mask=pixel_mask,
            deterministic=deterministic,
            rngs=_dropout_rngs(rng),
            **kw,
        )

    return model, forward


BACKBONES = {
    "lxmert": _build_lxmert,
    "uniter": _build_uniter,
    "butd": _build_butd,
    "caps": _build_caps,
    "vilt": _build_vilt,
}


def build_model(cfg: ModelConfig, *, use_bf16: bool = False):
    """Instantiate (flax module, uniform forward adapter) for a backbone."""
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    try:
        builder = BACKBONES[cfg.backbone]
    except KeyError:
        raise ValueError(
            f"unknown backbone {cfg.backbone!r}; have {sorted(BACKBONES)}"
        ) from None
    return builder(cfg, dtype)


def example_batch(
    cfg: ModelConfig,
    batch_size: int = 8,
    *,
    seed: int = 0,
    with_target: bool = False,
) -> dict:
    """A synthetic fixed-shape batch for compile checks and benchmarks."""
    rng = np.random.default_rng(seed)
    t = cfg.max_text_len
    k = cfg.encoder.num_objects
    batch: dict[str, Any] = {}
    if cfg.backbone == "butd":
        batch["token_ids"] = rng.integers(
            0, cfg.butd_vocab_size, (batch_size, 40), dtype=np.int32
        )
    else:
        low = min(1000, cfg.encoder.vocab_size // 2)
        ids = rng.integers(
            low, cfg.encoder.vocab_size, (batch_size, t), dtype=np.int32
        )
        ids[:, 0] = min(101, cfg.encoder.vocab_size - 1)  # [CLS]
        batch["input_ids"] = ids
        batch["input_mask"] = np.ones((batch_size, t), np.int32)
        batch["segment_ids"] = np.zeros((batch_size, t), np.int32)
    if cfg.backbone in ("lxmert", "uniter", "butd"):
        batch["feats"] = rng.standard_normal(
            (batch_size, k, cfg.encoder.visual_feat_dim), dtype=np.float32
        )
        pos_dim = 7 if cfg.backbone == "uniter" else 4
        batch["boxes"] = rng.random((batch_size, k, pos_dim), dtype=np.float32)
    if cfg.backbone == "vilt":
        s = cfg.vilt_image_size
        batch["pixels"] = rng.standard_normal(
            (batch_size, s, s, 3), dtype=np.float32
        )
    if with_target:
        target = np.zeros((batch_size, cfg.num_answers), np.float32)
        target[np.arange(batch_size), rng.integers(0, cfg.num_answers, batch_size)] = 1.0
        batch["target"] = target
        batch["id_mask"] = np.ones((batch_size,), np.float32)
    return batch
