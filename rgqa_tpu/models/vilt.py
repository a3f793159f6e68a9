"""ViLT: patch-based single-stream vision-language transformer.

Rebuild of the reference ViLT backbone (``src/vilt/vilt.py:8-125`` over a
vendored timm ViT-B/32, ``src/vilt/modules/vision_transformer.py``):

- BERT-style text embeddings + a separate 2-way token-type table added to
  *both* modalities (``vilt.py:86-93``);
- image path: conv patch embedding (32x32 stride), CLS token, learned
  position embeddings (``visual_embed``);
- a **pre-norm** ViT encoder (timm Block: ``x + attn(ln(x))``,
  ``x + mlp(ln(x))``) — unlike the BERT post-norm blocks used elsewhere —
  with the additive key-side mask;
- pooler on token 0 and the 2-layer GELU classifier (``vilt.py:38-44``).

TPU notes: the patch conv is one big MXU matmul (XLA lowers stride=kernel
convs to reshapes+dot); everything is static-shape (384x384 -> 144
patches + 1 CLS).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.config import EncoderConfig
from rgqa_tpu.models.transformer import (
    LayerNorm,
    Pooler,
    TextEmbeddings,
    dense_init,
    gelu,
    mask_to_bias,
)
from rgqa_tpu.ops.attention import fused_attention
from rgqa_tpu.ops.dropout import HiddenDropout

__all__ = ["ViltForGQA", "ViltAnswerHead", "ViTBlock", "PatchEmbed"]


class PatchEmbed(nn.Module):
    """Conv patch embedding (timm PatchEmbed)."""

    hidden_size: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        # (B, H, W, 3) -> (B, H/p, W/p, hidden) -> (B, N, hidden)
        x = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="proj",
            dtype=self.dtype,
        )(pixels)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (timm Block semantics)."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, bias=None, *, deterministic: bool = True,
        use_fused=None,
    ):
        c = self.cfg

        h = LayerNorm(eps=1e-6, name="norm1")(x)

        def proj(name):
            return nn.Dense(
                c.hidden_size, kernel_init=dense_init, name=name, dtype=self.dtype
            )(h)

        # Natural-layout fused attention (ops/attention.py): no
        # (B, S, E) -> (B, H, S, D) transposes around the head einsums.
        # At ViLT's 185-token stream the kernel auto-fits its batch block
        # to VMEM (block 8 vs LXMERT's 32).
        ctx = fused_attention(
            proj("query"), proj("key"), proj("value"), bias,
            num_heads=c.num_heads,
            force_xla=use_fused is False,
        )
        ctx = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="att_out", dtype=self.dtype
        )(ctx)
        ctx = HiddenDropout(c.hidden_dropout)(ctx, deterministic=deterministic)
        x = x + ctx

        h = LayerNorm(eps=1e-6, name="norm2")(x)
        h = nn.Dense(
            c.intermediate_size, kernel_init=dense_init, name="mlp_in",
            dtype=self.dtype,
        )(h)
        h = gelu(h)
        h = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="mlp_out", dtype=self.dtype
        )(h)
        h = HiddenDropout(c.hidden_dropout)(h, deterministic=deterministic)
        return x + h


class ViltAnswerHead(nn.Module):
    """ViLT's classifier orders LayerNorm BEFORE the GELU
    (``vilt.py:38-44``: Linear -> LayerNorm -> GELU -> Linear), unlike the
    LXMERT answer head's GELU -> LN."""

    num_answers: int
    hidden_size: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        h = nn.Dense(
            self.hidden_size * 2, kernel_init=dense_init, name="dense",
            dtype=self.dtype,
        )(pooled)
        h = LayerNorm(eps=1e-5, name="ln")(h)  # torch nn.LayerNorm default
        h = gelu(h)
        return nn.Dense(
            self.num_answers, kernel_init=dense_init, name="logits",
            dtype=self.dtype,
        )(h)


class ViltForGQA(nn.Module):
    """ViLT + GQA answer head (reference ``GQAViLT``)."""

    cfg: EncoderConfig
    num_answers: int
    patch_size: int = 32
    image_size: int = 384
    # Mask pad patches out of attention (reference visual_embed drops
    # them; see docs/vilt_images.md for the static-shape fidelity story).
    mask_pad_patches: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.text_embeddings = TextEmbeddings(c, self.dtype)
        # Separate modality token-type table (vilt.py:28-29), *in addition*
        # to the text embeddings' own type table.
        self.modality_type = nn.Embed(
            2, c.hidden_size, embedding_init=dense_init, name="modality_type"
        )
        self.patch_embed = PatchEmbed(c.hidden_size, self.patch_size, self.dtype)
        n_patches = (self.image_size // self.patch_size) ** 2
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        )
        self.pos_embed = self.param(
            "pos_embed", dense_init, (1, n_patches + 1, c.hidden_size)
        )
        self.blocks = [
            ViTBlock(c, self.dtype, name=f"block_{i}")
            for i in range(c.num_layers)
        ]
        self.norm = LayerNorm(eps=1e-6)
        self.pooler = Pooler(c, self.dtype)
        self.answer_head = ViltAnswerHead(
            self.num_answers, c.hidden_size, self.dtype
        )

    def patch_valid_mask(self, pixels, dtype):
        """Per-patch validity derived from pixel content — the reference's
        own rule (``vision_transformer.py:555-556``: pad pixels are exactly
        0 after inception-normalize, so a channel-sum test marks the real
        region; here abs-sum, which a real pixel can never zero out).  A
        patch is valid iff ANY of its pixels is real, so partial boundary
        patches stay attended like the reference's nearest-interp mask."""
        b, hh, ww, _ = pixels.shape
        p = self.patch_size
        nz = jnp.abs(pixels.astype(jnp.float32)).sum(-1) > 0  # (B, H, W)
        nz = nz.reshape(b, hh // p, p, ww // p, p)
        return nz.any(axis=(2, 4)).reshape(b, -1).astype(dtype)

    def __call__(
        self,
        input_ids,
        input_mask,
        pixels,
        *,
        pixel_mask=None,
        deterministic: bool = True,
        use_fused=None,
        **_,
    ) -> dict[str, Any]:
        b = input_ids.shape[0]
        text = self.text_embeddings(input_ids, deterministic=deterministic)
        text = text + self.modality_type(jnp.zeros_like(input_mask))

        img = self.patch_embed(pixels.astype(self.dtype))
        cls = jnp.broadcast_to(
            self.cls_token.astype(img.dtype), (b, 1, img.shape[-1])
        )
        img = jnp.concatenate([cls, img], axis=1) + self.pos_embed.astype(img.dtype)
        # Pad patches are masked out of attention (reference visual_embed
        # drops them from the stream entirely, ``vision_transformer.py:
        # 611-663``; static shapes keep them as masked key positions).
        # ``pixel_mask`` (B, n_patches) overrides the content-derived mask.
        if pixel_mask is None and self.mask_pad_patches:
            pixel_mask = self.patch_valid_mask(pixels, input_mask.dtype)
        if pixel_mask is None:
            img_mask = jnp.ones((b, img.shape[1]), input_mask.dtype)
        else:
            img_mask = jnp.concatenate(
                [
                    jnp.ones((b, 1), input_mask.dtype),  # CLS always valid
                    pixel_mask.astype(input_mask.dtype),
                ],
                axis=1,
            )
        img = img + self.modality_type(jnp.ones_like(img_mask))  # type idx 1

        stream = jnp.concatenate([text, img], axis=1)
        bias = mask_to_bias(
            jnp.concatenate([input_mask, img_mask], axis=1), self.dtype
        )
        for blk in self.blocks:
            stream = blk(
                stream, bias, deterministic=deterministic,
                use_fused=use_fused,
            )
        stream = self.norm(stream)
        pooled = self.pooler(stream)
        return {
            "logits": self.answer_head(pooled),
            "pooled": pooled,
        }
