"""TPU-native CLIP (ViT-B/32 two-tower image-text model).

Rebuild of the CLIP rejection scorer's model (reference
``src/tasks/gqa_clip.py:76-110`` wraps HF ``CLIPModel``; the CLIP-weighted
loss driver ``src/tasks/gqa_weight.py:80-128`` uses the same towers): a
pre-norm ViT vision tower + a causal-mask text transformer, each projected
into a shared space where the rejection score is the image-question cosine
similarity (``logits_per_image / logit_scale.exp()``).

Semantics pinned to the HF ``CLIPModel`` the reference loads
(``transformers/models/clip/modeling_clip.py``):

- quick-GELU ``x * sigmoid(1.702 x)`` activations;
- pre-norm blocks ``x + attn(ln1(x))``, ``x + mlp(ln2(x))``, LN eps 1e-5;
- vision: 32x32 conv patches (no bias), class embedding, learned position
  table, ``pre_layrnorm`` before the blocks, pooled = post-LN of token 0;
- text: token + position embeddings, causal mask, final LN, pooled at the
  EOT position (argmax of ids for the original ``eos_token_id == 2``
  configs, first-EOS otherwise — both HF paths);
- projections without bias, L2-normalized embeddings, learned
  ``logit_scale``.

TPU notes: the patch conv is one MXU matmul (stride == kernel); the vision
tower's mask-free attention runs on the fused Pallas kernel in the natural
(B, S, H*D) layout (``ops/attention.py``); the text tower needs a causal
(Sq, Skv) mask, which the KV-vector kernel cannot express — its 77-token
attention stays on the XLA path (a negligible share of the FLOPs next to
50-patch x 768-hidden vision blocks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rgqa_tpu.models.transformer import dense_init
from rgqa_tpu.ops.attention import fused_attention, multi_head_attention

__all__ = [
    "ClipConfig",
    "ClipTowerConfig",
    "ClipModel",
    "ClipVisionTower",
    "ClipTextTower",
    "quick_gelu",
    "clip_config_from_hf",
]


def quick_gelu(x):
    """HF ``quick_gelu``: ``x * sigmoid(1.702 x)`` (CLIP's activation)."""
    return x * nn.sigmoid(1.702 * x)


@dataclass(frozen=True)
class ClipTowerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    # HF CLIPConfig carries an independent eps per tower.
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class ClipConfig:
    """ViT-B/32 defaults (``openai/clip-vit-base-patch32``)."""

    vision: ClipTowerConfig = field(default_factory=ClipTowerConfig)
    text: ClipTowerConfig = field(
        default_factory=lambda: ClipTowerConfig(
            hidden_size=512, num_layers=12, num_heads=8,
            intermediate_size=2048,
        )
    )
    image_size: int = 224
    patch_size: int = 32
    vocab_size: int = 49408
    max_text_len: int = 77
    # The original openai configs ship eos_token_id == 2 (pre-HF-#24773):
    # EOT pooling is then argmax over ids (EOT is the highest id);
    # re-exported configs carry the real EOT id and pool at its first
    # occurrence.  Both behaviors are implemented (modeling_clip.py:628-651).
    eos_token_id: int = 2
    projection_dim: int = 512
    logit_scale_init: float = 2.6592


def clip_config_from_hf(config: dict) -> ClipConfig:
    """Build a :class:`ClipConfig` from an HF ``config.json`` dict."""
    v = config.get("vision_config", {})
    t = config.get("text_config", {})
    return ClipConfig(
        vision=ClipTowerConfig(
            hidden_size=v.get("hidden_size", 768),
            num_layers=v.get("num_hidden_layers", 12),
            num_heads=v.get("num_attention_heads", 12),
            intermediate_size=v.get("intermediate_size", 3072),
            layer_norm_eps=v.get("layer_norm_eps", 1e-5),
        ),
        text=ClipTowerConfig(
            hidden_size=t.get("hidden_size", 512),
            num_layers=t.get("num_hidden_layers", 12),
            num_heads=t.get("num_attention_heads", 8),
            intermediate_size=t.get("intermediate_size", 2048),
            layer_norm_eps=t.get("layer_norm_eps", 1e-5),
        ),
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        vocab_size=t.get("vocab_size", 49408),
        max_text_len=t.get("max_position_embeddings", 77),
        eos_token_id=t.get("eos_token_id", 2),
        projection_dim=config.get("projection_dim", 512),
        logit_scale_init=config.get("logit_scale_init_value", 2.6592),
    )


class ClipLayerNorm(nn.Module):
    """torch ``nn.LayerNorm`` semantics (f32 stats, eps inside sqrt)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(x.dtype)


class ClipEncoderLayer(nn.Module):
    """Pre-norm block (HF ``CLIPEncoderLayer``).

    ``bias4`` is an optional additive (B, 1, Sq, Skv) mask (causal +
    padding, text tower); when absent (vision tower) attention runs on the
    fused Pallas kernel in the natural layout.
    """

    cfg: ClipTowerConfig
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias4=None):
        c = self.cfg
        b, s, e = x.shape
        h = ClipLayerNorm(eps=self.eps, name="layer_norm1")(x)

        def proj(name, inp):
            return nn.Dense(
                c.hidden_size, kernel_init=dense_init, name=name,
                dtype=self.dtype,
            )(inp)

        q = proj("q_proj", h)
        k = proj("k_proj", h)
        v = proj("v_proj", h)
        if bias4 is None:
            ctx = fused_attention(q, k, v, None, num_heads=c.num_heads)
        else:
            d = c.hidden_size // c.num_heads

            def heads(t):
                return t.reshape(b, s, c.num_heads, d).transpose(0, 2, 1, 3)

            ctx = multi_head_attention(heads(q), heads(k), heads(v), bias4)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        ctx = proj("out_proj", ctx)
        x = x + ctx

        h = ClipLayerNorm(eps=self.eps, name="layer_norm2")(x)
        h = nn.Dense(
            c.intermediate_size, kernel_init=dense_init, name="fc1",
            dtype=self.dtype,
        )(h)
        h = quick_gelu(h)
        h = nn.Dense(
            c.hidden_size, kernel_init=dense_init, name="fc2",
            dtype=self.dtype,
        )(h)
        return x + h


class ClipVisionTower(nn.Module):
    """HF ``CLIPVisionTransformer``: conv patches + CLS + positions ->
    pre-LN -> blocks -> post-LN of token 0."""

    cfg: ClipConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        n_patches = (c.image_size // c.patch_size) ** 2
        self.class_embedding = self.param(
            "class_embedding", dense_init, (c.vision.hidden_size,)
        )
        self.patch_embedding = nn.Conv(
            c.vision.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            use_bias=False,
            name="patch_embedding",
            dtype=self.dtype,
        )
        self.position_embedding = nn.Embed(
            n_patches + 1, c.vision.hidden_size, embedding_init=dense_init,
            name="position_embedding",
        )
        self.pre_layernorm = ClipLayerNorm(eps=c.vision.layer_norm_eps)
        self.layers = [
            ClipEncoderLayer(
                c.vision, eps=c.vision.layer_norm_eps, dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(c.vision.num_layers)
        ]
        self.post_layernorm = ClipLayerNorm(eps=c.vision.layer_norm_eps)

    def __call__(self, pixels):
        """``pixels``: (B, H, W, 3) float — channels-last (the scorer
        transposes HF's NCHW)."""
        b = pixels.shape[0]
        x = self.patch_embedding(pixels.astype(self.dtype))
        x = x.reshape(b, -1, x.shape[-1])  # (B, N, E), row-major == HF
        cls = jnp.broadcast_to(
            self.class_embedding.astype(x.dtype), (b, 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.position_embedding(
            jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
        ).astype(x.dtype)
        x = self.pre_layernorm(x)
        for layer in self.layers:
            x = layer(x)
        return self.post_layernorm(x[:, 0])


class ClipTextTower(nn.Module):
    """HF ``CLIPTextTransformer``: embeddings -> causal blocks -> final LN
    -> EOT pooling."""

    cfg: ClipConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(
            c.vocab_size, c.text.hidden_size, embedding_init=dense_init,
            name="token_embedding",
        )
        self.position_embedding = nn.Embed(
            c.max_text_len, c.text.hidden_size, embedding_init=dense_init,
            name="position_embedding",
        )
        self.layers = [
            ClipEncoderLayer(
                c.text, eps=c.text.layer_norm_eps, dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(c.text.num_layers)
        ]
        self.final_layer_norm = ClipLayerNorm(eps=c.text.layer_norm_eps)

    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        b, s = input_ids.shape
        x = self.token_embedding(input_ids)
        x = x + self.position_embedding(
            jnp.arange(s, dtype=jnp.int32)[None, :]
        )
        x = x.astype(self.dtype)
        # HF builds both masks with finfo(dtype).min (not -10000):
        # _create_4d_causal_attention_mask + _prepare_4d_attention_mask.
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((s, s), neg, jnp.float32), k=1)
        bias4 = causal[None, None, :, :]
        if attention_mask is not None:
            pad = (1.0 - attention_mask.astype(jnp.float32)) * neg
            bias4 = bias4 + pad[:, None, None, :]
        for layer in self.layers:
            x = layer(x, bias4=bias4)
        x = self.final_layer_norm(x)
        if c.eos_token_id == 2:
            # Original openai configs: EOT is the highest id per row.
            eot = jnp.argmax(input_ids, axis=-1)
        else:
            eot = jnp.argmax(
                (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1
            )
        return x[jnp.arange(b), eot]


class ClipModel(nn.Module):
    """Two towers + projections + logit scale (HF ``CLIPModel``)."""

    cfg: ClipConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.vision_model = ClipVisionTower(c, self.dtype)
        self.text_model = ClipTextTower(c, self.dtype)
        self.visual_projection = nn.Dense(
            c.projection_dim, use_bias=False, kernel_init=dense_init,
            name="visual_projection", dtype=self.dtype,
        )
        self.text_projection = nn.Dense(
            c.projection_dim, use_bias=False, kernel_init=dense_init,
            name="text_projection", dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, c.logit_scale_init),
            (),
        )

    def image_features(self, pixels):
        """Projected (unnormalized) image embeddings
        (HF ``get_image_features``)."""
        return self.visual_projection(self.vision_model(pixels))

    def text_features(self, input_ids, attention_mask=None):
        """Projected (unnormalized) text embeddings
        (HF ``get_text_features``)."""
        return self.text_projection(
            self.text_model(input_ids, attention_mask)
        )

    def __call__(
        self, input_ids, attention_mask, pixels
    ) -> dict[str, Any]:
        img = self.image_features(pixels).astype(jnp.float32)
        txt = self.text_features(input_ids, attention_mask).astype(
            jnp.float32
        )
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        logits_per_text = (txt @ img.T) * scale
        return {
            "image_embeds": img,
            "text_embeds": txt,
            "logits_per_image": logits_per_text.T,
            "logits_per_text": logits_per_text,
        }

    def cosine(self, input_ids, attention_mask, pixels):
        """Per-(image, question) cosine similarity — the rejection score
        (``gqa_clip.py:96-104``: ``logits_per_image / logit_scale.exp()``
        diagonal).  Pairwise, not the full B x B matrix."""
        img = self.image_features(pixels).astype(jnp.float32)
        txt = self.text_features(input_ids, attention_mask).astype(
            jnp.float32
        )
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return jnp.sum(img * txt, axis=-1)
