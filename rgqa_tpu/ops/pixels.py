"""In-jit pixel decode for the uint8 wire feeds.

The image backbones' serving surface ships pixels over the host->device
link; on a wire-bound link (tunneled chips: 50-90 MB/s) the feed dtype
IS the throughput.  Source images are uint8 — shipping them as uint8 and
normalizing on device carries ZERO quantization error (the uint8 wire
IS the source lattice) at 1/4 the f32 bytes and 1/2 the bf16 bytes.
Fidelity vs the host-f32 feed: identical f32 expressions; eager
execution is bitwise-equal, and under jit XLA lowers the constant
divisions to reciprocal multiplies (and fma-contracts), a <= 1-ulp
(2^-23 relative) f32 reassociation that cannot be disabled.  For f32
serving this is the whole story: measured score drift ~6e-8 (pinned in
tests/test_images.py + test_runner.py).  For bf16 serving the 1-ulp
pixel drift flips bf16 rounding on ~1/30k pixels, amplified by the
patch conv to |dscore| mean ~4e-4 / max ~1e-3 — the same order as
comparing any two XLA program variants of a bf16 model, and under the
shipped int8 feats feed's measured tolerance (docs/kernels.md "Image
production scoring").  Matches the serving half of the reference image datasets
(``src/tasks/gqa_data.py:253-330``, ``gqa_clip.py:76-110``), which feed
f32 pixel tensors per batch.

Two normalizations:
- :func:`pixelbert_normalize_jnp` — ViLT's inception normalize
  ``(x/255 - 0.5)/0.5`` with the pad region re-zeroed from the rect
  (pad zeros are a post-normalize invariant the uint8 lattice cannot
  carry: 0.0 sits at 127.5/255).
- :func:`clip_normalize_jnp` — CLIP's mean/std normalize (center-crop
  pipeline, no pad region).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixelbert_normalize_jnp", "clip_normalize_jnp"]

# HF CLIPImageProcessor constants (OPENAI_CLIP_MEAN/STD) — keep in sync
# with rgqa_tpu.scorers.clip (duplicated to avoid importing the scorer
# stack inside jitted model code).
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def pixelbert_normalize_jnp(u8: jnp.ndarray, rect: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, 3) uint8 + (B, 4) rects -> f32 pixels in [-1, 1], pad
    region exactly 0.0 — the in-jit twin of
    ``rgqa_tpu.data.images.pixelbert_normalize`` (same f32 expression;
    <= 1-ulp under jit, see module docstring)."""
    x = (u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    size = u8.shape[-3]
    top = rect[:, 0][:, None]
    left = rect[:, 1][:, None]
    h = rect[:, 2][:, None]
    w = rect[:, 3][:, None]
    coord = jnp.arange(size)[None, :]
    rows = (coord >= top) & (coord < top + h)  # (B, S)
    cols = (coord >= left) & (coord < left + w)
    inside = rows[:, :, None] & cols[:, None, :]  # (B, S, S)
    return x * inside[..., None].astype(jnp.float32)


def clip_normalize_jnp(u8: jnp.ndarray) -> jnp.ndarray:
    """(B, S, S, 3) uint8 -> f32 CLIP-normalized pixels (the in-jit twin
    of ``rgqa_tpu.scorers.clip.clip_normalize``)."""
    mean = jnp.asarray(_CLIP_MEAN, jnp.float32)
    std = jnp.asarray(_CLIP_STD, jnp.float32)
    return (u8.astype(jnp.float32) / 255.0 - mean) / std
