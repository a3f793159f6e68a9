"""Compute kernels for the hot path.

The fused attention op has two implementations selected by
``pallas_enabled()``:

- an XLA path (``jnp``) that compiles everywhere and is the numerics
  reference, and
- a fused Pallas TPU kernel (natural-layout, VMEM-resident) that wins
  ~2-3.4x over XLA at RGQA's short sequence lengths (see
  ``ops/attention.py`` for v5e measurements).

Kernels that *lost* to XLA on v5e were measured and deleted rather than
shipped decoratively: a (B, H, S, D)-layout attention kernel (7.1k vs
8.5k q/s model-wide — the transposes it required ate the fusion win) and
a fused LayerNorm-residual kernel (XLA already fuses LN epilogues into
the surrounding matmuls at these shapes).  The measurement table lives in
``docs/kernels.md``.

The reference relies on cuDNN via ``torch.matmul`` + softmax
(``src/lxrt/modeling.py:320-347``); here the same math is expressed as
one fused TPU kernel with static shapes.
"""

from rgqa_tpu.ops.attention import (
    attention_probs,
    fused_attention,
    multi_head_attention,
)

__all__ = ["fused_attention", "multi_head_attention", "attention_probs"]
