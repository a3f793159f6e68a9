"""Compute kernels for the hot path.

Every op has two implementations selected by :func:`use_pallas`:

- an XLA path (``jnp``) that compiles everywhere and is the numerics
  reference, and
- a fused Pallas TPU kernel for the MXU/VPU hot loop.

The reference relies on cuDNN via ``torch.matmul`` + softmax
(``src/lxrt/modeling.py:320-347``); here the same math is expressed as
fused TPU kernels with static shapes.
"""

from rgqa_tpu.ops.attention import multi_head_attention
from rgqa_tpu.ops.layernorm import layer_norm

__all__ = ["multi_head_attention", "layer_norm"]
