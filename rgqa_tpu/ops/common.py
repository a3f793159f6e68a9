"""Kernel dispatch helpers."""

from __future__ import annotations

import os
from functools import lru_cache

import jax

__all__ = ["pallas_enabled", "interpret_mode"]


@lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    """Whether to use Pallas kernels.

    Default: on for the TPU backend, off elsewhere.  Overrides:
    ``RGQA_DISABLE_PALLAS=1`` forces the XLA paths on TPU;
    ``RGQA_FORCE_PALLAS=1`` runs the kernels in interpreter mode on CPU
    (for kernel-logic tests without a chip).
    """
    if os.environ.get("RGQA_DISABLE_PALLAS"):
        return False
    if os.environ.get("RGQA_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=1)
def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode (for CPU testing)."""
    return jax.default_backend() != "tpu"


@lru_cache(maxsize=1)
def dropout_kernel_enabled() -> bool:
    """The in-kernel dropout PRNG (``pltpu.prng_seed``) has no CPU
    interpreter lowering — hardware TPU only."""
    return pallas_enabled() and jax.default_backend() == "tpu"
