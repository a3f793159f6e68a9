"""Kernel dispatch helpers."""

from __future__ import annotations

import os
from functools import lru_cache

import jax

__all__ = ["pallas_enabled", "interpret_mode"]


@lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    """Whether to use Pallas kernels (TPU backend, unless disabled)."""
    if os.environ.get("RGQA_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=1)
def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode (for CPU testing)."""
    return jax.default_backend() != "tpu"
