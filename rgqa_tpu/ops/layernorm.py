"""LayerNorm with the reference's BERT semantics (eps 1e-12, trained scale
and bias; ``src/lxrt/modeling.py`` BertLayerNorm).

The XLA path is the numerics reference.  The Pallas kernel fuses the
mean/variance reduction with the affine transform and the residual add —
the pattern the reference leaves to cuDNN/ATen (``modeling.py:404-415``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgqa_tpu.ops.common import interpret_mode, pallas_enabled

__all__ = ["layer_norm", "layer_norm_residual"]


def _ln_xla(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _ln_kernel(x_ref, res_ref, scale_ref, bias_ref, o_ref, *, eps, with_residual):
    x = x_ref[:].astype(jnp.float32)
    if with_residual:
        x = x + res_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "with_residual", "row_block"))
def _ln_pallas(x, residual, scale, bias, eps, with_residual, row_block=256):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    res2 = residual.reshape(-1, d) if with_residual else jnp.zeros((1, d), x.dtype)
    n = x2.shape[0]
    pad = (-n) % row_block
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if with_residual:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    rows = x2.shape[0]
    grid = (rows // row_block,)
    res_spec = (
        pl.BlockSpec((row_block, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if with_residual
        else pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, with_residual=with_residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            res_spec,
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_block, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret_mode(),
    )(x2, res2, scale, bias)
    if pad:
        out = out[:n]
    return out.reshape(orig_shape)


def layer_norm(x, scale, bias, eps: float = 1e-12, *, force_xla: bool = False):
    """LayerNorm over the last axis with f32 statistics."""
    if force_xla or not pallas_enabled():
        return _ln_xla(x, scale, bias, eps)
    return _ln_pallas(x, x, scale, bias, eps, False)


def layer_norm_residual(
    x, residual, scale, bias, eps: float = 1e-12, *, force_xla: bool = False
):
    """Fused ``LayerNorm(x + residual)`` — the transformer block epilogue."""
    if force_xla or not pallas_enabled():
        return _ln_xla(x + residual, scale, bias, eps)
    return _ln_pallas(x, residual, scale, bias, eps, True)
