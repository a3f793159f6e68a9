"""Device mesh + sharding utilities.

The canonical layout is a 2-D ``Mesh(('data', 'model'))``:

- ``data`` — batch sharding (pure data parallelism).  All RGQA models fit
  comfortably in a single chip's HBM (~230 M params), so this is the default
  and only mandatory axis (SURVEY.md §2.3).
- ``model`` — optional tensor parallelism.  When ``model > 1``, the large
  matmuls (QKV/FFN kernels, the 1842-way answer head, embedding tables) are
  sharded over it via ``param_partition_spec`` and XLA inserts the
  all-reduces over ICI.

Everything goes through ``jit`` with ``NamedSharding`` annotations — no
explicit collectives in model code; gradient all-reduce falls out of the
batch sharding automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "param_partition_spec",
    "pad_batch_to",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    model: int = 1,
    data: Optional[int] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices.

    ``model`` divides the device count; ``data`` defaults to the remainder.
    With one device this still returns a valid 1x1 mesh so the same code
    path serves single-chip and pod-slice runs.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model:
        raise ValueError(f"model axis {model} does not divide {n} devices")
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params without a model axis)."""
    return NamedSharding(mesh, P())


def pad_batch_to(batch: Any, size: int) -> tuple[Any, int]:
    """Pad every leaf's leading axis to ``size`` (repeat-last-row padding).

    Returns (padded batch, original length).  Keeps shapes static across the
    final partial batch of an epoch so nothing recompiles.
    """
    first = jax.tree_util.tree_leaves(batch)[0]
    n = first.shape[0]
    if n == size:
        return batch, n
    if n > size:
        raise ValueError(f"batch {n} larger than pad target {size}")

    def pad(x):
        reps = np.concatenate(
            [np.arange(n), np.full(size - n, n - 1, dtype=np.int64)]
        )
        return np.asarray(x)[reps]

    return jax.tree_util.tree_map(pad, batch), n


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with leading-axis sharding over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


# ---------------------------------------------------------------------------
# Tensor-parallel parameter layouts.
# ---------------------------------------------------------------------------

# flax param-path suffix -> PartitionSpec for 2-D kernels.  Row/col choices
# follow the Megatron pattern: QKV & FFN-in column-parallel, attention-out &
# FFN-out row-parallel, so each transformer block needs one all-reduce per
# sub-layer and activations stay sharded by heads in between.
_COL_PARALLEL = ("query", "key", "value", "inter", "logits", "decoder_obj", "decoder_attr")
_ROW_PARALLEL = ("out",)


def param_partition_spec(path: tuple, value: Any) -> P:
    """PartitionSpec for one parameter, keyed by its flax module path.

    1-D params (biases, LayerNorm scales) and embeddings are replicated;
    projection kernels shard over the ``model`` axis when present.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    arr = np.asarray(jax.eval_shape(lambda: value) if callable(value) else value)
    ndim = getattr(value, "ndim", arr.ndim)
    if ndim < 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL_PARALLEL:
        return P(None, "model")
    if parent in _ROW_PARALLEL:
        return P("model", None)
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree on the mesh.

    With ``model == 1`` this replicates everything; with a real model axis,
    projection kernels are sharded per :func:`param_partition_spec`.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))
    leaves = []
    for path, value in flat:
        spec = param_partition_spec(path, value)
        # Drop the model axis where the dimension doesn't divide (e.g. the
        # 1842-answer head on a 2-way axis) — replicate instead.
        shape = getattr(value, "shape", None)
        if shape is not None and any(
            axis is not None and shape[i] % axis_size.get(axis, 1) != 0
            for i, axis in enumerate(spec)
        ):
            spec = P()
        leaves.append(jax.device_put(value, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
