"""SPMD parallelism layer: device meshes, shardings, collective helpers.

TPU-native replacement for the reference's single-process
``nn.DataParallel`` (``src/lxrt/entry.py:102-103``): a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding over ICI) and an
optional ``model`` axis (tensor parallelism over attention heads / FFN /
answer vocab), with XLA collectives inserted by the compiler.
"""

from rgqa_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
    param_partition_spec,
    pad_batch_to,
)
from rgqa_tpu.parallel.distributed import initialize_multihost, global_mesh

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "param_partition_spec",
    "pad_batch_to",
    "initialize_multihost",
    "global_mesh",
]
