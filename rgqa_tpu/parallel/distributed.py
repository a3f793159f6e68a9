"""Multi-host (pod-slice) initialization over DCN.

The reference never scales past one process (``nn.DataParallel``); here
multi-host runs initialize ``jax.distributed`` once per process and build
the global mesh: the ``data`` axis spans all hosts' chips (DCN between
hosts, ICI within), the optional ``model`` axis stays within a host so
tensor-parallel collectives ride ICI only — the layout the scaling
playbook prescribes for small models.

Single-host runs need none of this: ``make_mesh()`` over local devices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from rgqa_tpu.parallel.mesh import make_mesh

__all__ = ["initialize_multihost", "global_mesh"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent; no-op for single process).

    With no arguments, uses the cluster-provided environment (TPU pod
    metadata / ``JAX_COORDINATOR_ADDRESS`` etc.), matching
    ``jax.distributed.initialize()`` semantics.
    """
    if num_processes in (None, 1) and not coordinator_address and not os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(model: int = 1):
    """Mesh over *all* processes' devices (jax.devices() is global after
    ``jax.distributed.initialize``).  ``model`` must divide the per-host
    chip count so TP collectives never cross DCN."""
    local = jax.local_device_count()
    if model > 1 and local % model != 0:
        raise ValueError(
            f"model axis {model} must divide local device count {local} "
            "(TP must stay on ICI)"
        )
    return make_mesh(jax.devices(), model=model)
