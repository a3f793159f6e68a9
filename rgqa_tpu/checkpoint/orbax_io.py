"""Native checkpointing via orbax: BEST/LAST/EPOCH_n, async-capable.

Replaces the reference's whole-model ``torch.save(state_dict)``
(``src/tasks/gqa.py:255-265``) with orbax pytree checkpoints.  Keeps the
reference's naming convention (``BEST``, ``LAST``, ``EPOCH_%d``,
``--save_all``) so experiment scripts port over.  Unlike the reference,
optimizer state and step counter are saved too, enabling true resume
(the reference has none — SURVEY.md §5).

Async mode (``async_save=True``, the trainers' default for per-epoch
saves) commits the checkpoint on a background thread so the device keeps
training while ~GBs of params serialize — the preemption-coverage
pattern SURVEY §5 prescribes.  :func:`load_checkpoint` and
:func:`wait_for_saves` barrier on in-flight saves, so a load can never
observe a half-written checkpoint from the same process.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_params",
    "load_params",
    "wait_for_saves",
]

_ASYNC_CKPTR = None


def _checkpointer(async_save: bool = False):
    import orbax.checkpoint as ocp

    if async_save:
        global _ASYNC_CKPTR
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        return _ASYNC_CKPTR
    return ocp.PyTreeCheckpointer()


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    directory: str, name: str, state: Any, *, async_save: bool = False
) -> str:
    """Save a train state (or bare params) as ``<directory>/<name>``."""
    path = os.path.abspath(os.path.join(directory, name))
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    } if hasattr(state, "params") else {"params": state}
    _checkpointer(async_save).save(path, payload, force=True)
    return path


def load_checkpoint(directory: str, name: str, template: Optional[Any] = None):
    """Load a checkpoint saved by :func:`save_checkpoint`.

    With ``template`` (a matching pytree of arrays), restores with exact
    structure/dtypes; otherwise restores as saved.
    """
    wait_for_saves()  # never read a checkpoint mid-commit
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(path)
    if hasattr(template, "params"):
        ref = {
            "step": template.step,
            "params": template.params,
            "opt_state": template.opt_state,
        }
    else:
        ref = {"params": template}
    return ckptr.restore(path, item=ref)


def save_params(directory: str, name: str, params: Any) -> str:
    return save_checkpoint(directory, name, params)


def load_params(directory: str, name: str, template: Optional[Any] = None):
    out = load_checkpoint(directory, name, template)
    return out["params"]
