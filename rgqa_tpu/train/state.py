"""Functional train state: params + optimizer state + step counter."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """A pytree carrying everything one SPMD train step mutates."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    params: Any, tx: optax.GradientTransformation
) -> TrainState:
    import numpy as np

    # device_put of a fresh numpy scalar: jnp.zeros(()) constants are
    # cached/deduped by JAX, and a shared buffer between `step` and the
    # optimizer's `count` breaks buffer donation in the train step.
    return TrainState(
        step=jax.device_put(np.zeros((), np.int32)),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )
