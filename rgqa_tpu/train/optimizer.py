"""BertAdam and schedules as optax gradient transformations.

Numerics-equivalent rebuild of the reference optimizer
(``src/lxrt/optimization.py:52-180``), which all RGQA finetunes use:

- Adam moments with **no bias correction** (the fork comments it out);
- decoupled weight decay added to the update *after* the moment ratio;
- schedule factor computed from the **pre-increment** step count, so the
  very first step runs at lr 0 under warmup;
- internal per-param clipping disabled ("LXRT: grad is clipped outside",
  ``optimization.py:141-144``) — the global clip-by-norm 5.0 lives in the
  train step (``gqa_conf.py:201``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from rgqa_tpu.config import OptimConfig

__all__ = [
    "warmup_linear",
    "warmup_constant",
    "warmup_cosine",
    "bert_adam",
    "make_optimizer",
]


def warmup_linear(x, warmup: float = 0.002):
    """Triangular schedule factor (``optimization.py:38-43``)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(
        x < warmup,
        jnp.where(warmup > 0, x / warmup, 1.0),
        jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0),
    )


def warmup_constant(x, warmup: float = 0.002):
    """Warmup then constant (``optimization.py:31-36``)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x < warmup, jnp.where(warmup > 0, x / warmup, 1.0), 1.0)


def warmup_cosine(x, warmup: float = 0.002):
    """Warmup then cosine over the whole run (``optimization.py:26-29``)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(
        x < warmup,
        jnp.where(warmup > 0, x / warmup, 1.0),
        0.5 * (1.0 + jnp.cos(jnp.pi * x)),
    )


SCHEDULES = {
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
}


class BertAdamState(NamedTuple):
    count: jnp.ndarray  # pre-increment step, like the reference's state
    mu: optax.Updates
    nu: optax.Updates


def bert_adam(
    lr: float,
    *,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """The reference BertAdam as an ``optax.GradientTransformation``.

    Emits *negative* updates (optax convention: ``params + updates``).

    ``moment_dtype`` (e.g. ``jnp.bfloat16``) stores mu/nu in a reduced
    dtype to halve the optimizer-state HBM traffic; the moment math still
    runs in f32 (cast in, cast out).  Default ``None`` keeps the
    reference-parity f32 trajectory (``--bf16_moments`` opts in).
    """
    sched_fn = SCHEDULES[schedule]

    def init(params):
        import numpy as np

        # mu and nu must be *distinct* buffer trees (donation in the train
        # step rejects aliased inputs), and count a fresh scalar buffer.
        def zeros(p):
            return jnp.zeros(p.shape, moment_dtype or p.dtype)

        mu = jax.tree_util.tree_map(zeros, params)
        nu = jax.tree_util.tree_map(zeros, params)
        return BertAdamState(
            count=jax.device_put(np.zeros((), np.int32)), mu=mu, nu=nu
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("bert_adam requires params (weight decay)")
        out_dt = moment_dtype  # None -> keep the f32 math dtype

        def new_mu(m, g):
            m32 = m.astype(jnp.float32)
            r = b1 * m32 + (1.0 - b1) * g
            return r.astype(out_dt) if out_dt else r

        def new_nu(v, g):
            v32 = v.astype(jnp.float32)
            r = b2 * v32 + (1.0 - b2) * g * g
            return r.astype(out_dt) if out_dt else r

        mu = jax.tree_util.tree_map(new_mu, state.mu, grads)
        nu = jax.tree_util.tree_map(new_nu, state.nu, grads)
        if t_total > 0:
            progress = state.count.astype(jnp.float32) / t_total
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        def step(m, v, p):
            m32 = m.astype(jnp.float32)
            v32 = v.astype(jnp.float32)
            upd = m32 / (jnp.sqrt(v32) + eps)
            if weight_decay > 0.0:
                upd = upd + weight_decay * p
            return (-lr_t * upd).astype(p.dtype)

        updates = jax.tree_util.tree_map(step, mu, nu, params)
        return updates, BertAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    cfg: OptimConfig, t_total: int = -1
) -> optax.GradientTransformation:
    """Optimizer from config, mirroring ``src/param.py:11-30`` dispatch.

    ``bert`` → BertAdam with warmup over ``t_total`` steps; others map to
    their optax equivalents (the reference uses torch classes with
    ``weight_decay=0``, ``gqa_conf.py:130``).
    """
    name = cfg.name.lower()
    if "bert" in name:
        return bert_adam(
            cfg.lr,
            warmup=cfg.warmup,
            t_total=t_total,
            schedule=cfg.schedule,
            weight_decay=cfg.weight_decay,
            moment_dtype=jnp.bfloat16
            if getattr(cfg, "bf16_moments", False)
            else None,
        )
    if name == "adam":
        return optax.adam(cfg.lr)
    if name == "adamw":
        return optax.adamw(cfg.lr, weight_decay=0.0)
    if name == "adamax":
        return optax.adamax(cfg.lr)
    if name == "sgd":
        return optax.sgd(cfg.lr)
    if name == "rms":
        return optax.rmsprop(cfg.lr)
    raise ValueError(f"unknown optimizer {cfg.name!r}")
