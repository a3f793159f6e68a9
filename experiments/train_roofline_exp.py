"""Roofline attribution for the 92.5 ms RGQA finetune step (VERDICT r3 #5).

Where does the train step's time go?  bench_train measures one number
(batch 128, RP-doubled to 256 effective rows, LXMERT 9/5/5 x 768, BCE,
clip 5.0, BertAdam); this experiment decomposes it by timing ablated
programs, each as a chained ``lax.scan`` over N=16 iterations inside one
jit with a single host fetch (the only reliable sync on axon):

  fwd_det    deterministic forward + loss at 256 rows (no dropout)
  fwd        stochastic forward + loss (RP augment + dropout chain)
  grad_det   value_and_grad of the deterministic loss (fwd + bwd)
  grad       value_and_grad of the stochastic loss  (fwd + bwd + dropout)
  opt        BertAdam update + global clip on frozen grads (no model)
  full       the shipped train step (grad + clip + update)
  full_bf16m the same step with bf16 Adam moments (headroom probe)

Derived attribution: bwd = grad_det - fwd_det, dropout-under-grad =
grad - grad_det, optimizer = full - grad (cross-checked against opt).

The bf16-moment probe halves the optimizer state traffic (mu+nu are the
largest non-param buffers the update streams); its trajectory drift is
bounded in tests/test_train.py::test_bf16_moments_track_f32_trajectory.
Results recorded in docs/kernels.md ("Train-step roofline").

All big pytrees (params / train state / batch) are threaded as jit
ARGUMENTS: a scan body that closes over the 212M-param tree embeds it
as compile-payload constants and breaks the tunnel's remote-compile
(CLAUDE.md; measured here as a broken-pipe at the first compile).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
N = 16


def timed_scan(fn, carry, label, fetch, *args):
    """Scan fn N times inside one jit; big operands ride as arguments."""

    @jax.jit
    def run(carry, *args):
        def body(c, i):
            return fn(c, i, *args)

        return jax.lax.scan(body, carry, jnp.arange(N))

    c, out = run(carry, *args)
    np.asarray(fetch(c, out))  # compile + warm
    t0 = time.perf_counter()
    c, out = run(carry, *args)
    val = np.asarray(fetch(c, out))
    dt = (time.perf_counter() - t0) * 1e3 / N
    assert np.isfinite(val).all(), label
    print(f"{label:11s}: {dt:7.2f} ms/iter", flush=True)
    return dt


def main():
    from rgqa_tpu.config import ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.train import bert_adam, create_train_state, make_train_step
    from rgqa_tpu.train.losses import bce_answer_loss
    from rgqa_tpu.train.step import global_norm_clip, rp_augment

    cfg = ModelConfig(backbone="lxmert")
    model, forward = build_model(cfg, use_bf16=True)
    host = example_batch(cfg, batch_size=BATCH, seed=0, with_target=True)
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2], batch["input_mask"][:2],
        batch["segment_ids"][:2], batch["feats"][:2], batch["boxes"][:2],
    )["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f} M (f32 master + f32 mu/nu)",
          flush=True)

    key = jax.random.PRNGKey(7)

    def loss_fn(p, b, rng, deterministic):
        drop_rng, aug_rng = jax.random.split(rng)
        drop_rng = jax.random.wrap_key_data(
            jax.random.bits(drop_rng, (4,), jnp.uint32), impl="rbg"
        )
        b = rp_augment(b, aug_rng)
        out = forward(p, b, deterministic=deterministic,
                      rng=None if deterministic else drop_rng)
        logits = out["logits"].astype(jnp.float32)
        return bce_answer_loss(logits, b["target"])

    # --- forward-only --------------------------------------------------
    def fwd_body(det):
        def body(c, i, p, b):
            rng = jax.random.fold_in(key, i)
            return c + loss_fn(p, b, rng, det), None

        return body

    t_fwd_det = timed_scan(fwd_body(True), jnp.float32(0.0), "fwd_det",
                           lambda c, o: c, params, batch)
    t_fwd = timed_scan(fwd_body(False), jnp.float32(0.0), "fwd",
                       lambda c, o: c, params, batch)

    # --- forward+backward (no optimizer) --------------------------------
    def grad_body(det):
        def body(c, i, p, b):
            rng = jax.random.fold_in(key, i)
            g = jax.grad(loss_fn)(p, b, rng, det)
            # keep every grad live with a full reduction (the clip's norm)
            norm = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                       for x in jax.tree_util.tree_leaves(g))
            return c + norm, None

        return body

    t_grad_det = timed_scan(grad_body(True), jnp.float32(0.0), "grad_det",
                            lambda c, o: c, params, batch)
    t_grad = timed_scan(grad_body(False), jnp.float32(0.0), "grad",
                        lambda c, o: c, params, batch)

    # --- optimizer-only --------------------------------------------------
    tx = bert_adam(1e-5, warmup=0.1, t_total=10_000)
    fake_grads = jax.tree_util.tree_map(
        lambda p: (p.astype(jnp.float32) * 1e-3 + 1e-5), params
    )

    def opt_body(st, i, g):
        g = global_norm_clip(g, 5.0)
        return st.apply_gradients(g), None

    t_opt = timed_scan(
        opt_body, create_train_state(params, tx), "opt",
        lambda c, o: jax.tree_util.tree_leaves(c.params)[0].ravel()[0],
        fake_grads,
    )

    # --- full step -------------------------------------------------------
    step = make_train_step(forward, sample_pair=True, donate=False)

    def full_body(st, i, b):
        st, aux = step(st, b, jax.random.fold_in(key, i))
        return st, aux["loss"]

    t_full = timed_scan(full_body, create_train_state(params, tx), "full",
                        lambda c, o: o, batch)

    # --- bf16-moment probe -------------------------------------------------
    tx16 = bert_adam(1e-5, warmup=0.1, t_total=10_000,
                     moment_dtype=jnp.bfloat16)
    t_full16 = timed_scan(full_body, create_train_state(params, tx16),
                          "full_bf16m", lambda c, o: o, batch)

    print(flush=True)
    print(f"bwd (grad_det - fwd_det)      : {t_grad_det - t_fwd_det:7.2f} ms")
    print(f"dropout fwd (fwd - fwd_det)   : {t_fwd - t_fwd_det:7.2f} ms")
    print(f"dropout u-grad (grad-grad_det): {t_grad - t_grad_det:7.2f} ms")
    print(f"optimizer (full - grad)       : {t_full - t_grad:7.2f} ms")
    print(f"optimizer standalone (opt)    : {t_opt:7.2f} ms")
    print(f"bf16 moments win              : {t_full - t_full16:7.2f} ms")

    # Rough optimizer+clip HBM bound: clip reads+writes g (2 streams),
    # update reads p,m,v,g and writes p,m,v (7) -> 9 f32 param-sized
    # streams.  GB / (TB/s) = ms.
    gb = n_params * 4 * 9 / 1e9
    print(f"optimizer+clip f32 traffic ~{gb:.2f} GB -> ~{gb/0.8:.1f} ms at "
          f"0.8 TB/s HBM; bf16 moments halve 4 of the 9 streams",
          flush=True)


if __name__ == "__main__":
    main()
