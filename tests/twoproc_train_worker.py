"""Worker for the two-process distributed train-step test.

Run as ``python twoproc_train_worker.py <pid> <coordinator> <ckpt_dir>``
by ``tests/test_parallel_fullshape.py::TestTwoProcessDistributed``.

Each process holds 2 CPU devices; the two join a jax.distributed cluster,
build the global ``(data=4, model=1)`` mesh, and run ONE real
``make_train_step`` on a global batch whose local halves differ per
process — so identical post-step parameters prove the gradient
all-reduce crossed the process boundary (SURVEY §2.3 DCN path).  Then
both processes collectively orbax-save the stepped state and restore it,
asserting parameter equality.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402


def main(pid: int, coordinator: str, ckpt_dir: str) -> None:
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rgqa_tpu.checkpoint.orbax_io import load_checkpoint, save_checkpoint
    from rgqa_tpu.config import EncoderConfig, ModelConfig
    from rgqa_tpu.models.zoo import build_model, example_batch
    from rgqa_tpu.parallel import shard_params
    from rgqa_tpu.parallel.distributed import global_mesh, initialize_multihost
    from rgqa_tpu.train import bert_adam, create_train_state, make_train_step

    initialize_multihost(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    mesh = global_mesh(model=1)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 1,
    }

    enc = EncoderConfig(
        hidden_size=64, num_heads=4, intermediate_size=128, vocab_size=512,
        l_layers=2, x_layers=1, r_layers=1, num_objects=8, visual_feat_dim=32,
    )
    cfg = ModelConfig(
        backbone="lxmert", encoder=enc, num_answers=16, max_text_len=8
    )
    model, forward = build_model(cfg)

    # Same seed everywhere -> identical initial params on both processes.
    init = example_batch(cfg, batch_size=2, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(init["input_ids"]),
        jnp.asarray(init["input_mask"]),
        jnp.asarray(init["segment_ids"]),
        jnp.asarray(init["feats"]),
        jnp.asarray(init["boxes"]),
    )["params"]
    params = shard_params(mesh, params)

    state = create_train_state(params, bert_adam(1e-3, warmup=0.1, t_total=10))
    step = make_train_step(forward, loss="bce", sample_pair=True)

    # DIFFERENT local data per process: the global batch's first half
    # comes from process 0, second from process 1.
    local = example_batch(cfg, batch_size=4, seed=100 + pid, with_target=True)
    data_sh = NamedSharding(mesh, P("data"))
    gbatch = {
        k: jax.make_array_from_process_local_data(
            data_sh, np.asarray(v), (8,) + v.shape[1:]
        )
        for k, v in local.items()
    }

    state, aux = step(state, gbatch, jax.random.PRNGKey(1))
    loss = float(aux["loss"])
    assert np.isfinite(loss), loss

    # Replicated params are fully addressable on every process: a fetched
    # global norm equal across processes == the grads were synced.
    sq = sum(
        float(jnp.sum(jnp.square(x.astype(jnp.float32))))
        for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"PNORM {np.sqrt(sq):.10f}")

    # Collective orbax save + restore (all processes participate).
    save_checkpoint(ckpt_dir, "TWOPROC", state)
    restored = load_checkpoint(ckpt_dir, "TWOPROC", template=state)
    assert int(restored["step"]) == 1, restored["step"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            jax.device_get(a), jax.device_get(b)
        ),
        state.params,
        restored["params"],
    )
    print("OK", pid, f"{loss:.6f}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
