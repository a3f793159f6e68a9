"""Full-shape multichip dry run + multihost init env handling
(SURVEY.md §2.3; VERDICT round-1 item 8)."""

import os
import sys

import pytest


class TestFullShapeMultichip:
    def test_fullshape_train_step_on_8dev_mesh(self):
        """One 9/5/5 x 768 / 1842-answer train step on the virtual
        8-device CPU mesh (data=4, model=2), with TP spec assertions
        (the assertions live inside the entry so the driver-facing code
        path is the thing tested)."""
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        try:
            import __graft_entry__ as g
        finally:
            sys.path.pop(0)
        g.dryrun_multichip_fullshape(8)


class TestInitializeMultihost:
    def test_single_process_is_noop(self, monkeypatch):
        from rgqa_tpu.parallel.distributed import initialize_multihost

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        called = {}
        import jax

        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: called.setdefault("kw", kw),
        )
        initialize_multihost()  # no coordinator anywhere -> no-op
        assert "kw" not in called
        initialize_multihost(num_processes=1)
        assert "kw" not in called

    def test_explicit_args_forwarded(self, monkeypatch):
        from rgqa_tpu.parallel.distributed import initialize_multihost

        called = {}
        import jax

        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: called.setdefault("kw", kw),
        )
        initialize_multihost(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
        )
        assert called["kw"] == {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }

    def test_env_coordinator_triggers_init(self, monkeypatch):
        from rgqa_tpu.parallel.distributed import initialize_multihost

        called = {}
        import jax

        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: called.setdefault("kw", kw),
        )
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:9999")
        initialize_multihost()
        assert called["kw"] == {
            "coordinator_address": None,
            "num_processes": None,
            "process_id": None,
        }

    def test_global_mesh_rejects_cross_dcn_tp(self, monkeypatch):
        import jax

        from rgqa_tpu.parallel.distributed import global_mesh

        monkeypatch.setattr(jax, "local_device_count", lambda: 3)
        with pytest.raises(ValueError, match="must divide local device"):
            global_mesh(model=2)


class TestTwoProcessDistributed:
    @pytest.mark.slow
    def test_two_process_cpu_psum(self, tmp_path):
        """Real jax.distributed bring-up: two local CPU processes join via
        initialize_multihost(coordinator, 2, pid), build the global mesh,
        and psum across processes (SURVEY §2.3 multi-host path)."""
        import socket
        import subprocess
        import sys
        import textwrap

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        prog = textwrap.dedent(
            """
            import sys
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 2)
            from rgqa_tpu.parallel.distributed import (
                global_mesh, initialize_multihost,
            )
            pid = int(sys.argv[1])
            initialize_multihost(
                coordinator_address="127.0.0.1:%d",
                num_processes=2, process_id=pid,
            )
            assert jax.process_count() == 2, jax.process_count()
            assert jax.device_count() == 4, jax.device_count()
            mesh = global_mesh(model=1)
            assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
                "data": 4, "model": 1,
            }
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P

            @jax.jit
            def total(x):
                return jax.lax.with_sharding_constraint(
                    jnp.sum(x) * jnp.ones(()), NamedSharding(mesh, P())
                )

            # global array: each process contributes its local shard
            local = jnp.full((2, 4), float(pid + 1))  # 2 shards/process
            garr = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), local, (4, 4)
            )
            out = float(total(garr))
            assert out == (1.0 + 2.0) * 2 * 4, out  # 2 shards each per proc
            print("OK", pid, out)
            """ % port
        )
        env = dict(
            __import__("os").environ,
            RGQA_TEST_TPU="",
            JAX_PLATFORMS="",
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", prog, str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
            assert "OK" in out

    @pytest.mark.slow
    def test_two_process_train_step_and_orbax(self, tmp_path):
        """One real ``make_train_step`` across two processes — gradient
        sync over the data axis with per-process local data — then a
        collective orbax save + restore (VERDICT round-2 item 4).  The
        worker lives in ``tests/twoproc_train_worker.py``."""
        import re
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = os.path.join(os.path.dirname(__file__), "twoproc_train_worker.py")
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(
            os.environ, RGQA_TEST_TPU="", JAX_PLATFORMS="",
            # script-file invocation puts tests/ on sys.path, not the repo
            PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs = [
            subprocess.Popen(
                [
                    sys.executable, worker, str(pid),
                    "127.0.0.1:%d" % port, str(tmp_path),
                ],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
            for pid in (0, 1)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        norms = []
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
            assert "OK" in out, out[-3000:]
            norms.append(re.search(r"PNORM (\S+)", out).group(1))
        # identical post-step param norm on both processes == synced grads
        assert norms[0] == norms[1], norms


class TestMeshInvariantScoring:
    """The prediction JSON is the framework's public contract; its
    content must be invariant to the device-mesh shape (SURVEY §2.3:
    predictions collect over the data axis).  Train once, then score the
    same split on 1x1, 8x1 and 4x2 meshes and require byte-identical
    dumps — composed with --eval_chunk and --feed_int8."""

    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        import dataclasses

        from rgqa_tpu.config import (
            DataConfig, EncoderConfig, ModelConfig, OODConfig, OptimConfig,
            RunConfig, TrainConfig,
        )
        from rgqa_tpu.data import SyntheticSpec, make_synthetic_gqa
        from rgqa_tpu.runner import GQARunner

        root = str(tmp_path_factory.mktemp("mesh_inv_data"))
        make_synthetic_gqa(
            root,
            SyntheticSpec(
                n_images=16, n_train=64, n_valid=16, n_testdev=48,
                num_boxes=6, feat_dim=64,
            ),
        )
        enc = EncoderConfig(
            hidden_size=32, num_heads=4, intermediate_size=64,
            l_layers=1, x_layers=1, r_layers=1, num_objects=6,
            visual_feat_dim=64,
        )
        out = str(tmp_path_factory.mktemp("mesh_inv_snap"))
        cfg = RunConfig(
            model=ModelConfig(backbone="lxmert", encoder=enc, max_text_len=10),
            train=TrainConfig(
                batch_size=16, epochs=2, optim=OptimConfig(lr=3e-3),
                use_bf16=False,
            ),
            ood=OODConfig(scorer="msp", target_acc=0.15),
            data=DataConfig(data_root=root, test_splits="testdev",
                            synthetic=True),
            output=out,
        )
        GQARunner(cfg).train()
        return dataclasses.replace(
            cfg, load=os.path.join(out, "LAST")
        ), root

    def _score_on_mesh(self, cfg, root, mesh_shape, out_dir,
                       eval_chunk=1, feed_int8=False):
        """(data, model) mesh -> (metrics, ood dump bytes, thresh dump
        bytes, tau)."""
        import dataclasses

        import jax

        from rgqa_tpu.data import GQADataset
        from rgqa_tpu.parallel import make_mesh, shard_params
        from rgqa_tpu.runner import GQARunner

        data_ax, model_ax = mesh_shape
        cfg = dataclasses.replace(
            cfg,
            output=out_dir,
            train=dataclasses.replace(cfg.train, eval_chunk=eval_chunk),
            data=dataclasses.replace(cfg.data, feed_int8=feed_int8),
        )
        runner = GQARunner(cfg, init_train=False)
        devices = jax.devices()[: data_ax * model_ax]
        runner.mesh = make_mesh(devices, model=model_ax)
        runner.params = shard_params(runner.mesh, runner.params)
        encoded = runner._encode(GQADataset(root, "testdev", add_uq=True))
        os.makedirs(out_dir, exist_ok=True)
        dump = os.path.join(out_dir, "ood_predict.json")
        metrics = runner.ood_evaluate(encoded, dump=dump)
        with open(dump, "rb") as f:
            ood_bytes = f.read()
        tdump = os.path.join(out_dir, "thresh_predict.json")
        thresh = runner.predict_with_thresh(encoded, dump=tdump)
        with open(tdump, "rb") as f:
            thresh_bytes = f.read()
        return metrics, ood_bytes, thresh_bytes, thresh["tau"]

    def test_prediction_json_identical_across_meshes(self, trained, tmp_path):
        cfg, root = trained
        base = None
        for shape in ((1, 1), (8, 1), (4, 2)):
            got = self._score_on_mesh(
                cfg, root, shape, str(tmp_path / f"m{shape[0]}x{shape[1]}")
            )
            if base is None:
                base = got
                continue
            assert got[0] == base[0], f"metrics differ on {shape}"
            assert got[1] == base[1], f"ood dump differs on {shape}"
            assert got[2] == base[2], f"thresh dump differs on {shape}"
            # tau interpolates RAW scores, which carry ~1-ulp
            # program-dependent drift across mesh shapes.
            assert abs(got[3] - base[3]) < 1e-5, f"tau differs on {shape}"

    def test_invariance_composes_with_chunk_and_int8(self, trained, tmp_path):
        cfg, root = trained
        a = self._score_on_mesh(
            cfg, root, (8, 1), str(tmp_path / "a"), eval_chunk=3,
            feed_int8=True,
        )
        b = self._score_on_mesh(
            cfg, root, (4, 2), str(tmp_path / "b"), eval_chunk=3,
            feed_int8=True,
        )
        c = self._score_on_mesh(
            cfg, root, (1, 1), str(tmp_path / "c"), eval_chunk=3,
            feed_int8=True,
        )
        assert a[1] == b[1] == c[1]
        assert a[2] == b[2] == c[2]
        assert a[0] == b[0] == c[0]
