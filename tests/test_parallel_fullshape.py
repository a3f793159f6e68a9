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
