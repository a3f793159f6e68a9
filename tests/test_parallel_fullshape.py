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
