"""CLI entry points, in-process (train -> evaluate -> metrics round-trip)."""

import json
import os

import numpy as np
import pytest


FLAGS = (
    "--synthetic --fp32 --llayers 1 --xlayers 1 --rlayers 1 "
    "--hidden_size 32 --num_heads 4 --batchSize 16"
).split()


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("cli_data"))
    snap = str(tmp_path_factory.mktemp("cli_snap"))
    return data, snap


class TestCliPipeline:
    def test_train_then_evaluate_then_metrics(self, roots):
        data, snap = roots
        from rgqa_tpu.cli import evaluate, train

        train.main(
            FLAGS + ["--data_root", data, "--epochs", "2", "--lr", "3e-3",
                     "--output", snap]
        )
        assert os.path.isdir(os.path.join(snap, "LAST"))

        results = evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "msp", "--output", snap]
        )
        assert "auaf" in results["testdev"]
        pred_path = os.path.join(snap, "testdev_predict.json")
        assert os.path.exists(pred_path)

        # Round-trip the dumped predictions through the metrics CLI module.
        from rgqa_tpu.metrics.compute_accfpr import main as metrics_main

        metrics = metrics_main([os.path.join(data, "testdev.json"), pred_path])
        assert abs(metrics["full_acc"] - results["testdev"]["full_acc"]) < 0.05

    def test_energy_scorer_cli(self, roots):
        data, snap = roots
        from rgqa_tpu.cli import evaluate

        results = evaluate.main(
            FLAGS + ["--data_root", data, "--test", "testdev",
                     "--load", os.path.join(snap, "LAST"),
                     "--scorer", "energy", "--output", snap]
        )
        assert np.isfinite(results["testdev"]["auaf"])

    def test_compute_param_cli_tiny(self):
        from rgqa_tpu.cli.compute_param import count_params

        assert count_params("caps") > 1e6
