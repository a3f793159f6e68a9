"""Command-line entry points mirroring the reference's script surface.

``python -m rgqa_tpu.cli.train`` / ``python -m rgqa_tpu.cli.evaluate``
accept the reference's flag names (``--train``, ``--test``, ``--llayers``,
``--tau``, ``--scorer``, ...) so ``scripts/``-style recipes port over
(reference ``run/gqa_conf_finetune.bash`` / ``run/gqa_conf_test.bash``).
"""
