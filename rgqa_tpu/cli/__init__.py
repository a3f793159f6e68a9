"""Command-line entry points mirroring the reference's script surface.

``python -m rgqa_tpu.cli.train`` / ``python -m rgqa_tpu.cli.evaluate``
accept the reference's flag names (``--train``, ``--test``, ``--llayers``,
``--tau``, ``--scorer``, ...) so ``scripts/``-style recipes port over
(reference ``run/gqa_conf_finetune.bash`` / ``run/gqa_conf_test.bash``).

``RGQA_PLATFORM=cpu`` (optionally ``RGQA_CPU_DEVICES=8``) retargets a CLI
run off the TPU — only ONE process can hold the chip, so smoke runs
alongside a benchmark/training process must take the CPU path.  A plain
``JAX_PLATFORMS`` env var is dead here (jax is imported before user code
by a site hook); this applies the post-import config route instead.
"""

import os as _os

if _os.environ.get("RGQA_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RGQA_PLATFORM"])
    if _os.environ.get("RGQA_CPU_DEVICES"):
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ["RGQA_CPU_DEVICES"])
        )
