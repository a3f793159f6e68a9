"""RGQA-TPU: a TPU-native framework for Realistic Visual Question Answering.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of chihhuiho/RGQA
(ICCV 2023, "Toward Unsupervised Realistic Visual Question Answering"):

- VQA backbones fine-tuned on GQA: LXMERT, UNITER, BUTD, ViLT, and a
  text-only caption matcher (``rgqa_tpu.models``).
- A registry of rejection / OOD scoring strategies: MSP, ODIN, Mahalanobis,
  Energy, MC-dropout, ensembles, coverage and matching scores
  (``rgqa_tpu.scorers``).
- The RGQA dataset format and the AUAF / FF95 / FACC metric suite
  (``rgqa_tpu.metrics``) — prediction JSON is bit-compatible with the
  reference ``compute_accfpr`` CLI.
- Training strategies (vanilla, RP pseudo-UQ, mixup, energy, branched
  confidence, separate detector, resampling/POEM, distillation, adversarial)
  and LXMERT pretraining (``rgqa_tpu.train``).

Design principles (TPU-first, not a port):

- Functional core: flax modules, params as pytrees, typed dataclass configs.
- One shared transformer kernel library instead of four vendored BERT copies;
  adversarial deltas and attention-prob outputs are *arguments*, not forks.
- Fused Pallas kernels for attention / MLP / LayerNorm on the hot path.
- SPMD parallelism via ``jax.sharding.Mesh`` + ``jit`` (data + tensor axes),
  XLA collectives over ICI; no host-side per-batch tokenization.
- Scorers are pure jittable functions; gradient-at-eval scorers (ODIN,
  Mahalanobis) use ``jax.grad`` w.r.t. inputs and stay on device.
"""

__version__ = "0.1.0"
