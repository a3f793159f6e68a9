"""Rejection / OOD scorer registry.

Pure-function rebuild of the reference's one-driver-per-strategy scoring
(``src/tasks/gqa_{conf,odin,maha,energy,dropout,branched,ensemble,
fasterrcnn,...}.py``): every scorer is ``score_fn(params, batch) ->
{"label", "score"}`` built from a backbone's uniform forward adapter, and
the jittable ones stay entirely on device — including the gradient-at-eval
ODIN and Mahalanobis scorers.

Host-side scorers (FRCNN object coverage; caption/CLIP matching against
auxiliary models) live in their own modules and plug into the same
evaluation loop through the score arrays they produce.
"""

from rgqa_tpu.scorers.core import (
    ensemble_merge,
    make_branched_scorer,
    make_dropout_scorer,
    make_energy_scorer,
    make_match_scorer,
    make_msp_scorer,
    make_odin_scorer,
)
from rgqa_tpu.scorers.maha import MahaEstimator, fit_estimator, make_maha_scorer
from rgqa_tpu.scorers.coverage import (
    NOUN_STOPLIST,
    coverage_scores,
    load_object_vocab,
    noun_tokens,
)
from rgqa_tpu.scorers.calibrate import apply_tau, calibrate_tau

__all__ = [
    "make_msp_scorer",
    "make_energy_scorer",
    "make_odin_scorer",
    "make_dropout_scorer",
    "make_branched_scorer",
    "make_match_scorer",
    "ensemble_merge",
    "MahaEstimator",
    "fit_estimator",
    "make_maha_scorer",
    "coverage_scores",
    "load_object_vocab",
    "noun_tokens",
    "NOUN_STOPLIST",
    "calibrate_tau",
    "apply_tau",
    "make_scorer",
]


def make_scorer(name: str, forward, **opts):
    """Build a jittable scorer by name (the ``--scorer`` flag)."""
    name = name.lower()
    if name == "msp":
        return make_msp_scorer(forward)
    if name == "energy":
        return make_energy_scorer(forward, topk=opts.get("topk", 2))
    if name == "odin":
        return make_odin_scorer(
            forward,
            temperature=opts.get("temperature", 1e5),
            noise=opts.get("noise", 1e-4),
        )
    if name == "dropout":
        return make_dropout_scorer(forward, opts.get("seed_list", (0, 1, 2, 3, 4)))
    if name == "branched":
        return make_branched_scorer(forward, mix=opts.get("mix", False))
    if name == "maha":
        return make_maha_scorer(
            forward, opts["estimator"], noise=opts.get("noise", 0.0)
        )
    raise ValueError(f"unknown scorer {name!r}")
