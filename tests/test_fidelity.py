"""Fidelity of the host-side NLP stand-ins, measured on REAL GQA data.

The reference relies on benepar constituency parses (POSTree statement
templates, ``src/POSTree.py``) and spacy NOUN tags (FRCNN coverage,
``src/tasks/gqa_fasterrcnn.py:97-126``) — neither installable here.  The
stand-ins are rule-based; these tests pin their fidelity against the
11,158 real GQA questions shipped in the reference's golden example
(``compute_accfpr/example.json``) rather than synthetic templates.
"""

import collections
import json
import os

import pytest

from rgqa_tpu.scorers.coverage import noun_tokens
from rgqa_tpu.verifier import fill_statement, statement_with_rule

EXAMPLE = "/root/reference/compute_accfpr/example.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="reference golden example absent"
)


@pytest.fixture(scope="module")
def real_questions():
    with open(EXAMPLE) as f:
        return [r["sent"] for r in json.load(f)]


class TestVerifierTemplates:
    def test_rule_coverage_on_real_distribution(self, real_questions):
        """>= 99% of real GQA questions must hit a dedicated rule (not the
        word-order-preserving fallback)."""
        rules = collections.Counter(
            statement_with_rule(s)[1] for s in real_questions
        )
        coverage = 1.0 - rules["fallback"] / len(real_questions)
        assert coverage >= 0.99, (coverage, rules.most_common())

    def test_statement_invariants(self, real_questions):
        """Every filled statement: no '?', no unfilled blank, and no
        leading wh-word outside the fallback bucket."""
        wh = {"what", "which", "who", "where", "when", "why", "how"}
        for s in real_questions:
            template, rule = statement_with_rule(s)
            filled = fill_statement(template, "x")
            assert "?" not in filled, (s, filled)
            assert "**blank**" not in filled, (s, filled)
            assert template.count("**blank**") == 1, (s, template)
            if rule != "fallback":
                assert filled.split()[0] not in wh, (s, rule, filled)

    def test_known_transforms(self):
        cases = {
            "What color is the street?":
                "the color of the street is **blank**",
            "How many dogs are there?": "there are **blank** dogs are there",
            "Is the blue chair on the left side?":
                "the blue chair on the left side , **blank**",
            "What's the animal called?": "the animal is called **blank**",
            "How big is the house?": "the house is **blank**",
            "The vase holds what?": "the vase holds **blank**",
            "The trash bin on the beach is of which color?":
                "the trash bin on the beach is of **blank** color",
            "On which side is the knife?":
                "the knife is on the **blank** side",
        }
        for q, expect in cases.items():
            got, rule = statement_with_rule(q)
            assert got == expect, (q, got, rule)


# Hand-labeled content nouns for real GQA questions (from the golden
# example).  `required` nouns must be detected (coverage recall — a miss
# means the scorer never demands that object); `forbidden` tokens must
# not be (precision — an adjective/verb in the list makes coverage
# falsely reject images without a detection of that name).
NOUN_GOLD = [
    ("Are the pens next to the cat small and colorful?",
     {"pens", "cat"}, {"small", "colorful", "next", "and"}),
    ("Is the skier that is not female wearing gloves?",
     {"skier", "gloves"}, {"female", "wearing", "not"}),
    ("Is the large shower dirty or clean?",
     {"shower"}, {"large", "dirty", "clean"}),
    ("Is the blue chair on the left side?",
     {"chair"}, {"blue", "left", "side"}),
    ("What color is the street?", {"street"}, {"color", "what"}),
    ("How big is the house?", {"house"}, {"big", "how"}),
    ("Is the man that is to the right of the boy standing beside a motorcycle?",
     {"man", "boy", "motorcycle"}, {"right", "standing", "beside"}),
    ("Are the fence and the sign made of the same material?",
     {"fence", "sign"}, {"made", "same"}),
    ("Is the woman holding a red umbrella?",
     {"woman", "umbrella"}, {"holding", "red"}),
    ("Does the wooden table look old?",
     {"table"}, {"wooden", "old", "look"}),
    ("Is there a clean white plate on the table?",
     {"plate", "table"}, {"clean", "white", "there"}),
    ("Are the zebras in front of the brush looking toward the trees?",
     {"zebras", "trees"}, {"front", "looking", "toward"}),
]


class TestCoverageNouns:
    def test_required_nouns_detected(self):
        missed = []
        for sent, required, _ in NOUN_GOLD:
            got = {n.lower() for n in noun_tokens(sent)}
            missed += [(sent, n) for n in required if n not in got]
        # Full recall on the gold set: a missed noun silently weakens the
        # coverage criterion.
        assert not missed, missed

    def test_forbidden_tokens_excluded(self):
        leaked = []
        for sent, _, forbidden in NOUN_GOLD:
            got = {n.lower() for n in noun_tokens(sent)}
            leaked += [(sent, t) for t in forbidden if t in got]
        assert not leaked, leaked

    def test_real_distribution_noun_rate(self, real_questions):
        """Sanity bound over all 11k real questions: the heuristic should
        produce 1-4 content nouns for the vast majority (0 nouns = the
        scorer always accepts; >6 = it always rejects)."""
        counts = [len(noun_tokens(s)) for s in real_questions]
        in_range = sum(1 <= c <= 4 for c in counts) / len(counts)
        assert in_range >= 0.85, in_range
        assert sum(c == 0 for c in counts) / len(counts) <= 0.02
