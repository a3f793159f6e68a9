"""Faster-RCNN object-coverage rejection scorer (host-side).

Rebuild of ``src/tasks/gqa_fasterrcnn.py:97-126``: score = 1 iff every
question noun (minus a stop list) stem-matches a detected object's name.
The answer still comes from a VQA backbone; only the confidence is binary
coverage.

NLP stack: the reference needs spacy (``en_core_web_sm``) for POS tags and
NLTK's PorterStemmer.  spacy isn't installable here (zero egress), so noun
detection uses NLTK's tagger when its data is present and otherwise a
lexicon-free heuristic (non-stopword tokens that aren't question/aux/verb
words) — the right fidelity/dependency trade-off for coverage scoring,
where recall of content words is what matters.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

__all__ = ["load_object_vocab", "noun_tokens", "coverage_scores", "NOUN_STOPLIST"]

NOUN_STOPLIST = {
    "left", "right", "thing", "top", "bottom", "photo", "image", "kind", "color",
}

# Function words that are never the content nouns of a GQA question.
_NON_NOUNS = {
    "a", "an", "the", "is", "are", "was", "were", "there", "this", "that",
    "these", "those", "what", "which", "who", "whom", "whose", "where",
    "when", "why", "how", "do", "does", "did", "can", "could", "on", "in",
    "at", "of", "to", "by", "with", "near", "next", "behind", "front",
    "above", "below", "under", "over", "and", "or", "not", "no", "yes",
    "any", "some", "you", "it", "its", "his", "her", "their", "same",
    "different", "both", "either", "made", "see", "seen", "have", "has",
    "think", "look", "looks", "looking", "called", "wearing", "holding",
    "sitting", "standing", "side", "part", "beside", "inside", "around",
    "out", "toward", "towards",
}

# GQA's closed adjective classes (colors / sizes / materials / common
# states).  A spacy NOUN tag would exclude these; the lexicon-free
# heuristic must too, or "blue chair" demands a detected object "blue"
# and coverage falsely rejects (measured on the golden example's real
# questions in tests/test_fidelity.py).
_COMMON_ADJECTIVES = {
    # colors
    "red", "blue", "green", "yellow", "orange", "purple", "pink", "brown",
    "black", "white", "gray", "grey", "silver", "gold", "golden", "dark",
    "light", "blond", "blonde", "beige", "tan", "cream", "maroon", "teal",
    # sizes / shapes
    "big", "small", "large", "little", "tall", "short", "long", "huge",
    "tiny", "wide", "narrow", "thick", "thin", "round", "square",
    "rectangular", "giant",
    # materials
    "wooden", "metal", "metallic", "plastic", "glass", "leather", "stone",
    "concrete", "brick", "wood", "steel", "cloth", "ceramic", "chrome",
    "cobblestone", "wicker", "porcelain", "rubber", "denim", "wool",
    # common states
    "old", "new", "young", "clean", "dirty", "empty", "full", "open",
    "closed", "wet", "dry", "bright", "shiny", "dull", "colorful", "comfy",
    "comfortable", "happy", "sad", "male", "female", "striped", "spotted",
    "parked", "modern", "electric", "electrical", "soft", "hard", "heavy",
    "fresh", "healthy", "cooked", "raw", "sliced",
}


def _porter():
    from nltk.stem import PorterStemmer

    return PorterStemmer()


def load_object_vocab(path: str) -> list[str]:
    """Detected-object class names, stemmed (``objects_vocab.txt`` rows are
    ``name[,alias...]``; the reference keeps the first name)."""
    ps = _porter()
    out = []
    with open(path) as f:
        for line in f:
            name = line.strip().split(",")[0]
            if name:
                out.append(ps.stem(name))
    return out


def _nltk_nouns(sent: str) -> list[str] | None:
    """NOUN tokens via NLTK's perceptron tagger, or None if data missing."""
    try:
        import nltk

        tokens = sent.replace("?", " ").replace(",", " ").split()
        tagged = nltk.pos_tag(tokens)
    except Exception:
        return None
    return [w for w, tag in tagged if tag.startswith("NN")]


def noun_tokens(sent: str) -> list[str]:
    """Content-noun candidates of a question, stop-list applied."""
    nouns = _nltk_nouns(sent)
    if nouns is None:
        toks = sent.lower().replace("?", " ").replace(",", " ").split()
        nouns = [
            t for t in toks
            if t.isalpha()
            and t not in _NON_NOUNS
            and t not in _COMMON_ADJECTIVES
            and len(t) > 2
        ]
    return [n for n in nouns if n.lower() not in NOUN_STOPLIST]


def coverage_scores(
    sents: Sequence[str],
    objects_per_row: Sequence[Iterable[int]],
    object_vocab: Sequence[str],
) -> np.ndarray:
    """score[i] = 1.0 iff every noun stem of sents[i] is among the stems of
    the detected objects (``gqa_fasterrcnn.py:118-126``)."""
    ps = _porter()
    out = np.zeros((len(sents),), np.float32)
    for i, (sent, obj_ids) in enumerate(zip(sents, objects_per_row)):
        detected = {object_vocab[int(o)] for o in obj_ids if 0 <= int(o) < len(object_vocab)}
        stems = [ps.stem(tok) for tok in noun_tokens(sent)]
        out[i] = 1.0 if all(s in detected for s in stems) else 0.0
    return out
