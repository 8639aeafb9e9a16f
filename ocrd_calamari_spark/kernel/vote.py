"""Extractor ensemble + voter fusion.

Analogue of the reference's multi-model Calamari ensemble: k checkpoints
loaded from a directory (ocrd_calamari/recognize.py:510-516) and fused by a
voter ∈ {confidence_voter_default_ctc, sequence_voter}
(recognize.py:507-508, :633-635; enum ocrd-tool.json:32-37).

Our "models" are the three content-vs-boilerplate heuristics named in
BASELINE.json north_star: text-density sequential classifier, link-density,
and readability-style tag/structure scoring.  All are pure deterministic
functions of block features — determinism under retries/speculative
execution is a correctness requirement (SURVEY.md §7.3).
"""

from __future__ import annotations

import math

from ocrd_calamari_spark.kernel.segment import Block

# Minimal stopword profiles; lang hint selects the profile — the analogue of
# the MODEL env / checkpoint selection (reference test/test_recognize.py:13).
STOPWORDS = {
    "en": frozenset("the and of to in a is that for it with as was on are".split()),
    "de": frozenset("der die das und ist von zu mit den nicht ein im auf für".split()),
    "fr": frozenset("le la les de des et un une est que pour dans sur au".split()),
}
_DEFAULT_PROFILE = "en"

_CONTENT_TAGS = {"p": 0.70, "article": 0.70, "blockquote": 0.70, "pre": 0.70,
                 "h1": 0.65, "h2": 0.65, "h3": 0.65, "h4": 0.65, "h5": 0.65,
                 "h6": 0.65, "figcaption": 0.60, "summary": 0.60}
_LIST_TAGS = {"li": 0.45, "td": 0.45, "th": 0.45, "dd": 0.45, "dt": 0.45}


def _clamp01(x: float) -> float:
    return 0.0 if x < 0.0 else (1.0 if x > 1.0 else x)


def _sigmoid(x: float) -> float:
    if x < -60.0:
        return 0.0
    if x > 60.0:
        return 1.0
    return 1.0 / (1.0 + math.exp(-x))


# ---------------------------------------------------------------------------
# The three extractor "models"
# ---------------------------------------------------------------------------
def score_density(block: Block, lang: str) -> float:
    """Text-density sequential classifier: chars per descendant tag."""
    visible = block.visible_len()
    density = visible / (1.0 + block.n_tags)
    return round(_sigmoid((density - 20.0) / 15.0), 6)


def score_link_density(block: Block, lang: str) -> float:
    """Link-density: fraction of visible chars inside anchors."""
    visible = block.visible_len()
    if visible == 0:
        return 0.0
    ratio = block.n_link_chars / visible
    return round(_clamp01(1.0 - 1.2 * ratio), 6)


def score_readability(block: Block, lang: str) -> float:
    """Readability-style prior: tag class + punctuation + stopword evidence."""
    base = _CONTENT_TAGS.get(block.tag)
    if base is None:
        base = _LIST_TAGS.get(block.tag, 0.50)
    text = block.raw_text
    n_punct = text.count(".") + text.count("!") + text.count("?")
    punct_bonus = 0.20 * min(1.0, n_punct / 3.0)
    profile = STOPWORDS.get(lang or _DEFAULT_PROFILE, STOPWORDS[_DEFAULT_PROFILE])
    # stop_bonus saturates at 5 hits — early-exit instead of counting all
    # (hot loop: ~3× of round-2 profile; same value for every input)
    hits = 0
    for t in text.lower().split(" "):
        if t and t in profile:
            hits += 1
            if hits == 5:
                break
    stop_bonus = 0.10 * min(1.0, hits / 5.0)
    depth_penalty = 0.02 * max(0, block.depth - 8)
    return round(_clamp01(base + punct_bonus + stop_bonus - depth_penalty), 6)


# Registry ≈ glob("%s/*.ckpt.json" % checkpoint_dir), recognize.py:510-511.
EXTRACTORS = {
    "density": score_density,
    "link_density": score_link_density,
    "readability": score_readability,
}


# ---------------------------------------------------------------------------
# Voters (reference: voter.finalize_sample, recognize.py:633-635)
# ---------------------------------------------------------------------------
def fuse_votes(scores: list[float], voter: str, threshold: float) -> tuple[bool, float]:
    """Fuse k extractor scores → (accept, fused_confidence).

    confidence_voter_default_ctc ≈ confidence-weighted fusion → mean score,
    accept iff mean ≥ threshold.
    sequence_voter ≈ majority vote → accept iff most scores pass the bar;
    confidence is the mean of the majority side.
    """
    if not scores:
        return False, 0.0
    if voter == "sequence_voter":
        ayes = [s for s in scores if s >= threshold]
        nays = [s for s in scores if s < threshold]
        if len(ayes) * 2 > len(scores):
            return True, round(sum(ayes) / len(ayes), 6)
        side = nays if nays else ayes
        return False, round(sum(side) / len(side), 6)
    fused = sum(scores) / len(scores)
    return fused >= threshold, round(fused, 6)


def vote_block(block: Block, lang: str, extractor_names, voter: str,
               threshold: float) -> tuple[bool, float]:
    scores = [EXTRACTORS[name](block, lang) for name in extractor_names]
    return fuse_votes(scores, voter, threshold)
