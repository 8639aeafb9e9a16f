"""Position-level text post-processing — the byte-identity surface.

Faithful re-expression of the reference's ``_post_process_line``
(ocrd_calamari/recognize.py:225-398).  The reference post-processes the
prediction *positions* (not the assembled sentence) so text and spans stay
consistent (rationale comment recognize.py:228-235); we do the same.

Exact semantics preserved (SURVEY.md §7.3 hard-part #1):

  X1 _drop_leading_spaces   keyed on the *sorted/filtered* top-1 char
                            (recognize.py:251-256)
  X2 _drop_trailing_spaces  reverse → X1 → reverse (recognize.py:258-259)
  X3 _drop_double_spaces    keyed on the *unfiltered* first char
                            ``p.chars[0]`` — deliberately NOT _sort_chars
                            (recognize.py:261-273 vs :254)
  X4 text assembly          "".join of sorted top-1 chars (recognize.py:281)
  X6 _words                 run-alternation splitter; space-runs are words
                            too; trailing ``yield word`` emits the final
                            token, and "" for empty input
                            (recognize.py:313-327)
  X7 space-words            advance offsets but emit nothing
                            (recognize.py:335, :398)
  W1 ranked alternatives    desc probability, index from 1
                            (recognize.py:248, :379-391)
  F5/F6 char filters        drop empty chars, drop prob < cutoff
                            (recognize.py:240-247)

Divergence (documented): the reference's global_start/global_end are pixel
offsets into the line image, turned into polygons (recognize.py:340-345).
Per BASELINE.json north_star the analogue is *character offsets into the
extracted text*, so spans here index the final normalized text (geometry X8
→ integer offsets, SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import NamedTuple


class Position(NamedTuple):
    """One character position with ranked alternatives.

    ``chars`` is a list of (char, probability); chars[0] is the primary
    hypothesis (≈ the CTC top emission before sorting).
    """

    chars: tuple  # tuple of (str, float)


def sort_chars(p: Position, cutoff: float) -> list:
    """Filter + sort a position's alternatives (recognize.py:237-249).

    Order matters: drop empty chars, drop below-cutoff probs, then sort
    descending by probability (stable, like Python's sorted in the ref).
    """
    chars = [c for c in p.chars if c[0]]
    chars = [c for c in chars if c[1] >= cutoff]
    chars.sort(key=lambda c: c[1], reverse=True)
    return chars


def top1(p: Position, cutoff: float) -> str:
    return sort_chars(p, cutoff)[0][0]


def drop_leading_spaces(positions: list, cutoff: float) -> list:
    i = 0
    while i < len(positions) and top1(positions[i], cutoff) == " ":
        i += 1
    return positions[i:]


def drop_trailing_spaces(positions: list, cutoff: float) -> list:
    return list(reversed(drop_leading_spaces(list(reversed(positions)), cutoff)))


def drop_double_spaces(positions: list) -> list:
    """Collapse space runs — keyed on the UNFILTERED first char
    (recognize.py:265: ``p.chars[0].char``, not ``_sort_chars(p)[0]``)."""
    out = []
    last_was_space = False
    for p in positions:
        if p.chars[0][0] == " ":
            if not last_was_space:
                out.append(p)
            last_was_space = True
        else:
            out.append(p)
            last_was_space = False
    return out


def normalize_positions(positions: list, cutoff: float) -> list:
    """Apply X1 → X2 → X3 in the reference's exact order
    (recognize.py:275-279: leading, trailing, double)."""
    positions = drop_leading_spaces(positions, cutoff)
    positions = drop_trailing_spaces(positions, cutoff)
    positions = drop_double_spaces(positions)
    return positions


def assemble_text(positions: list, cutoff: float) -> str:
    """X4: line text = concat of sorted top-1 chars (recognize.py:281)."""
    return "".join(top1(p, cutoff) for p in positions)


def words_iter(s: str):
    """X6: split into alternating space/non-space runs; spaces are words too
    (recognize.py:313-327, incl. the trailing ``yield word`` that emits ""
    for empty input)."""
    spaces = None
    word = ""
    for c in s:
        if c == " " and spaces is True:
            word += c
        elif c != " " and spaces is False:
            word += c
        else:
            if word:
                yield word
            word = c
            spaces = c == " "
    yield word


def word_spans(block_text: str):
    """W2: running char offsets per emitted word (recognize.py:329-398).

    Yields (word_no, start, end, word_text) with offsets local to the block
    text.  Space-runs advance the cursor but emit nothing (X7,
    recognize.py:335); word_no increments only on emission
    (recognize.py:396).
    """
    word_no = 0
    i = 0
    for word_text in words_iter(block_text):
        word_length = len(word_text)
        if not all(c == " " for c in word_text):
            yield word_no, i, i + word_length, word_text
            word_no += 1
        i += word_length


def glyph_alts(p: Position, cutoff: float) -> list:
    """W1/F5/F6: ranked alternatives for one glyph — filtered, sorted desc,
    index starting at 1 (recognize.py:379-391)."""
    return [
        {"text": c[0], "conf": c[1], "index": idx}
        for idx, c in enumerate(sort_chars(p, cutoff), start=1)
    ]
