"""Unit tests for the exact-semantics kernels the reference leaves untested
(SURVEY.md §5.2.1): whitespace ops X1-X3, the _words run-splitter X6, offset
math W2, cutoff+sort F6/O1.  Pure pandas level — no Spark session."""

from ocrd_calamari_spark.kernel.textproc import (
    Position,
    assemble_text,
    drop_double_spaces,
    drop_leading_spaces,
    drop_trailing_spaces,
    glyph_alts,
    normalize_positions,
    sort_chars,
    word_spans,
    words_iter,
)


def P(c, p=0.9, alts=()):
    return Position(chars=((c, p),) + tuple(alts))


def text_of(positions):
    return assemble_text(positions, 0.001)


class TestWhitespaceOps:
    def test_drop_leading(self):
        ps = [P(" "), P(" "), P("a"), P(" "), P("b")]
        assert text_of(drop_leading_spaces(ps, 0.001)) == "a b"

    def test_drop_trailing(self):
        ps = [P("a"), P(" "), P("b"), P(" "), P(" ")]
        assert text_of(drop_trailing_spaces(ps, 0.001)) == "a b"

    def test_drop_double(self):
        ps = [P("a"), P(" "), P(" "), P(" "), P("b"), P(" "), P("c")]
        assert text_of(drop_double_spaces(ps)) == "a b c"

    def test_reference_order_leading_trailing_double(self):
        # exact order from recognize.py:275-279
        ps = [P(" ")] * 2 + [P("x"), P(" "), P(" "), P("y")] + [P(" ")] * 3
        assert text_of(normalize_positions(ps, 0.001)) == "x y"

    def test_all_spaces_collapse_to_empty(self):
        ps = [P(" ")] * 5
        assert text_of(normalize_positions(ps, 0.001)) == ""

    def test_double_space_uses_unfiltered_first_char(self):
        # X3 keys on chars[0] (recognize.py:265), NOT the sorted top-1.
        # Position whose chars[0] is " " but whose highest-prob char is "z":
        odd = Position(chars=((" ", 0.3), ("z", 0.9)))
        ps = [P("a"), odd, odd, P("b")]
        out = drop_double_spaces(ps)
        # X3 treats both odd positions as spaces → collapses to one,
        # but assembly picks the sorted top-1 → "z"
        assert text_of(out) == "azb"

    def test_leading_uses_sorted_top1(self):
        # X1 keys on _sort_chars(p)[0] (recognize.py:254): a position whose
        # chars[0] is " " but top-prob is "z" must NOT be dropped.
        odd = Position(chars=((" ", 0.3), ("z", 0.9)))
        ps = [odd, P("a")]
        assert text_of(drop_leading_spaces(ps, 0.001)) == "za"


class TestSortChars:
    def test_filters_empty_and_cutoff_then_sorts_desc(self):
        p = Position(chars=(("a", 0.2), ("", 0.99), ("b", 0.7), ("c", 0.0005)))
        out = sort_chars(p, 0.001)
        assert [c[0] for c in out] == ["b", "a"]

    def test_glyph_alts_ranked_from_1(self):
        p = Position(chars=(("a", 0.6), ("b", 0.3), ("c", 0.1)))
        alts = glyph_alts(p, 0.001)
        assert [a["index"] for a in alts] == [1, 2, 3]
        assert [a["text"] for a in alts] == ["a", "b", "c"]

    def test_cutoff_drops_alternatives(self):
        p = Position(chars=(("a", 0.9), ("b", 0.05)))
        assert len(glyph_alts(p, 0.1)) == 1


class TestWordsSplitter:
    """X6 _words: run alternation, spaces as words (recognize.py:313-327)."""

    def test_basic(self):
        assert list(words_iter("ab cd")) == ["ab", " ", "cd"]

    def test_multi_space_run_is_one_word(self):
        assert list(words_iter("a   b")) == ["a", "   ", "b"]

    def test_leading_trailing_spaces(self):
        assert list(words_iter(" a ")) == [" ", "a", " "]

    def test_empty_string_yields_empty_word(self):
        # the trailing `yield word` in recognize.py:327
        assert list(words_iter("")) == [""]

    def test_single_word(self):
        assert list(words_iter("abc")) == ["abc"]


class TestWordSpans:
    """W2 offsets + X7 space-word gating (recognize.py:329-398)."""

    def test_offsets_and_emission(self):
        spans = list(word_spans("ab  cd e"))
        assert spans == [(0, 0, 2, "ab"), (1, 4, 6, "cd"), (2, 7, 8, "e")]

    def test_space_runs_advance_offsets_but_emit_nothing(self):
        spans = list(word_spans("   x"))
        assert spans == [(0, 3, 4, "x")]

    def test_empty_text_no_words(self):
        assert list(word_spans("")) == []

    def test_spans_slice_text(self):
        text = "alpha   beta  gamma"
        for _, s, e, w in word_spans(text):
            assert text[s:e] == w

    def test_space_join_reconstructs(self):
        # reference invariant test_recognize.py:106-113: words " "-joined
        # (after normalization there are only single spaces) == text
        text = "a b c d"
        words = [w for _, _, _, w in word_spans(text)]
        assert " ".join(words) == text


class TestReferenceJoinInvariant:
    """≈ test_recognize.py:106-113: word texts ' '-joined reconstruct the
    normalized block text (single internal spaces after X1-X3)."""

    def test_words_space_join_reconstructs_block(self):
        from ocrd_calamari_spark.kernel.fastpath import normalize_block

        for raw in ["  a  b   c ", "hello world", "x", "  one  ",
                    "Tr4ili.ng, punct!  here  "]:
            text, _, _ = normalize_block(raw, 0.9)
            words = [w for _, _, _, w in word_spans(text)]
            assert " ".join(words) == text
