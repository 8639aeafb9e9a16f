"""Kernel fuzzing: extract_page must NEVER raise — any bytes payload yields
either a valid row (all span invariants hold) or an error row (ignore_errors
semantics, reference recognize.py:606-609).  This is the per-row safety
property that protects 128 MB scan splits from single poisoned documents."""

from hypothesis import given, settings, strategies as st

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.kernel.extract import extract_page

CFG = ExtractConfig(textequiv_level="word")


def check_row(row):
    if row["error"] is not None:
        assert row["text"] is None and row["blocks"] is None
        return
    text = row["text"]
    assert "\n".join(b["text"] for b in row["blocks"]) == text
    for b in row["blocks"]:
        assert text[b["start"]:b["end"]] == b["text"]
        assert b["text"] == b["text"].strip(" ")
        assert "  " not in b["text"]
    for w in row["words"]:
        assert text[w["start"]:w["end"]] == w["text"]


@settings(max_examples=300, deadline=None)
@given(payload=st.binary(min_size=0, max_size=2048))
def test_arbitrary_bytes_never_raise(payload):
    check_row(extract_page("u", payload, None, "en", CFG))


@settings(max_examples=300, deadline=None)
@given(
    frag=st.text(
        alphabet="<>/ab p&;\"'=!-\x00é\n", min_size=0, max_size=300
    ),
    lang=st.sampled_from(["en", "de", "fr", None, "xx"]),
)
def test_tag_soup_never_raises(frag, lang):
    payload = f"<html><body>{frag}</body></html>".encode("utf-8", "replace")
    check_row(extract_page("u", payload, None, lang, CFG))


@settings(max_examples=100, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=512),
    level=st.sampled_from(["block", "word", "glyph"]),
    cutoff=st.floats(min_value=0.0, max_value=0.49),
    voter=st.sampled_from(["confidence_voter_default_ctc", "sequence_voter"]),
)
def test_all_configs_never_raise(payload, level, cutoff, voter):
    cfg = ExtractConfig(textequiv_level=level, glyph_conf_cutoff=cutoff,
                        voter=voter)
    row = extract_page("u", payload, "prior", "de", cfg)
    assert row["overwrote"] is True
    if row["error"] is None and level == "block":
        assert row["words"] == [] and row["glyphs"] == []
