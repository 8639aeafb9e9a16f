"""The anchor_text / extract_links queries parse anchors with a regex
(JVM-side, RE2-compatible).  This pins the regex's semantics against the
stdlib HTMLParser on the class of HTML it is specified for — documents
whose anchors are simple (no nested tags inside <a>, attribute values
double-quoted, href first).  The fixture generator only emits that class;
this test is the documented boundary of the regex's validity, mirroring
how test_segment_equiv.py bounds the segmenter fast path.

No Spark needed: the assertion is about the PATTERN, which is identical
in the Spark expression, the DuckDB oracle, and Python's `re`.
"""

import re
from html.parser import HTMLParser

ANCHOR_RE = re.compile(r'<a href="([^"]*)"[^>]*>([^<]*)</a>')


class _AnchorCollector(HTMLParser):
    def __init__(self):
        super().__init__()
        self.anchors = []
        self._href = None
        self._buf = []
        self._simple = True  # no nested tags inside the current <a>

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._href = dict(attrs).get("href")
            self._buf = []
            self._simple = True
        elif self._href is not None:
            self._simple = False

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            if self._simple:
                self.anchors.append((self._href, "".join(self._buf)))
            self._href = None


def _page(body: str) -> str:
    return f"<html><body>{body}</body></html>"


SIMPLE_CASES = [
    '<a href="/x">link text</a>',
    '<a href="/a">one</a> filler <a href="/b">two</a>',
    '<a href="/q?u=1" class="nav">with attrs</a>',
    '<a href="">empty href</a>',
    '<a href="/e"></a>',
    '<ul><li><a href="/s/0">menu item 0 padding</a></li>'
    '<li><a href="/s/1">menu item 1 padding</a></li></ul>',
    '<p>text <a href="/deep/path/page.html" rel="nofollow">deep · page</a>'
    " more text</p>",
]


def test_regex_matches_htmlparser_on_simple_anchors():
    for body in SIMPLE_CASES:
        html = _page(body)
        got = ANCHOR_RE.findall(html)
        p = _AnchorCollector()
        p.feed(html)
        assert got == p.anchors, body


def test_regex_skips_unquoted_and_nested_by_design():
    """Documented boundary: unquoted hrefs and anchors containing nested
    tags are OUTSIDE the regex's class — it must skip them entirely (no
    partial/garbled match), never mis-pair href with foreign text."""
    html = _page(
        "<a href=/unquoted>skipped</a>"
        '<a href="/nested"><b>bold</b></a>'
        '<a href="/ok">kept</a>'
    )
    assert ANCHOR_RE.findall(html) == [("/ok", "kept")]


def test_regex_keeps_entities_raw_by_design():
    """Documented boundary: the regex (like the SQL twins) returns the
    RAW byte content — entity references are not decoded.  An engine
    consumer needing decoded urls applies url/entity normalization
    downstream (canonical_urls); baking decoding into the extraction
    regex would diverge the Spark and DuckDB sides."""
    html = _page('<a href="/q?u=1&amp;v=2">A &amp; B</a>')
    assert ANCHOR_RE.findall(html) == [("/q?u=1&amp;v=2", "A &amp; B")]
