"""Deterministic synthetic pages corpus (FIXTURES.md case matrix).

Seeded ``random.Random`` only — no wall-clock, no unseeded RNG, so the same
call always yields byte-identical parquet (SURVEY.md §7.3 determinism;
mirrors the reference's fixed asset workspaces, test/conftest.py:51-69).

Hosts are Zipfian with host00 holding ~30% of rows (the skew fixture —
Common-Crawl's Zipf host distribution, SURVEY.md §4 custom-work #1).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

SEED = 42
_BASE_TS = datetime(2024, 6, 1)  # fixed epoch — never wall-clock

_WORDS = {
    "en": ("the and of to in a is that for it with as was on are content "
           "article reader archive crawl corpus signal value record story "
           "report quality measure window table system").split(),
    "de": ("der die das und ist von zu mit den nicht ein im auf für inhalt "
           "artikel leser archiv korpus signal wert satz geschichte bericht "
           "qualität fenster tabelle system seite").split(),
    "fr": ("le la les de des et un une est que pour dans sur au contenu "
           "article lecteur archive corpus signal valeur phrase histoire "
           "rapport qualité fenêtre table système page").split(),
}
_LANGS = ("en", "de", "fr")

CASES = ("plain", "unicode", "overwrite", "raw_charset", "empty_tiny",
         "whitespace", "spaceword", "boilerplate", "vote_split", "poison")
# cumulative weights for case assignment
_CASE_W = [0.40, 0.48, 0.63, 0.71, 0.77, 0.85, 0.90, 0.95, 0.98, 1.00]


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    ws = [rng.choice(_WORDS[lang]) for _ in range(n)]
    return " ".join(ws).capitalize() + "."


def _paragraph(rng: random.Random, lang: str, n_sentences: int) -> str:
    return " ".join(_sentence(rng, lang, rng.randint(8, 14)) for _ in range(n_sentences))


def _nav_html() -> str:
    links = "".join(
        f'<li><a href="/s/{k}">menu item {k} with padding text</a></li>'
        for k in range(8)
    )
    return (f'<header><div class="logo">Example Site</div>'
            f"<nav><ul>{links}</ul></nav></header>"
            f'<aside><p><a href="/ad1">sponsored offer one</a> '
            f'<a href="/ad2">sponsored offer two</a> '
            f'<a href="/ad3">sponsored offer three</a></p></aside>')


def _footer_html() -> str:
    return ('<footer><p><a href="/imprint">Imprint</a> · '
            '<a href="/privacy">Privacy</a> · © example</p></footer>')


def _link_farm(n: int = 16) -> str:
    items = " ".join(
        f'<a href="/t/{k}">tag link number {k}</a>' for k in range(n)
    )
    return f'<div class="farm">{items}</div>'


def _page_html(rng: random.Random, lang: str, case: str, idx: int) -> bytes:
    meta = '<meta charset="utf-8">'
    title = f"Document {idx}"
    paras = [_paragraph(rng, lang, rng.randint(2, 4)) for _ in range(rng.randint(2, 5))]

    if case == "unicode":
        paras[0] += " Die verſchuldeten ﬁnanzen æon Straße cœur."
    elif case == "whitespace":
        paras[0] = "   " + paras[0].replace(". ", ".   ") + "   "
        paras.append("  doubled  internal   spacing  test  sentence here.  ")
    elif case == "spaceword":
        paras.append("alpha   beta  gamma delta    epsilon tokens runs.")
    elif case == "empty_tiny":
        paras = ["tiny."]  # < 8 visible chars → block skipped (F4)
    elif case == "vote_split":
        # engineered disagreement: content-dense but link-heavy paragraph,
        # plus a deep low-density div
        linky = " ".join(
            f'<a href="/x/{k}">{_sentence(rng, lang, 3)}</a>' for k in range(4)
        )
        paras.append(linky)

    body_parts = [_nav_html()]
    if case == "boilerplate":
        body_parts += [_link_farm(), _link_farm(20)]
        paras = paras[:1]  # thin content wrapped in heavy boilerplate
    body_parts.append("<article><h1>" + title + "</h1>")
    body_parts += [f"<p>{p}</p>" for p in paras]
    body_parts.append("</article>")
    if case == "vote_split":
        deep = "<div>" * 10 + f"<p>{_sentence(rng, lang, 6)}</p>" + "</div>" * 10
        body_parts.append(deep)
    body_parts.append(_footer_html())
    body = "".join(body_parts)

    if case == "raw_charset":
        # latin-1 payload, NO charset declaration → utf-8 strict fails,
        # latin-1 fallback + raw_charset flag (≈ "Using raw image")
        text = (f"<html><head><title>{title}</title></head><body>{body}"
                f"<p>Café résumé naïve señor {_paragraph(rng, lang, 2)}</p>"
                f"</body></html>")
        return text.encode("latin-1", errors="replace")

    html = f"<html><head>{meta}<title>{title}</title></head><body>{body}</body></html>"
    return html.encode("utf-8")


def _poison_payload(rng: random.Random, idx: int) -> bytes:
    # >20% control chars → kernel raises, row becomes an error row
    if idx % 2 == 0:
        return bytes(rng.randrange(0, 32) for _ in range(256))
    head = b"<html><body><p>trunc"
    return head + bytes(rng.randrange(0, 9) for _ in range(512))


def _host_for(rng: random.Random) -> int:
    if rng.random() < 0.30:
        return 0  # skew: host00 ≈ 30% of rows
    # Zipf-ish tail over hosts 1..49
    r = rng.random()
    return 1 + min(48, int(49 * r * r))


def case_for(rng: random.Random) -> str:
    r = rng.random()
    for case, w in zip(CASES, _CASE_W):
        if r < w:
            return case
    return "plain"


def gen_pages(n: int, seed: int = SEED, big_page_every: int = 0) -> pd.DataFrame:
    """Generate n synthetic pages: (url, warc_ts, html, text, lang, case).

    ``case`` is a test-only extra column; the pipeline ignores it.
    ``big_page_every``: every k-th row becomes a ~1 MB page (skew fixture).
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        lang = _LANGS[i % 3]
        case = case_for(rng)
        host = _host_for(rng)
        url = f"https://host{host:02d}.example/p/{i:06d}"
        ts = _BASE_TS + timedelta(days=i % 30, seconds=i % 86400)
        if case == "poison":
            html = _poison_payload(rng, i)
        else:
            html = _page_html(rng, lang, case, i)
        if big_page_every and i > 0 and i % big_page_every == 0:
            # ~1 MB page (FIXTURES.md skew case)
            body = "".join(
                f"<p>{_paragraph(rng, lang, 6)}</p>" for _ in range(2600)
            )
            html = (f'<html><head><meta charset="utf-8"></head><body>'
                    f"<article>{body}</article></body></html>").encode("utf-8")
            case = "skew_big"
        prior = f"stale text {i}" if case == "overwrite" else None
        rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": prior,
             "lang": lang, "case": case}
        )
    return pd.DataFrame(rows)


def write_pages_parquet(pdf: pd.DataFrame, path: str) -> None:
    """Write with an explicit arrow schema so html is BINARY, not string."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("url", pa.string(), False),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("case", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, path)
