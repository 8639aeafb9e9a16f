"""End-to-end extraction kernel: one page in → text + spans out.

Mirrors the reference's ``process_page_pcgts`` composition
(ocrd_calamari/recognize.py:97-217) stage for stage:

  decode payload          ≈ image_from_page + load_image (recognize.py:108-110, :752-785)
  segment into blocks     ≈ get_AllRegions("Text") → get_TextLine (recognize.py:125-146)
  tiny-segment filter     ≈ skip h<=8 / w<=8 / all-background (recognize.py:166-179)
  ensemble vote + fuse    ≈ MultiPredictor + voter (recognize.py:507-516, :633-635)
  positions normalize     ≈ _post_process_line whitespace ops (recognize.py:251-279)
  text assembly + spans   ≈ TextEquiv / Word / Glyph emission (recognize.py:298-398)
  hierarchy concat        ≈ _page_update_higher_textequiv_levels (recognize.py:708-747):
                            glyph "" -join → word " " -join → block "\n" -join

The whole module is pure pandas/python — it runs identically as the frozen
single-process oracle and inside ``mapInPandas`` (SURVEY.md §5.2).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.kernel.decode import decode_html
from ocrd_calamari_spark.kernel.segment import Block, segment
from ocrd_calamari_spark.kernel.textproc import (
    Position,
    assemble_text,
    glyph_alts,
    normalize_positions,
    word_spans,
)
from ocrd_calamari_spark.kernel.vote import vote_block

# Deterministic per-char confidence model.  The reference gets per-char
# probabilities from the CTC decoder (recognize.py:240-247); our analogue is
# a pure hash-based function of (char, fused_block_confidence) so retries,
# partitioning and resume are reproducible (SURVEY.md §7.3 determinism).
_JITTER_MOD = 997
_JITTER_MULT = 2654435761  # Knuth multiplicative hash

# Small confusion table for secondary hypotheses (≈ CTC alternatives).
_CONFUSION = {"l": "1", "1": "l", "o": "0", "0": "o", "ſ": "s", "S": "5", "5": "S"}

# A payload whose decoded form is mostly control characters is not HTML;
# raising here is the analogue of a poisoned sample the reference's
# ``ignore_errors`` pipeline drops (recognize.py:606-609).
_CTRL_FRACTION_LIMIT = 0.20


def _char_probs(c: str, fused: float) -> tuple:
    """Primary + optional alternative hypothesis for one char."""
    jitter = ((ord(c) * _JITTER_MULT) % _JITTER_MOD) / _JITTER_MOD
    p1 = round(min(0.999, max(0.5, 0.70 + 0.30 * fused - 0.05 * jitter)), 6)
    alt = _CONFUSION.get(c)
    if alt is None and c.isalpha():
        sw = c.swapcase()
        alt = sw if sw != c else None
    if alt is None:
        return ((c, p1),)
    p2 = round((1.0 - p1) * 0.5, 6)
    return ((c, p1), (alt, p2))


def _positions_for(block_raw_text: str, fused: float) -> list:
    return [Position(chars=_char_probs(c, fused)) for c in block_raw_text]


def _looks_binary(text: str) -> bool:
    if not text:
        return False
    nctrl = sum(1 for ch in text[:4096] if ord(ch) < 32 and ch not in "\n\r\t\f\v")
    return nctrl / min(len(text), 4096) > _CTRL_FRACTION_LIMIT


def extract_page(
    url: str,
    html: Optional[bytes],
    prior_text: Optional[str],
    lang: Optional[str],
    cfg: ExtractConfig,
) -> dict:
    """Extract one page → output-row dict (schema.OUTPUT_SCHEMA sans lineage)."""
    overwrote = bool(prior_text)  # ≈ "already contained text results" warning,
    # recognize.py:288-296; becomes a counter, not a mutation warning.
    row = {
        "url": url,
        "text": None,
        "conf": None,
        "n_blocks": None,
        "blocks": None,
        "words": None,
        "glyphs": None,
        "overwrote": overwrote,
        "raw_charset": False,
        "error": None,
    }
    try:
        if html is None:
            raise ValueError("null html payload")
        decoded, raw = decode_html(bytes(html))
        row["raw_charset"] = raw
        if _looks_binary(decoded):
            raise ValueError("binary payload (control-char fraction exceeded)")

        blocks_out, words_out, glyphs_out = [], [], []
        doc_parts = []
        doc_pos = 0
        blk_no = 0
        conf_sum = 0.0
        for blk in segment(decoded):
            # F4 tiny-segment filter (recognize.py:166-179)
            if blk.visible_len() < cfg.min_visible_chars:
                continue
            accept, fused = vote_block(
                blk, lang, cfg.extractors, cfg.voter, cfg.accept_threshold
            )
            if not accept:
                continue
            positions = _positions_for(blk.raw_text, fused)
            positions = normalize_positions(positions, cfg.glyph_conf_cutoff)
            text = assemble_text(positions, cfg.glyph_conf_cutoff)
            if not text:
                continue
            block_id = "blk%04d" % blk_no
            blk_no += 1
            if doc_parts:
                doc_pos += 1  # "\n" separator (A3, recognize.py:743-747)
            start = doc_pos
            end = start + len(text)
            conf = round(
                sum(p.chars[0][1] for p in positions) / len(positions), 6
            )  # ≈ avg_char_probability, recognize.py:299
            conf_sum += conf
            blocks_out.append(
                {"block_id": block_id, "start": start, "end": end,
                 "text": text, "conf": conf}
            )
            if cfg.textequiv_level in ("word", "glyph"):
                for word_no, ws, we, wtext in word_spans(text):
                    word_id = "%s_word%04d" % (block_id, word_no)  # recognize.py:349
                    words_out.append(
                        {"block_id": block_id, "word_id": word_id,
                         "start": start + ws, "end": start + we, "text": wtext}
                    )
                    if cfg.textequiv_level == "glyph":
                        for glyph_no, p in enumerate(positions[ws:we]):
                            glyphs_out.append(
                                {
                                    "glyph_id": "%s_glyph%04d" % (word_id, glyph_no),
                                    "block_id": block_id,
                                    "start": start + ws + glyph_no,
                                    "end": start + ws + glyph_no + 1,
                                    "alts": glyph_alts(p, cfg.glyph_conf_cutoff),
                                }
                            )
            doc_parts.append(text)
            doc_pos = end

        row["text"] = "\n".join(doc_parts)
        row["n_blocks"] = len(blocks_out)
        row["conf"] = round(conf_sum / len(blocks_out), 6) if blocks_out else 0.0
        row["blocks"] = blocks_out
        row["words"] = words_out
        row["glyphs"] = glyphs_out
    except Exception as exc:  # error row, never a task failure (ignore_errors)
        row["error"] = f"{type(exc).__name__}: {exc}"
        row["text"] = None
        row["conf"] = None
        row["n_blocks"] = None
        row["blocks"] = None
        row["words"] = None
        row["glyphs"] = None
    return row


_OUT_COLS = [
    "url", "text", "conf", "n_blocks", "blocks", "words", "glyphs",
    "overwrote", "raw_charset", "error",
]


def extract_batch(pdf: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """One Arrow batch of pages → one batch of output rows.

    Columns required: url, html, text, lang (schema.KERNEL_INPUT_COLS).
    """
    rows = [
        extract_page(u, h, t, l, cfg)
        for u, h, t, l in zip(
            pdf["url"].values, pdf["html"].values, pdf["text"].values,
            pdf["lang"].values,
        )
    ]
    return pd.DataFrame(rows, columns=_OUT_COLS)


def make_map_fn(cfg: ExtractConfig):
    """Build the ``mapInPandas`` iterator function.

    Config is captured once per task before the batch loop — the analogue of
    the reference's one-time ``setup()`` (recognize.py:59-82), minus the
    90 MB checkpoints: our extractors are cheap pure functions.
    """

    def _fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_batch(pdf, cfg)

    return _fn
