"""WARC source: read Common-Crawl-style web archives into the pages table.

The crawl-native input format (ISO 28500): a WARC file is a sequence of
records — `WARC/1.0` header block, CRLFCRLF, `Content-Length` bytes of
body, CRLFCRLF — optionally gzip-compressed with one member per record
(the Common Crawl layout; multi-member gzip decompresses in one call).

Spark shape: `spark.read.format("binaryFile")` gives one row per WARC
file (path, bytes); record splitting + HTTP payload extraction run in a
``mapInPandas`` batch over those rows.  Parallelism is file-granular —
exactly right for the real corpus shape (Common Crawl segments are ~1 GB
gzip × ~72k files per crawl, far more files than executor slots).  Each
task holds one file's bytes; executor memory budgets ≈ concurrent tasks ×
file size, the same budget every WARC reader (warcio, FastWARC, Spark
binaryFile) carries.  A DSv2 streaming-split reader would lift the
single-file-in-memory bound; the record parser below would be reused
unchanged.

Reference analogue: S1/S3 — the workspace/file-group scan + page payload
load (`ocrd_calamari/recognize.py:110-124` resolves image payloads from
the METS file group; here the payload comes out of the archive record).
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the WARC/1.0 version line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def iter_warc_records(data: bytes):
    """Yield (headers, body) per WARC record.  Content-Length-driven —
    never scans body bytes for delimiters (bodies may contain CRLFCRLF)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end == -1:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return  # malformed record: stop rather than misalign
        body_start = hdr_end + len(_CRLF2)
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _dechunk(data: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (size-hex CRLF chunk CRLF
    ... 0 CRLF [trailers] CRLF).  Malformed framing returns what decoded
    so far plus the remainder raw — never raises (error rows are the
    kernel's job, not the reader's)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.find(b"\r\n", pos)
        if eol == -1:
            out += data[pos:]
            break
        size_token = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            out += data[pos:]
            break
        if size == 0:
            break  # terminal chunk; ignore trailers
        start = eol + 2
        out += data[start:start + size]
        pos = start + size + 2  # skip chunk-data CRLF
    return bytes(out)


def _http_payload(body: bytes) -> bytes:
    """application/http response body → entity bytes.

    Real crawl records carry Transfer-Encoding: chunked and
    Content-Encoding: gzip/deflate (the Common Crawl default is
    identity-at-capture, but chunked + gzip appear throughout) — both are
    undone here so the html column holds markup bytes, not framing or
    compressed streams.  Decode failures fall back to the raw payload
    (the kernel's binary-payload guard turns those into error rows).
    """
    sep = body.find(_CRLF2)
    if sep == -1:
        return body
    head = body[:sep].lower()
    payload = body[sep + len(_CRLF2):]
    headers = {}
    for line in head.split(b"\r\n")[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip()] = v.strip()
    if b"chunked" in headers.get(b"transfer-encoding", b""):
        payload = _dechunk(payload)
    enc = headers.get(b"content-encoding", b"")
    if b"gzip" in enc or b"x-gzip" in enc:
        payload = _bounded_inflate(payload, 16 + 15)  # gzip wrapper
    elif b"deflate" in enc:
        out = _bounded_inflate(payload, 15)  # zlib wrapper
        if out is payload:  # some servers send raw deflate
            out = _bounded_inflate(payload, -15)
        payload = out
    return payload


_MAX_ENTITY_BYTES = 64 << 20  # decompression-bomb cap per record


def _bounded_inflate(data: bytes, wbits: int) -> bytes:
    """Size-capped decompress: a hostile record must not be able to
    amplify a small compressed body into gigabytes inside an executor
    (gzip allows ~1000×).  Overflow or decode failure returns the raw
    bytes — the kernel's binary-payload guard turns those into error
    rows."""
    import zlib

    try:
        d = zlib.decompressobj(wbits)
        out = d.decompress(data, _MAX_ENTITY_BYTES)
        if d.unconsumed_tail:
            return data  # would exceed the cap → refuse to expand
        return out
    except zlib.error:
        return data


def _warc_ts(headers: dict):
    raw = headers.get(b"warc-date")
    if not raw:
        return None
    try:
        return datetime.fromisoformat(
            raw.decode("ascii").replace("Z", "+00:00")
        ).astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


# file-level decompression-bomb cap: 128× the per-record entity cap
# (8 GiB).  A legitimate CC segment is ~1 GB compressed and inflates to a
# few GB — the cap must sit comfortably ABOVE that (a too-tight cap fails
# valid input), while still stopping a hostile archive from amplifying
# arbitrarily into executor memory (gzip allows ~1000×).
_MAX_FILE_BYTES = 128 * _MAX_ENTITY_BYTES


def _bounded_gunzip_members(data: bytes, max_total: int) -> bytes:
    """Incrementally inflate a (possibly multi-member) gzip stream with a
    cumulative output cap.

    The Common Crawl layout gzips one member per record, so members are
    walked via ``decompressobj.unused_data``; within a member, output is
    drained in ≤8 MiB pieces through ``unconsumed_tail`` — at no point
    does more than ``max_total`` (+ one piece) exist in memory, unlike a
    whole-file ``gzip.decompress`` whose output is unbounded before any
    record-level cap can apply.  Exceeding the cap raises ValueError (a
    clear per-file task error beats a silent executor OOM).

    Corruption vs trailer padding: leftover bytes that do NOT start with
    the gzip magic are trailer garbage (padded archives exist in the
    wild) and end the walk silently; a zlib error INSIDE a member that
    did start with the magic is real corruption and raises — silently
    returning a prefix there would drop the rest of the file's records
    from the corpus with no error anywhere.
    """
    import zlib

    out = bytearray()
    buf = data
    piece = 8 << 20
    while buf:
        if not buf.startswith(b"\x1f\x8b"):
            return bytes(out)  # trailer garbage after the last member
        d = zlib.decompressobj(16 + 15)  # gzip wrapper
        tail = buf
        try:
            while True:
                out += d.decompress(tail, piece)
                if len(out) > max_total:
                    raise ValueError(
                        f"gzip archive inflates past the {max_total}-byte "
                        f"file cap — refusing to materialize"
                    )
                if d.eof:
                    buf = d.unused_data
                    break
                if not d.unconsumed_tail:
                    return bytes(out)  # truncated final member: keep output
                tail = d.unconsumed_tail
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in archive: {exc}") from exc
    return bytes(out)


def records_to_rows(name: str, data: bytes) -> Iterator[dict]:
    """WARC file bytes → pages rows (response records only), with
    (_src_file, _src_row) record lineage — WARC sources have no scan-level
    metadata columns once the bytes pass through the record splitter."""
    if name.endswith(".gz"):
        data = _bounded_gunzip_members(data, _MAX_FILE_BYTES)
    for i, (headers, body) in enumerate(iter_warc_records(data)):
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri")
        if url is None:
            continue
        yield {
            "url": url.decode("utf-8", "replace"),
            "warc_ts": _warc_ts(headers),
            "html": _http_payload(body),
            "text": None,
            "lang": None,
            "_src_file": name,
            "_src_row": i,
        }


def wet_records_to_rows(name: str, data: bytes) -> Iterator[dict]:
    """WET file bytes → pages rows.  WET is the Common-Crawl
    extracted-text distribution: the SAME WARC container format, but
    records are ``warc-type: conversion`` carrying a plain-text body with
    no HTTP envelope — so the splitter, gzip-member handling, and bomb
    caps are shared with the response reader verbatim; only the record
    filter and payload mapping differ (text filled, html None).  The
    warcinfo header record and any response records in a mixed file are
    skipped."""
    if name.endswith(".gz"):
        data = _bounded_gunzip_members(data, _MAX_FILE_BYTES)
    for i, (headers, body) in enumerate(iter_warc_records(data)):
        if headers.get(b"warc-type") != b"conversion":
            continue
        url = headers.get(b"warc-target-uri")
        if url is None:
            continue
        yield {
            "url": url.decode("utf-8", "replace"),
            "warc_ts": _warc_ts(headers),
            "html": None,
            "text": body.decode("utf-8", "replace"),
            "lang": None,
            "_src_file": name,
            "_src_row": i,
        }


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET file(s) → pages DataFrame with ``text`` populated and ``html``
    None — the already-extracted Common-Crawl text tier, feeding the
    text-side operators (dedup, quality, lang-id) directly without the
    extraction kernel.  Same binaryFile → mapInPandas shape as
    ``read_warc`` (whole-file units; WET shards are ~100 MB-bounded by
    the producer, and the gzip bomb caps still guard the decode)."""
    return _read_warc_family(spark, path, wet_records_to_rows)


def _read_warc_family(spark: SparkSession, path: str,
                      row_fn) -> DataFrame:
    """Shared binaryFile → mapInPandas scan for WARC-container formats;
    ``row_fn(name, bytes) -> Iterator[dict]`` decides the record filter
    and payload mapping (response → html for WARC, conversion → text for
    WET)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from ocrd_calamari_spark.schema import PAGES_SCHEMA

    schema = StructType(
        list(PAGES_SCHEMA.fields)
        + [StructField("_src_file", StringType(), True),
           StructField("_src_row", LongType(), True)]
    )
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"].values,
                                     pdf["content"].values):
                rows.extend(row_fn(str(name), bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_fn, schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → pages DataFrame (url, warc_ts, html, text, lang,
    _src_file, _src_row)."""
    return _read_warc_family(spark, path, records_to_rows)


def wat_records_to_rows(name: str, data: bytes) -> Iterator[dict]:
    """WAT file bytes → link rows.  WAT is the Common-Crawl METADATA
    tier: ``warc-type: metadata`` records whose body is a JSON envelope;
    outlinks live at Envelope → Payload-Metadata →
    HTTP-Response-Metadata → HTML-Metadata → Links (a list of {path,
    url} objects).  One row per (page, outlink) with the page url and
    capture ts — the link-graph feed (extract_links / pagerank / HITS /
    anchor ops) at ~1/20 the archive bytes, no HTML parse.  A record
    whose JSON is malformed or link-free is skipped, not fatal (same
    quarantine philosophy as the JSONL source)."""
    import json as _json

    if name.endswith(".gz"):
        data = _bounded_gunzip_members(data, _MAX_FILE_BYTES)
    for i, (headers, body) in enumerate(iter_warc_records(data)):
        if headers.get(b"warc-type") != b"metadata":
            continue
        url = headers.get(b"warc-target-uri")
        if url is None:
            continue
        try:
            env = _json.loads(body.decode("utf-8", "replace"))
            links = (
                env["Envelope"]["Payload-Metadata"]
                ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"]
            )
        except (ValueError, KeyError, TypeError):
            continue
        src = url.decode("utf-8", "replace")
        ts = _warc_ts(headers)
        for j, link in enumerate(links):
            href = link.get("url") if isinstance(link, dict) else None
            if not href:
                continue
            yield {
                "url": src,
                "warc_ts": ts,
                "href": str(href),
                "link_idx": j,
                "_src_file": name,
                "_src_row": i,
            }


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT file(s) → outlink DataFrame (url, warc_ts, href, link_idx,
    _src_file, _src_row) — the link-graph tier: plan the graph ops off
    the ~5 % metadata bytes instead of re-parsing HTML at archive scale
    (the CDXJ lesson applied to links).  Same binaryFile → mapInPandas
    shape and bomb caps as the WARC/WET readers."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("href", StringType(), True),
        StructField("link_idx", LongType(), True),
        StructField("_src_file", StringType(), True),
        StructField("_src_row", LongType(), True),
    ])
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"].values,
                                     pdf["content"].values):
                rows.extend(wat_records_to_rows(str(name), bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_fn, schema)


# ---------------------------------------------------------------------------
# Test/bench helper: deterministic WARC writer for a pages DataFrame.
# ---------------------------------------------------------------------------
def write_warc(pages_pdf: pd.DataFrame, path: str,
               compress: bool = False) -> None:
    """pages rows → one WARC file (warcinfo + response records)."""
    out = bytearray()

    import hashlib

    def record(rtype: str, body: bytes, extra: dict) -> bytes:
        rid = hashlib.md5(
            rtype.encode() + extra.get("WARC-Target-URI", "").encode()
        ).hexdigest()
        head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode(),
                b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">"]
        for k, v in extra.items():
            head.append(k.encode() + b": " + v.encode())
        head.append(b"Content-Length: " + str(len(body)).encode())
        return b"\r\n".join(head) + _CRLF2 + body + _CRLF2

    out += record("warcinfo", b"software: ocrd-calamari-spark-gen\r\n",
                  {"WARC-Date": "2024-06-01T00:00:00Z"})
    for _, row in pages_pdf.iterrows():
        payload = bytes(row["html"]) if row["html"] is not None else b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(payload)).encode()
                + _CRLF2 + payload)
        ts = row["warc_ts"]
        iso = (pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
               if ts is not None else "2024-06-01T00:00:00Z")
        out += record("response", http, {
            "WARC-Target-URI": row["url"],
            "WARC-Date": iso,
            "Content-Type": "application/http;msgtype=response",
        })
    blob = bytes(out)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)


def write_wat(pages_pdf: pd.DataFrame, path: str,
              compress: bool = False) -> None:
    """(url, warc_ts, hrefs list) rows → one WAT file (warcinfo +
    metadata records carrying the Common-Crawl JSON envelope) — the
    test/bench producer for ``read_wat``."""
    import hashlib
    import json as _json

    out = bytearray()

    def record(rtype: str, body: bytes, extra: dict) -> bytes:
        rid = hashlib.md5(
            rtype.encode() + extra.get("WARC-Target-URI", "").encode()
        ).hexdigest()
        head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode(),
                b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">"]
        for k, v in extra.items():
            head.append(k.encode() + b": " + v.encode())
        head.append(b"Content-Length: " + str(len(body)).encode())
        return b"\r\n".join(head) + _CRLF2 + body + _CRLF2

    out += record("warcinfo", b"software: ocrd-calamari-spark-gen\r\n",
                  {"WARC-Date": "2024-06-01T00:00:00Z"})
    for _, row in pages_pdf.iterrows():
        env = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "A@/href", "url": h}
                                for h in (row["hrefs"] or [])
                            ]
                        }
                    }
                }
            }
        }
        ts = row["warc_ts"]
        iso = (pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
               if ts is not None else "2024-06-01T00:00:00Z")
        out += record(
            "metadata", _json.dumps(env).encode("utf-8"), {
                "WARC-Target-URI": row["url"],
                "WARC-Date": iso,
                "Content-Type": "application/json",
            })
    blob = bytes(out)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)


def write_wet(pages_pdf: pd.DataFrame, path: str,
              compress: bool = False) -> None:
    """pages rows → one WET file (warcinfo + conversion records with
    plain-text bodies, no HTTP envelope) — the Common-Crawl
    extracted-text shard shape, for tests/benches of ``read_wet``."""
    import hashlib

    out = bytearray()

    def record(rtype: str, body: bytes, extra: dict) -> bytes:
        rid = hashlib.md5(
            rtype.encode() + extra.get("WARC-Target-URI", "").encode()
        ).hexdigest()
        head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode(),
                b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">"]
        for k, v in extra.items():
            head.append(k.encode() + b": " + v.encode())
        head.append(b"Content-Length: " + str(len(body)).encode())
        return b"\r\n".join(head) + _CRLF2 + body + _CRLF2

    out += record("warcinfo", b"software: ocrd-calamari-spark-gen\r\n",
                  {"WARC-Date": "2024-06-01T00:00:00Z"})
    for _, row in pages_pdf.iterrows():
        body = (row["text"] or "").encode("utf-8")
        ts = row["warc_ts"]
        iso = (pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
               if ts is not None else "2024-06-01T00:00:00Z")
        out += record("conversion", body, {
            "WARC-Target-URI": row["url"],
            "WARC-Date": iso,
            "Content-Type": "text/plain",
        })
    blob = bytes(out)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
