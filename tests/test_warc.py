"""WARC source: round-trip, gzip members, record lineage, and end-to-end
extraction parity with the parquet-sourced pipeline."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.pipeline import read_pages, run_extraction, read_output
from ocrd_calamari_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    records_to_rows,
    write_warc,
)


@pytest.fixture(scope="module")
def warc_path(pages_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    p = str(d / "crawl-00000.warc")
    write_warc(pages_pdf, p)
    return p


class TestWarcRoundTrip:
    def test_read_back_matches_source(self, spark, pages_pdf, warc_path):
        got = read_warc(spark, warc_path).toPandas().set_index("url")
        src = pages_pdf.set_index("url")
        assert sorted(got.index) == sorted(src.index)
        for url in src.index:
            a, b = src.loc[url, "html"], got.loc[url, "html"]
            if a is None:
                assert b == b""  # null payload round-trips as empty body
            else:
                assert bytes(a) == bytes(b)
        # timestamps survive (second precision)
        ts_ok = got["warc_ts"].notna().all()
        assert ts_ok

    def test_gzip_multimember(self, spark, pages_pdf, tmp_path_factory):
        # per-record gzip members, the Common Crawl layout
        d = tmp_path_factory.mktemp("warcgz")
        plain = str(d / "x.warc")
        write_warc(pages_pdf.head(20), plain)
        data = open(plain, "rb").read()
        recs = list(iter_warc_records(data))
        assert len(recs) == 21  # warcinfo + 20 responses
        # re-frame each record as its own gzip member
        gz = str(d / "x.warc.gz")
        with open(gz, "wb") as f:
            pos = 0
            for _ in recs:
                nxt = data.find(b"WARC/", pos + 1)
                nxt = len(data) if nxt == -1 else nxt
                f.write(gzip.compress(data[pos:nxt]))
                pos = nxt
        got = read_warc(spark, gz)
        assert got.count() == 20

    def test_writer_gzip_mode_round_trips(self, spark, pages_pdf,
                                          tmp_path_factory):
        d = tmp_path_factory.mktemp("warcgzw")
        p = str(d / "x.warc.gz")
        write_warc(pages_pdf.head(15), p, compress=True)
        got = read_warc(spark, p)
        assert got.count() == 15

    def test_record_lineage_columns(self, spark, warc_path):
        got = read_warc(spark, warc_path)
        rows = got.select("_src_file", "_src_row").collect()
        assert all(r["_src_file"].endswith("crawl-00000.warc") for r in rows)
        idx = sorted(r["_src_row"] for r in rows)
        assert idx[0] >= 1  # record 0 is warcinfo, skipped
        assert len(set(idx)) == len(idx)  # unique per record

    def test_malformed_tail_stops_cleanly(self):
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: notanumber\r\n\r\nbody")
        assert list(iter_warc_records(bad)) == []
        truncated = b"WARC/1.0\r\nWARC-Type: response"  # no header end
        assert list(iter_warc_records(truncated)) == []
        assert list(records_to_rows("x.warc", b"")) == []


class TestFileLevelBombCap:
    def test_bounded_gunzip_equals_stdlib_on_wellformed(self, pages_pdf,
                                                        tmp_path):
        """Incremental member-walking inflate is byte-identical to
        gzip.decompress on well-formed single- and multi-member archives."""
        from ocrd_calamari_spark.sources.warc import _bounded_gunzip_members

        plain = str(tmp_path / "x.warc")
        write_warc(pages_pdf.head(10), plain)
        data = open(plain, "rb").read()
        single = gzip.compress(data)
        multi = gzip.compress(data[:1000]) + gzip.compress(data[1000:])
        cap = 64 << 20
        assert _bounded_gunzip_members(single, cap) == data
        assert _bounded_gunzip_members(multi, cap) == data
        # trailing garbage after the last member is tolerated (stdlib
        # raises here; padded archives exist in the wild)
        assert _bounded_gunzip_members(single + b"\x00garbage", cap) == data

    def test_file_level_bomb_raises_not_materializes(self):
        """A hostile archive inflating past the file cap must raise a clear
        error BEFORE the expansion materializes — never a silent OOM.  The
        inflate drains in ≤8 MiB pieces, so peak memory is cap + one piece
        regardless of the bomb's true size."""
        import pytest as _pytest

        from ocrd_calamari_spark.sources.warc import _bounded_gunzip_members

        bomb = gzip.compress(b"\x00" * (64 << 20))  # 64 MiB → ~64 KiB
        assert len(bomb) < 1 << 20
        with _pytest.raises(ValueError, match="file cap"):
            _bounded_gunzip_members(bomb, max_total=1 << 20)

    def test_records_to_rows_enforces_cap(self, monkeypatch):
        import ocrd_calamari_spark.sources.warc as warc_mod

        bomb = gzip.compress(b"\x00" * (16 << 20))
        monkeypatch.setattr(warc_mod, "_MAX_FILE_BYTES", 1 << 20)
        with pytest.raises(ValueError, match="file cap"):
            list(records_to_rows("bomb.warc.gz", bomb))

    def test_mid_member_corruption_raises_not_silently_truncates(
        self, pages_pdf, tmp_path
    ):
        """A flipped byte INSIDE a gzip member is corruption, not trailer
        padding — returning a partial prefix there would silently drop the
        rest of the file's records from the corpus."""
        from ocrd_calamari_spark.sources.warc import _bounded_gunzip_members

        plain = str(tmp_path / "x.warc")
        write_warc(pages_pdf.head(10), plain)
        data = open(plain, "rb").read()
        m1 = gzip.compress(data[:2000])
        m2 = gzip.compress(data[2000:])
        bad = bytearray(m1 + m2)
        flip = len(m1) + len(m2) // 2  # middle of member 2
        bad[flip] ^= 0xFF
        with pytest.raises(ValueError, match="corrupt gzip member"):
            _bounded_gunzip_members(bytes(bad), 64 << 20)

    def test_legit_sized_archive_passes_cap(self, tmp_path):
        """The file cap must sit ABOVE legitimate Common-Crawl-scale
        inflation (a few GB) — probe with the module constants instead of
        a multi-GB fixture."""
        import ocrd_calamari_spark.sources.warc as w

        assert w._MAX_FILE_BYTES >= 8 << 30

    def test_truncated_member_keeps_decoded_prefix(self, pages_pdf, tmp_path):
        from ocrd_calamari_spark.sources.warc import _bounded_gunzip_members

        plain = str(tmp_path / "x.warc")
        write_warc(pages_pdf.head(5), plain)
        data = open(plain, "rb").read()
        gz = gzip.compress(data)
        got = _bounded_gunzip_members(gz[:-20], 64 << 20)
        assert data.startswith(got) and len(got) > 0


class TestWarcExtractionParity:
    def test_warc_source_output_equals_parquet_source(
        self, spark, pages_parquet, warc_path, tmp_path_factory
    ):
        """run_extraction('warc:...') must produce byte-identical text per
        url to the parquet-sourced run — the source connector cannot leak
        into extraction semantics."""
        d_warc = str(tmp_path_factory.mktemp("outw"))
        d_parq = str(tmp_path_factory.mktemp("outp"))
        m1 = run_extraction(spark, "warc:" + warc_path, d_warc,
                            ExtractConfig(), n_buckets=8, n_chunks=2)
        m2 = run_extraction(spark, pages_parquet, d_parq,
                            ExtractConfig(), n_buckets=8, n_chunks=2)
        assert m1["complete"] and m2["complete"]
        a = (read_output(spark, d_warc).select("url", "text", "conf")
             .toPandas().set_index("url").sort_index())
        b = (read_output(spark, d_parq).select("url", "text", "conf")
             .toPandas().sort_index().set_index("url").sort_index())
        # parquet source carries a pre-existing `text` column (overwrite
        # fixture); WARC has none — compare on the rows where the input
        # text column played no role
        assert (a.index == b.index).all()
        src_text = spark.read.parquet(pages_parquet).select(
            "url", F.col("text").alias("pre")
        ).toPandas().set_index("url")
        fresh = src_text[src_text["pre"].isna()].index
        assert a.loc[fresh, "text"].equals(b.loc[fresh, "text"])
        # WARC-side lineage: every row carries (file, record-index)
        lw = read_output(spark, d_warc)
        n = lw.count()
        assert lw.where(F.col("lineage.file").contains("crawl-00000.warc")
                        & F.col("lineage.row_index").isNotNull()).count() == n


class TestHttpBodyDecoding:
    def test_chunked_and_gzip_bodies(self, spark, tmp_path):
        """Real crawl responses use chunked framing and gzip content
        encoding — the reader must hand the kernel markup bytes."""
        import gzip as _gz

        from ocrd_calamari_spark.sources.warc import _CRLF2

        html = b"<html><body><p>hello chunked world</p></body></html>"

        def record(url, http_head: bytes, payload: bytes) -> bytes:
            body = http_head + _CRLF2 + payload
            head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                    b"WARC-Target-URI: " + url + b"\r\n"
                    b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
                    b"Content-Length: " + str(len(body)).encode())
            return head + _CRLF2 + body + _CRLF2

        mid = len(html) // 2
        chunked = (hex(mid)[2:].encode() + b"\r\n" + html[:mid] + b"\r\n"
                   + hex(len(html) - mid)[2:].encode() + b"\r\n" + html[mid:]
                   + b"\r\n0\r\n\r\n")
        gz = _gz.compress(html)
        data = (
            record(b"http://a/", b"HTTP/1.1 200 OK\r\n"
                   b"Transfer-Encoding: chunked", chunked)
            + record(b"http://b/", b"HTTP/1.1 200 OK\r\n"
                     b"Content-Encoding: gzip", gz)
            + record(b"http://c/", b"HTTP/1.1 200 OK\r\n"
                     b"Transfer-Encoding: chunked\r\n"
                     b"Content-Encoding: gzip",
                     hex(len(gz))[2:].encode() + b"\r\n" + gz
                     + b"\r\n0\r\n\r\n")
            + record(b"http://d/", b"HTTP/1.1 200 OK", html)
        )
        p = str(tmp_path / "enc.warc")
        with open(p, "wb") as f:
            f.write(data)
        got = {r["url"]: bytes(r["html"])
               for r in read_warc(spark, p).collect()}
        assert got == {"http://a/": html, "http://b/": html,
                       "http://c/": html, "http://d/": html}

    def test_malformed_encoding_falls_back_to_raw(self, spark, tmp_path):
        from ocrd_calamari_spark.sources.warc import _http_payload

        # declared gzip but not gzip → raw bytes back (kernel will flag)
        body = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
                b"NOT GZIP DATA")
        assert _http_payload(body) == b"NOT GZIP DATA"
        # truncated chunk framing → best-effort prefix + remainder
        body2 = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                 b"5\r\nhello")
        assert _http_payload(body2) == b"hello"


class TestWetSource:
    """WET (Common-Crawl extracted text) tier: conversion records, plain
    text bodies, shared container machinery with the WARC reader."""

    @pytest.fixture(scope="class")
    def wet_pdf(self, pages_pdf):
        pdf = pages_pdf[["url", "warc_ts"]].copy()
        pdf["text"] = [
            f"Document {i} body with words\nand a café — naïve line."
            for i in range(len(pdf))
        ]
        return pdf

    def test_round_trip_text_exact(self, spark, wet_pdf, tmp_path_factory):
        from ocrd_calamari_spark.sources.warc import read_wet, write_wet

        d = tmp_path_factory.mktemp("wet")
        p = str(d / "crawl-00000.warc.wet")
        write_wet(wet_pdf, p)
        got = read_wet(spark, p).toPandas().set_index("url")
        src = wet_pdf.set_index("url")
        assert sorted(got.index) == sorted(src.index)
        for url in src.index:
            assert got.loc[url, "text"] == src.loc[url, "text"]
        assert got["html"].isna().all()
        assert got["warc_ts"].notna().all()

    def test_gzip_round_trip(self, spark, wet_pdf, tmp_path_factory):
        from ocrd_calamari_spark.sources.warc import read_wet, write_wet

        d = tmp_path_factory.mktemp("wetgz")
        p = str(d / "crawl-00000.warc.wet.gz")
        write_wet(wet_pdf, p, compress=True)
        got = read_wet(spark, p).toPandas()
        assert len(got) == len(wet_pdf)
        assert set(got["url"]) == set(wet_pdf["url"])

    def test_mixed_container_filters_by_record_type(
            self, spark, pages_pdf, wet_pdf, tmp_path_factory):
        """A concatenated response+conversion stream: read_warc must see
        only the response records, read_wet only the conversion ones —
        the record-type filter, not file naming, decides."""
        from ocrd_calamari_spark.sources.warc import (
            read_wet, write_warc, write_wet)

        d = tmp_path_factory.mktemp("mixed")
        pw, pt = str(d / "a.warc"), str(d / "b.warc")
        write_warc(pages_pdf.head(5), pw)
        write_wet(wet_pdf.head(7), pt)
        mixed = str(d / "mixed.warc")
        with open(mixed, "wb") as f:
            f.write(open(pw, "rb").read() + open(pt, "rb").read())
        assert read_wet(spark, mixed).count() == 7
        assert read_warc(spark, mixed).count() == 5

    def test_wet_feeds_text_operators_directly(
            self, spark, wet_pdf, tmp_path_factory):
        """The WET tier's point: text-side ops run with no extraction
        kernel in between."""
        from ocrd_calamari_spark.functions.text import mojibake_scores
        from ocrd_calamari_spark.sources.warc import read_wet, write_wet

        d = tmp_path_factory.mktemp("wetops")
        p = str(d / "x.warc.wet")
        write_wet(wet_pdf.head(20), p)
        pages = read_wet(spark, p).select(
            F.col("url").alias("doc_id"), "text")
        rows = mojibake_scores(pages).collect()
        assert len(rows) == 20
        assert all(not r.is_mojibake for r in rows)


class TestWatSource:
    """WAT (Common-Crawl metadata/link) tier: JSON-envelope metadata
    records → one (page, outlink) row per link — the link-graph feed
    at ~1/20 the archive bytes."""

    @pytest.fixture(scope="class")
    def wat_pdf(self, pages_pdf):
        pdf = pages_pdf[["url", "warc_ts"]].head(12).copy()
        pdf["hrefs"] = [
            [f"https://host{i % 3}.example/p/{j}" for j in range(i % 4)]
            for i in range(len(pdf))
        ]
        return pdf

    def test_round_trip_links_exact(self, spark, wat_pdf,
                                    tmp_path_factory):
        from ocrd_calamari_spark.sources.warc import read_wat, write_wat

        d = tmp_path_factory.mktemp("wat")
        p = str(d / "crawl-00000.warc.wat")
        write_wat(wat_pdf, p)
        got = read_wat(spark, p).toPandas()
        want = [(r["url"], h, j)
                for _, r in wat_pdf.iterrows()
                for j, h in enumerate(r["hrefs"])]
        assert sorted(zip(got["url"], got["href"], got["link_idx"])) \
            == sorted(want)
        assert got["warc_ts"].notna().all()

    def test_malformed_json_record_is_skipped_not_fatal(
            self, spark, wat_pdf, tmp_path_factory):
        from ocrd_calamari_spark.sources.warc import read_wat, write_wat

        d = tmp_path_factory.mktemp("watbad")
        p = str(d / "bad.warc.wat")
        write_wat(wat_pdf, p)
        blob = open(p, "rb").read()
        bad = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
               b"WARC-Record-ID: <urn:uuid:deadbeef>\r\n"
               b"WARC-Target-URI: https://broken.example/\r\n"
               b"Content-Length: 9\r\n\r\nnot json!\r\n\r\n")
        with open(p, "wb") as f:
            f.write(blob + bad)
        got = read_wat(spark, p).toPandas()
        assert "https://broken.example/" not in set(got["url"])
        n_links = sum(len(h) for h in wat_pdf["hrefs"])
        assert len(got) == n_links

    def test_wat_feeds_link_graph_directly(self, spark, wat_pdf,
                                           tmp_path_factory):
        """Host-level edges straight off the metadata tier — no HTML
        parse anywhere in the plan."""
        from ocrd_calamari_spark.sources.warc import read_wat, write_wat

        d = tmp_path_factory.mktemp("watgraph")
        p = str(d / "g.warc.wat")
        write_wat(wat_pdf, p)
        links = read_wat(spark, p)
        edges = (links
                 .select(F.expr("parse_url(url, 'HOST')").alias("src"),
                         F.expr("parse_url(href, 'HOST')").alias("dst"))
                 .where(F.col("dst").isNotNull())
                 .groupBy("src", "dst").count())
        rows = edges.collect()
        assert len(rows) > 0
        assert all(r["count"] >= 1 for r in rows)
