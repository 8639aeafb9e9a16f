"""CDXJ capture-index source: typed parse, quarantine semantics, and the
index-side fetch plan (latest-capture + digest dedup)."""

import json

import pytest
from pyspark.sql import functions as F

from ocrd_calamari_spark.sources.cdxj import (
    plan_fetches, read_cdxj, split_quarantine)


def _line(urlkey, ts, **kw):
    blob = {
        "url": kw.pop("url", "https://example.org/p"),
        "mime": kw.pop("mime", "text/html"),
        "status": kw.pop("status", "200"),
        "digest": kw.pop("digest", "sha1:AAAA"),
        "length": kw.pop("length", "1000"),
        "offset": kw.pop("offset", "0"),
        "filename": kw.pop("filename", "crawl/a.warc.gz"),
    }
    blob.update(kw)
    return f"{urlkey} {ts} {json.dumps(blob)}"


@pytest.fixture(scope="module")
def cdxj_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdxj")
    lines = [
        _line("org,example)/a", "20240115123456",
              url="https://example.org/a", digest="sha1:AAA",
              offset="100", length="2000"),
        # same url, LATER capture, different digest
        _line("org,example)/a", "20240301000000",
              url="https://example.org/a", digest="sha1:BBB",
              offset="900", length="2100"),
        # different url, identical digest as the latest /a → digest-dedup
        _line("org,example)/mirror", "20240201000000",
              url="https://example.org/mirror", digest="sha1:BBB",
              offset="500", length="2100"),
        # non-200 and non-text captures: excluded from the plan
        _line("org,example)/gone", "20240115000000",
              url="https://example.org/gone", status="404"),
        _line("org,example)/img", "20240115000000",
              url="https://example.org/img", mime="image/png"),
        # revisit record: '-' numerics must cast to null, NOT quarantine
        _line("org,example)/revisit", "20240116000000",
              url="https://example.org/revisit", status="-",
              offset="-", length="-"),
        # corrupt: bad JSON / short line / bad timestamp
        'org,example)/bad 20240101000000 {"url": broken',
        "just-two tokens",
        _line("org,example)/badts", "2024-01-01T00:00",
              url="https://example.org/badts"),
    ]
    (d / "shard0.cdxj").write_text("\n".join(lines) + "\n")
    return str(d)


class TestReadCdxj:
    def test_typed_parse_and_lineage(self, spark, cdxj_dir):
        df = read_cdxj(spark, cdxj_dir)
        clean, bad = split_quarantine(df.persist())
        rows = {r.urlkey + "@" + str(r.ts): r for r in clean.collect()}
        a = rows["org,example)/a@2024-01-15 12:34:56"]
        assert a.url == "https://example.org/a"
        assert a.status == 200 and a.warc_offset == 100
        assert a.warc_len == 2000 and a.digest == "sha1:AAA"
        assert a._file.endswith("shard0.cdxj")
        assert clean.schema["ts"].dataType.typeName() == "timestamp"
        assert clean.schema["warc_offset"].dataType.typeName() == "long"

    def test_quarantine_exactly_the_corrupt_lines(self, spark, cdxj_dir):
        clean, bad = split_quarantine(read_cdxj(spark, cdxj_dir).persist())
        raw = [r._corrupt for r in bad.collect()]
        assert len(raw) == 3
        assert any("broken" in r for r in raw)
        assert any(r == "just-two tokens" for r in raw)
        assert any("badts" in r for r in raw)
        assert clean.count() == 6

    def test_revisit_placeholders_cast_null_not_quarantine(
            self, spark, cdxj_dir):
        clean, _ = split_quarantine(read_cdxj(spark, cdxj_dir).persist())
        rv = clean.where(F.col("urlkey") == "org,example)/revisit").first()
        assert rv is not None
        assert rv.status is None and rv.warc_offset is None

    def test_parse_is_jvm_only(self, spark, cdxj_dir):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            read_cdxj(spark, cdxj_dir).explain("simple")
        assert "Python" not in buf.getvalue()


class TestPlanFetches:
    def test_latest_then_digest_dedup(self, spark, cdxj_dir):
        clean, _ = split_quarantine(read_cdxj(spark, cdxj_dir).persist())
        plan = plan_fetches(clean).collect()
        got = {r.urlkey: r for r in plan}
        # /a keeps only its LATEST capture...
        assert got["org,example)/a"].digest == "sha1:BBB"
        assert got["org,example)/a"].warc_offset == 900
        # ...and /mirror (same digest sha1:BBB) is digest-deduped away:
        # exactly one fetch per distinct payload
        assert "org,example)/mirror" not in got
        # 404 and image captures are excluded; revisit has null offset
        assert set(got) == {"org,example)/a"}

    def test_plan_windows_are_key_partitioned(self, spark, cdxj_dir):
        import contextlib
        import io

        clean, _ = split_quarantine(read_cdxj(spark, cdxj_dir).persist())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_fetches(clean).explain("simple")
        p = buf.getvalue()
        assert "windowspecdefinition(urlkey" in p
        assert "windowspecdefinition(digest" in p
