"""JSONL source: quarantine semantics, gz shards, lineage."""

import gzip
import json
import os

import pytest

from ocrd_calamari_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    split_quarantine,
)

DDL = "doc_id bigint, text string, lang string"


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "hallo welt", "lang": "de"},
    ]
    lines = [json.dumps(r) for r in good]
    lines.append('{"doc_id": 3, "text": "truncated...')     # broken JSON
    lines.append('{"doc_id": "not-a-number", "text": "x"}')  # type violation
    (d / "shard1.jsonl").write_text("\n".join(lines) + "\n")
    gz = [json.dumps({"doc_id": 10 + i, "text": f"doc {i}", "lang": "en"})
          for i in range(3)]
    with gzip.open(d / "shard2.jsonl.gz", "wt") as f:
        f.write("\n".join(gz) + "\n")
    return str(d)


class TestJsonlSource:
    def test_corrupt_lines_are_rows_not_failures(self, spark, shards):
        df = read_jsonl(spark, shards, DDL)
        rows = df.collect()
        assert len(rows) == 7  # 5 good + 2 quarantined
        bad = [r for r in rows if r[CORRUPT_COL] is not None]
        assert len(bad) == 2
        assert any("truncated" in r[CORRUPT_COL] for r in bad)
        # type-violating row: data columns null, raw line preserved
        tv = [r for r in bad if "not-a-number" in r[CORRUPT_COL]]
        assert tv and tv[0].doc_id is None

    def test_split_quarantine(self, spark, shards):
        clean, bad = split_quarantine(read_jsonl(spark, shards, DDL))
        assert clean.count() == 5 and bad.count() == 2
        assert CORRUPT_COL not in clean.columns
        ids = {r.doc_id for r in clean.collect()}
        assert ids == {1, 2, 10, 11, 12}

    def test_gz_shard_reads_and_lineage(self, spark, shards):
        df = read_jsonl(spark, shards, DDL)
        files = {os.path.basename(r._file) for r in df.select("_file").collect()}
        assert files == {"shard1.jsonl", "shard2.jsonl.gz"}

    def test_rejects_missing_or_conflicting_schema(self, spark):
        with pytest.raises(ValueError):
            read_jsonl(spark, "/nonexistent", "")
        with pytest.raises(ValueError):
            read_jsonl(spark, "/nonexistent", f"a bigint, {CORRUPT_COL} string")
