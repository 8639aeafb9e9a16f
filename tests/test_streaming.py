"""Structured Streaming: extraction kernel under readStream with
exactly-once checkpointing, and windowed event-time aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from ocrd_calamari_spark.gen import gen_pages, write_pages_parquet
from ocrd_calamari_spark.streaming import (
    hourly_host_stats_stream,
    read_pages_stream,
    start_extraction_stream,
)


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory, pages_pdf):
    root = tmp_path_factory.mktemp("stream")
    in_dir = root / "in"
    in_dir.mkdir()
    # two file drops ≈ two crawl deltas
    write_pages_parquet(pages_pdf.iloc[:150], str(in_dir / "drop1.parquet"))
    write_pages_parquet(pages_pdf.iloc[150:], str(in_dir / "drop2.parquet"))
    return {
        "in": str(in_dir),
        "out": str(root / "out"),
        "ckpt": str(root / "ckpt"),
    }


class TestStreamingExtraction:
    def test_available_now_processes_backlog(self, spark, stream_dirs, pages_pdf):
        q = start_extraction_stream(
            spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"]
        )
        q.awaitTermination(120)
        out = spark.read.parquet(stream_dirs["out"])
        assert out.count() == len(pages_pdf)
        assert out.select("url").distinct().count() == len(pages_pdf)

    def test_restart_is_exactly_once(self, spark, stream_dirs, pages_pdf):
        # second run with the same checkpoint: nothing new → no duplicates
        q = start_extraction_stream(
            spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"]
        )
        q.awaitTermination(120)
        out = spark.read.parquet(stream_dirs["out"])
        assert out.count() == len(pages_pdf)

    def test_streaming_matches_batch_kernel(self, spark, stream_dirs, pages_pdf):
        from ocrd_calamari_spark.config import ExtractConfig
        from ocrd_calamari_spark.kernel.extract import extract_batch

        oracle = extract_batch(pages_pdf, ExtractConfig()).set_index("url")
        got = (
            spark.read.parquet(stream_dirs["out"])
            .select("url", "text").toPandas().set_index("url")
        )
        joined = oracle.join(got, lsuffix="_o")
        ok = joined[joined["text_o"].notna()]
        assert (ok["text_o"] == ok["text"]).all()

    def test_windowed_host_stats(self, spark, stream_dirs):
        pages = read_pages_stream(spark, stream_dirs["in"])
        stats = hourly_host_stats_stream(pages)
        q = (
            stats.writeStream.format("memory")
            .queryName("host_stats")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from host_stats").collect()
        assert len(rows) > 0
        hosts = {r.host for r in rows}
        assert any(h.startswith("host00") for h in hosts)  # skewed host present


class TestStatefulDedup:
    def test_cross_batch_url_dedup(self, spark, tmp_path, pages_pdf):
        from ocrd_calamari_spark.streaming import read_pages_stream, stateful_url_dedup
        from ocrd_calamari_spark.gen import write_pages_parquet

        in_dir = tmp_path / "in"; in_dir.mkdir()
        # drop2 re-crawls 50 urls from drop1
        write_pages_parquet(pages_pdf.iloc[:100], str(in_dir / "d1.parquet"))
        write_pages_parquet(pages_pdf.iloc[50:150], str(in_dir / "d2.parquet"))
        pages = read_pages_stream(spark, str(in_dir), max_files_per_trigger=1)
        deduped = stateful_url_dedup(pages, n_groups=16)
        q = (deduped.writeStream.format("memory").queryName("dedup_out")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("select url from dedup_out").collect()
        urls = [r.url for r in rows]
        assert len(urls) == 150            # 200 inputs, 50 dups dropped
        assert len(set(urls)) == 150
