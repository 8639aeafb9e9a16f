"""Structured Streaming ingestion for incremental crawls.

The reference is bounded batch (SURVEY.md §2.9 — no streaming operators
anywhere), but the 10^12-row production shape ingests crawl deltas
incrementally.  The same extraction kernel runs unchanged under
``readStream``: mapInPandas is streaming-compatible, and the checkpoint
location gives exactly-once file-source progress tracking (the streaming
twin of the batch manifest in pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.kernel.extract import make_map_fn
from ocrd_calamari_spark.schema import KERNEL_INPUT_COLS, OUTPUT_SCHEMA, PAGES_SCHEMA

# OUTPUT_SCHEMA minus lineage (file-source streaming carries its own
# per-batch progress in the checkpoint; lineage columns stay batch-only).
_STREAM_SCHEMA = "struct<" + ",".join(
    f"{f.name}:{f.dataType.simpleString()}" for f in OUTPUT_SCHEMA.fields
    if f.name != "lineage"
) + ">"


def read_pages_stream(spark: SparkSession, in_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of pages parquet drops (schema fixed, no inference)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )


def extract_stream(pages: DataFrame, cfg: ExtractConfig | None = None) -> DataFrame:
    """Streaming extraction: identical kernel, streaming micro-batches."""
    cfg = cfg or ExtractConfig()
    from pyspark.sql.types import StructType

    out_schema = StructType(
        [f for f in OUTPUT_SCHEMA.fields if f.name != "lineage"]
    )
    return pages.select(*KERNEL_INPUT_COLS).mapInPandas(
        make_map_fn(cfg), out_schema
    )


def start_extraction_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the extraction pipeline as a stream.

    ``available_now=True`` processes the current backlog then stops —
    the incremental-batch deployment mode (run per crawl drop, exactly-once
    via checkpoint).  False = continuous micro-batches.
    """
    out = extract_stream(read_pages_stream(spark, in_dir), cfg)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_host_stats_stream(
    pages: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Windowed streaming aggregation with late-data handling: docs per
    (host, 1h event-time window).  The watermark bounds state for
    out-of-order crawl timestamps."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(F.col("w.start").alias("hour_start"), "host", "n_docs", "bytes_in")
    )
