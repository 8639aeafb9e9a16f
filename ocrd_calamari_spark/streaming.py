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


def stateful_url_dedup(pages: DataFrame, n_groups: int = 256) -> DataFrame:
    """Custom stateful streaming operator: cross-micro-batch URL dedup via
    ``applyInPandasWithState`` — first sighting of a url passes through,
    repeats (recrawls within the stream) are dropped.

    State = set of xxhash64(url) per hash-group (bounded groups so state
    partitions evenly; at crawl scale the group count becomes the state
    store's shuffle partition multiple).  State survives restarts through
    the streaming checkpoint.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "url string, warc_ts timestamp, lang string, grp bigint"
    state_schema = "seen array<long>"

    import hashlib

    def _stable_hash(u: str) -> int:
        # process-independent (unlike builtin hash(), which varies with
        # PYTHONHASHSEED) — state must mean the same thing after a restart.
        # Masked to 63 bits: the state column is a signed long; an unmasked
        # top bit silently wraps negative on the state round-trip and the
        # re-computed (positive) hash never matches it again.
        return int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF

    def _dedup(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            h = pdf["url"].map(_stable_hash)
            fresh = ~h.isin(seen)
            seen.update(h[fresh].tolist())
            if fresh.any():
                out = pdf.loc[fresh, ["url", "warc_ts", "lang"]].copy()
                out["grp"] = key[0]
                yield out
        state.update((list(seen),))

    grouped = pages.select(
        "url", "warc_ts", "lang",
        F.pmod(F.xxhash64("url"), F.lit(n_groups)).alias("grp"),
    ).groupBy("grp")
    return grouped.applyInPandasWithState(
        _dedup, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


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
