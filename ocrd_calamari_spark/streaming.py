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


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: event-time session windows with
    a ``gap_seconds`` inactivity gap, via ``applyInPandasWithState`` +
    EventTimeTimeout.

    State per user = the open session (start, last_ts, n_events).  Events
    extend the session or close it and open the next; a session with no
    successor event closes when the watermark passes last_ts + gap (the
    timeout path — without it, final sessions would never emit).  This is
    the stateful-streaming twin of the batch ``sessionize`` query (same
    gap semantics, incremental emission).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events int")
    state_schema = "start long, last long, n int"
    gap_us = gap_seconds * 1_000_000

    def _us(ts) -> int:  # pandas Timestamp → integer microseconds
        return int(pd.Timestamp(ts).value // 1000)

    def _emit(key, start_us, last_us, n):
        return pd.DataFrame(
            {
                "user_id": [key],
                "session_start": [pd.Timestamp(start_us * 1000)],
                "session_end": [pd.Timestamp(last_us * 1000)],
                "n_events": [n],
            }
        )

    def _sessionize(key, pdfs, state):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(key[0], start, last, n)
            return
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for ts in ts_all:
            t = _us(ts)
            if last is None:
                start, last, n = t, t, 1
            elif t - last <= gap_us:
                last, n = max(last, t), n + 1
            else:
                yield _emit(key[0], start, last, n)
                start, last, n = t, t, 1
        if last is not None:
            state.update((start, last, n))
            # close the open session when event time passes last + gap
            state.setTimeoutTimestamp((last + gap_us) // 1000)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
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
