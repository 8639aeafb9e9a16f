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


def stateful_url_dedup(pages: DataFrame, n_groups: int = 256,
                       ttl_seconds: float | None = None,
                       _clock=None) -> DataFrame:
    """Custom stateful streaming operator: cross-micro-batch URL dedup via
    ``applyInPandasWithState`` — first sighting of a url passes through,
    repeats (recrawls within the stream) are dropped.

    State = (hash, first-seen processing ts) of xxhash64(url) per
    hash-group (bounded groups so state partitions evenly; at crawl scale
    the group count becomes the state store's shuffle partition multiple).
    State survives restarts through the streaming checkpoint.

    ``ttl_seconds`` bounds the state over an UNBOUNDED crawl stream: with
    the default ``None`` the seen-set grows with every distinct url ever
    observed (exact forever-dedup — the state store eventually becomes the
    corpus).  With a TTL, a url is emitted at most once per ``ttl_seconds``
    recrawl window: entries older than the window are evicted on every
    group invocation.  Emitting does NOT refresh the window — a url that
    keeps recrawling re-emits once per window rather than being suppressed
    indefinitely.

    Eviction is data-path only, deliberately: the group key is a bounded
    url-hash bucket (``n_groups`` of them), so under any live crawl every
    group keeps receiving rows and evicts every micro-batch — total state
    ≤ urls-per-window + one stale window on a group that stops receiving
    data entirely (impossible under uniform hashing unless the stream
    itself stops).  A ``ProcessingTimeTimeout`` sweep was MEASURED and
    rejected: any registered processing-time timer makes
    ``trigger(availableNow=True)`` queries spin empty micro-batches
    without terminating (~1/s, even with no expired timer), breaking the
    run-per-crawl-drop deployment mode this pipeline uses.

    ``_clock``: test hook — a picklable ``() -> float`` epoch-seconds
    source shipped to the workers inside the state function's closure
    (processing-time eviction can't be driven deterministically from the
    driver otherwise).  Default: ``time.time``.

    State-schema note: this version stores (seen, first_ts) ARRAYS (the
    earlier schema was the bare seen array).  Spark's state-store schema
    check rejects restarting an OLD checkpoint under the new schema —
    drain the old query and discard its checkpoint (the state is a dedup
    cache, not data; re-seeding costs one recrawl window of duplicates).
    Same migration story as sessionize_stream's schema note below.
    """
    import time

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "url string, warc_ts timestamp, lang string, grp bigint"
    state_schema = "seen array<long>, first_ts array<long>"
    ttl_ms = None if ttl_seconds is None else max(1, int(ttl_seconds * 1000))
    now_fn = _clock if _clock is not None else time.time

    import hashlib

    def _stable_hash(u: str) -> int:
        # process-independent (unlike builtin hash(), which varies with
        # PYTHONHASHSEED) — state must mean the same thing after a restart.
        # Masked to 63 bits: the state column is a signed long; an unmasked
        # top bit silently wraps negative on the state round-trip and the
        # re-computed (positive) hash never matches it again.
        return int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF

    def _dedup(key, pdfs, state):
        now_ms = int(now_fn() * 1000)
        if state.exists:
            hashes, stamps = state.get
            if ttl_ms is not None:
                cutoff = now_ms - ttl_ms
                seen = {h: t for h, t in zip(hashes, stamps) if t >= cutoff}
            else:
                seen = dict(zip(hashes, stamps))
        else:
            seen = {}
        for pdf in pdfs:
            h = pdf["url"].map(_stable_hash)
            # first occurrence wins within the batch too (~duplicated),
            # not just across batches
            fresh = ~h.isin(seen.keys()) & ~h.duplicated()
            for hv in h[fresh]:
                seen[hv] = now_ms
            if fresh.any():
                out = pdf.loc[fresh, ["url", "warc_ts", "lang"]].copy()
                out["grp"] = key[0]
                yield out
        if seen:
            state.update((list(seen.keys()), list(seen.values())))
        elif state.exists:
            state.remove()

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

    State per user = ALL sessions not yet watermark-final (arrays of
    (start, last, n)).  Each call interval-merges buffered sessions with
    the batch's events (gap rule on sorted starts), so out-of-order but
    within-watermark events extend a session backward or form their own
    earlier session instead of being folded into the newest one.  A
    session is emitted exactly when ``last + gap`` falls behind the
    watermark — either on a data batch or through the event-time timeout
    (without which trailing sessions would never emit).  This is the
    stateful-streaming twin of the batch ``sessionize`` query: identical
    gap semantics for every event the watermark admits.

    State-schema note: this version stores ARRAYS of open sessions (the
    earlier single-session scalar schema folded late events incorrectly).
    Spark's state-store schema check rejects restarting an OLD checkpoint
    under the new schema — discard the checkpoint and reprocess (or drain
    the old query first); there is no in-place migration.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("user_id bigint, session_start timestamp, "
                  "session_end timestamp, n_events int")
    state_schema = "starts array<long>, lasts array<long>, ns array<int>"
    gap_us = gap_seconds * 1_000_000

    def _emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key] * len(sessions),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _ in sessions],
                "session_end": [pd.Timestamp(l * 1000) for _, l, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def _split_by_watermark(sessions, state, key):
        """Emit watermark-final sessions; keep the rest in state."""
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        open_ = [s for s in sessions if s[1] + gap_us >= wm_us]
        if open_:
            state.update((
                [s for s, _, _ in open_],
                [l for _, l, _ in open_],
                [n for _, _, n in open_],
            ))
            # wake when the earliest open session becomes final
            # (must be strictly beyond the current watermark)
            next_ms = min(l for _, l, _ in open_) // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(max(next_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        if closed:
            yield _emit(key, closed)

    def _sessionize(key, pdfs, state):
        sessions = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns)]
        if not state.hasTimedOut:
            # drop NULL timestamps explicitly: the watermark predicate
            # does not filter them, and NaT would otherwise become the
            # -2^63 ns sentinel — a below-any-watermark "session" whose
            # emit overflows the datetime range and kills the stream
            ts_all = (
                pd.concat([pdf["ts"] for pdf in pdfs])
                .dropna().sort_values()
            )
            for ts in ts_all:
                t = int(pd.Timestamp(ts).value // 1000)
                sessions.append([t, t, 1])
        # interval-merge by gap over start-sorted sessions
        sessions.sort(key=lambda s: (s[0], s[1]))
        merged = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        yield from _split_by_watermark(merged, state, key[0])

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
