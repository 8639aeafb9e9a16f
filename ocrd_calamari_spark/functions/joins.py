"""Join shapes Spark's optimizer has no native operator for: as-of join
and range join — re-expressed as compositions of built-in DataFrame ops
(no Python in the loop, one shuffle each).

Reference analogue: the engine's keyed re-association family (J1,
SURVEY.md §2.5); these extend it to the temporal/interval keys a
training-data pipeline needs (sessionizing clicks against purchases,
binning metrics into band dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, attach
    ``value_cols`` from the right row with the greatest ``right_ts`` ≤
    ``left_ts`` within the same key (null if none) — pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics.

    Plan: union both sides tagged, ONE shuffle on the key, then a running
    ``last(ignorenulls)`` window ordered by (ts, side) — right rows sort
    before left rows at equal ts, which is exactly the inclusive bound.
    No join node at all, so there is no skew-amplifying key × key blowup:
    cost is a sort within each key partition.  At 10^12 rows both inputs
    should be bucketed by the key so the union inherits co-partitioning.

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (the same requirement DuckDB's ASOF JOIN has for determinism).

    The matched right row is carried as ONE struct (null only on left
    rows), so the window's ``last(ignorenulls)`` is row-atomic: a right
    row with NULL value columns matches as that whole row — never a
    mix of fields from different right rows.
    """
    reserved = {"_ts", "_side", "_match"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join uses working columns {sorted(reserved)}; rename "
            f"the clashing left column(s) {sorted(clash)} first"
        )
    out_cols = {f"{prefix}ts", *(f"{prefix}{c}" for c in value_cols)}
    clash = out_cols & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join would overwrite existing left column(s) "
            f"{sorted(clash)}; pass a different prefix"
        )
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_ts"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_match"),
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_match", F.last("_match", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    out = out.withColumn(f"{prefix}ts", F.col("_match.ts"))
    for c in value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_match.{c}"))
    return out.drop("_ts", "_side", "_match")


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join facts to [lo, hi) interval rows without a theta join.

    A plain ``value BETWEEN lo AND hi`` join plans as BroadcastNestedLoop
    (fine for a broadcastable dim, quadratic death for big-big).  This
    bucketizes: each range row explodes to the fixed-width buckets it
    covers, facts map to their single bucket, and the join is an EQUI join
    on the bucket plus the residual predicate — shuffle-partitionable,
    skew-safe for bounded-length intervals.  Each (fact, range) pair meets
    in exactly one bucket (the fact's), so no post-join dedup is needed.
    """
    w = float(bucket_width)
    if not w > 0.0:  # also rejects NaN
        raise ValueError(
            f"bucket_width must be > 0: {bucket_width!r} (division by a "
            f"non-positive width yields Infinity/NaN buckets, silently "
            f"empty join output)"
        )
    f = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    # drop degenerate intervals BEFORE the explode: hi <= lo can never
    # match any fact ([lo, hi) is empty), but a malformed hi << lo row
    # would make F.sequence default to step -1 and explode a huge
    # DESCENDING bucket array (per-row OOM risk).  With hi > lo the
    # sequence bounds are provably ascending (ceil(hi/w)-1 >= floor(lo/w)).
    r = ranges.where(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                (F.ceil(F.col(hi_col) / F.lit(w)) - 1).cast("long"),
            )
        ),
    )
    return f.join(r, "_bucket").where(
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    ).drop("_bucket")


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives heavy-hitter keys: the skewed (fact) side
    gets a salt in [0, n_salts), the dim side is replicated once per salt
    value, and the join key becomes (key, salt) — a single hot key spreads
    across ``n_salts`` shuffle partitions instead of landing on one task.

    The salt is ``rand``-derived: the JOIN RESULT is salt-invariant (every
    fact row still meets its dim row exactly once, in whichever salt
    partition the fact landed), so nondeterministic salting is safe —
    unlike salting an aggregation, where the merge step must re-combine.

    When to use vs AQE: AQE's skew-join splitting already handles most
    sort-merge skew at runtime; explicit salting remains the tool when the
    hot key must be spread BEFORE a downstream stage pins the partitioning
    (e.g. a groupBy on the same key right after the join) or when the
    build side is replicable but too big to broadcast whole.  The dim is
    replicated ``n_salts``× — only salt joins whose right side is
    dim-sized.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1: {n_salts}")
    # The salting construction is only salt-invariant when every OUTPUT
    # row is driven by a fact row (each fact carries exactly one salt).
    # A right/full join would emit one null-padded row per UNMATCHED dim
    # REPLICA (n_salts spurious rows per unmatched dim key), and
    # semi/anti joins can't produce the two-sided projection below.
    allowed = {"inner", "left", "left_outer", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: "
            f"the dim side is replicated {n_salts}x, so right/full "
            f"outer would duplicate unmatched dim rows per salt replica"
        )
    f = skewed.withColumn(
        "_salt", (F.rand(42) * n_salts).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (f[left_key] == d[right_key]) & (f["_salt"] == d["_salt"])
    # explicit two-sided projection: drop("_salt") is ambiguous here
    return f.join(d, cond, how).select(
        *[f[c] for c in skewed.columns], *[d[c] for c in dim.columns]
    )


def write_bucketed_table(df: DataFrame, name: str, path: str,
                         n_buckets: int, key: str,
                         sort_by: str | None = None) -> None:
    """Persist ``df`` as a Spark BUCKETED table (``bucketBy`` +
    ``sortBy`` + ``saveAsTable``, external at ``path``) — the co-located
    join layout for repeated big-big joins on ``key``.

    Two tables bucketed the same way join with ZERO Exchange nodes: each
    task reads bucket i of both sides (SortMergeJoin over pre-sorted
    bucket files — at 100 TB that removes the full shuffle of BOTH fact
    tables per join, the dominant cost of repeated joins on the same
    key; plan-asserted Exchange-free in
    tests/test_plans.py::TestBucketedJoin).  This is the query-side
    complement of ``pipeline.write_bucketed_staging`` (a partitionBy
    layout for chunk PRUNING): bucketBy hashes rows INTO a fixed file
    count per partition for join co-location, partitionBy creates a
    directory per value for scan pruning.

    Spark bucketing requires the catalog (``spark.table(name)``) — plain
    ``spark.read.parquet(path)`` ignores bucket metadata and re-shuffles.
    """
    writer = df.write.bucketBy(n_buckets, key)
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    (writer.option("path", path).mode("overwrite").saveAsTable(name))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-OVERLAP join of two interval tables ([lo, hi), half-open:
    overlap iff ``l.lo < r.hi AND r.lo < l.hi``) without a theta join —
    the two-sided sibling of ``range_bucket_join`` (activity spans x
    outage windows, sessions x incidents, crawl windows x deploys).

    Both sides explode to the fixed-width buckets they cover and meet in
    an EQUI join on the bucket.  An overlapping pair shares EVERY bucket
    of its intersection, so it would duplicate; instead of a distinct
    over the (potentially wide) output, each pair is emitted only in the
    FIRST bucket both cover — ``bucket == greatest(floor(l.lo/w),
    floor(r.lo/w))``, a residual predicate — making the join
    exactly-once by construction.  Shuffle-partitionable and skew-safe
    for bounded interval lengths; size ``bucket_width`` near the typical
    interval length so explode fan-out stays O(1) per row.

    Degenerate intervals (hi <= lo) are dropped before the explode on
    BOTH sides (empty by the half-open definition; and a malformed
    hi << lo would explode a huge descending bucket sequence).  Column
    names must be disjoint across the two inputs.
    """
    w = float(bucket_width)
    if not w > 0.0:
        raise ValueError(f"bucket_width must be > 0: {bucket_width!r}")

    def burst(df, lo, hi):
        return df.where(F.col(hi) > F.col(lo)).withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("long"),
                    (F.ceil(F.col(hi) / F.lit(w)) - 1).cast("long"),
                )
            ),
        )
    l = burst(left, left_lo, left_hi)
    r = burst(right, right_lo, right_hi)
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / F.lit(w)).cast("long"),
        F.floor(F.col(right_lo) / F.lit(w)).cast("long"),
    )
    return l.join(r, "_bucket").where(
        (F.col(left_lo) < F.col(right_hi))
        & (F.col(right_lo) < F.col(left_hi))
        & (F.col("_bucket") == first_shared)
    ).drop("_bucket")
