"""Distinct-count sketches over document tables.

Two tiers:

- ``hll_distinct`` — Spark's built-in HyperLogLog++ (`approx_count_distinct`)
  — THE answer at 10^12 rows: fixed-size sketch, map-side mergeable, one
  shuffle of sketch bytes per group.
- ``kmv_distinct_estimate`` — a k-minimum-values sketch built from plain
  DataFrame algebra (xxhash64 → k smallest distinct hashes → estimator
  (k-1)/R where R is the k-th normalized hash).  Deterministic (no RNG),
  so its estimate is exactly reproducible — useful where runs must agree
  bit-for-bit (resume/audit).  The production form is memory-BOUNDED:
  every operator in its plan (hash-distinct, sort-based window rank,
  ≤k-row collect) spills to disk — no per-group state ever exceeds O(k)
  rows in the final aggregate, so a 10^9-distinct group sorts on disk
  instead of OOMing an executor.  ``_kmv_collect_set_form`` keeps the
  original single-aggregate algebra as the equivalence reference
  (audit-scale only: it materializes EVERY distinct hash of a group in
  one collect_set array).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HASH_SPACE = float(1 << 63)  # xxhash64 |values| normalized to [0, 1)


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 rsd: float = 0.02) -> DataFrame:
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def kmv_distinct_estimate(df: DataFrame, group_col: str, value_col: str,
                          k: int = 64, hash_expr: str | None = None,
                          hash_space: float = _HASH_SPACE) -> DataFrame:
    """KMV estimate of |distinct(value_col)| per group.

    estimate = (k-1) / R_k  where R_k is the k-th smallest distinct hash
    mapped to (0,1); if a group has fewer than k distinct values the count
    is exact (size of the hash set).

    ``hash_expr``: SQL template for the value hash ({v} = column), with
    ``hash_space`` = its exclusive upper bound.  Default xxhash64 over
    [0, 2^63); pass the md5-based portable hash (2^60 space) for a
    DuckDB-reproducible estimate (oracle parity).

    Memory bound: the plan is distinct → window row_number ≤ k →
    ≤k-element collect_list.  HashAggregate (the distinct) and the
    window's sort both SPILL; the only array ever built per group holds
    at most k hashes.  Equivalent by construction to the single-pass
    collect_set form (``_kmv_collect_set_form``) — both keep exactly the
    k smallest distinct hashes — pinned by test_functions.py.
    """
    h = _kmv_hash(value_col, hash_expr)
    distinct_h = df.select(F.col(group_col), h.alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    mins = (
        distinct_h.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("_h")).alias("_mins"))
    )
    return _kmv_estimate(mins, group_col, k, hash_space)


def _kmv_hash(value_col: str, hash_expr: str | None):
    if hash_expr is None:
        # sign-bit MASK, not abs(): under ANSI mode abs(Long.MIN_VALUE)
        # throws ArithmeticException — a 2^-64-per-value landmine on a
        # 10^12-row scan.  The mask keeps the hash uniform in [0, 2^63)
        # (matching hash_space) and can never overflow.
        return F.xxhash64(F.col(value_col)).bitwiseAND(
            F.lit((1 << 63) - 1)
        )
    return F.expr(hash_expr.format(v=value_col))


def _kmv_estimate(mins: DataFrame, group_col: str, k: int,
                  hash_space: float) -> DataFrame:
    kth = F.element_at(F.col("_mins"), k)
    exact_n = F.size(F.col("_mins"))
    return mins.select(
        group_col,
        F.when(exact_n < k, exact_n.cast("double"))
        .otherwise(
            F.lit(float(k - 1)) / (kth.cast("double") / F.lit(hash_space))
        )
        .alias("distinct_est"),
        exact_n.alias("observed_k"),
    )


def _kmv_collect_set_form(df: DataFrame, group_col: str, value_col: str,
                          k: int = 64, hash_expr: str | None = None,
                          hash_space: float = _HASH_SPACE) -> DataFrame:
    """Original single-aggregate KMV: collect_set of ALL distinct hashes
    per group, then slice to k.  O(distinct) executor memory per group —
    audit-scale equivalence reference ONLY (see module docstring); the
    bounded ``kmv_distinct_estimate`` is the production form."""
    mins = (
        df.select(F.col(group_col), _kmv_hash(value_col, hash_expr).alias("_h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_mins"))
    )
    return _kmv_estimate(mins, group_col, k, hash_space)


# ---------------------------------------------------------------------------
# Exact heavy hitters in two bounded passes (frequent-items sketch +
# candidate-only exact count).  Reference parity: the corpus-frequency
# reporting the reference's voting pipeline keys on (recognize.py's
# per-page confidence aggregation) generalized to corpus heavy hitters.
# ---------------------------------------------------------------------------
def frequent_items_exact(
    items: DataFrame,
    value_col: str,
    support: float,
    total: int | None = None,
) -> DataFrame:
    """EXACT items with frequency >= ceil(support * N) in two passes,
    never shuffling the full item stream.

    Pass 1 — ``df.stat.freqItems`` (Spark's JVM-side Karp/Misra-Gries
    frequent-items sketch): one shuffle-free scan with O(1/support)
    state per task, merged on the driver into a candidate list of at
    most ~1/support items.  The sketch may return FALSE POSITIVES but
    never false negatives, which is exactly the contract a candidate
    pass needs.

    Pass 2 — exact counts for candidates only: an ``isin`` predicate
    (pushed into the scan) drops every non-candidate before the shuffle,
    so the groupBy ships <= 1/support distinct keys regardless of corpus
    size.  The naive single-pass ``groupBy(value)`` would shuffle every
    distinct item (10^9+ keys at corpus scale); here the full-cardinality
    aggregation never happens.

    ``total`` (N) is taken from the caller when already known (computed
    JVM-side without exploding, e.g. from per-doc gram counts); otherwise
    one count() pass.  Returns (value, n) for n >= ceil(support*N),
    n exact.
    """
    import math

    if total is None:
        total = items.count()
    # ceil over the same double product the oracle's CEIL(s * N) computes
    threshold = int(math.ceil(support * total))
    cands = items.stat.freqItems([value_col], support).collect()[0][0]
    counts = (
        items.where(F.col(value_col).isin(list(cands)))
        .groupBy(value_col)
        .agg(F.count("*").alias("n"))
    )
    return counts.where(F.col("n") >= F.lit(threshold))


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 256,
) -> DataFrame:
    """One-row cross-corpus overlap estimate from bottom-k content hashes
    — the pre-dedup planning measurement ("how much of crawl B is already
    in crawl A?") that decides whether an incremental-dedup pass is worth
    scheduling, WITHOUT joining the two corpora.

    KMV set algebra (Beyer et al., deterministic — no RNG): the k
    smallest distinct 60-bit content hashes of A ∪ B form a uniform
    sample of the union's distinct values, so

        jaccard_bp  = floor(10000 * |{h in bottom-k : h in A AND h in B}| / k)
        union_est   = floor((k-1) * 2^60 / h_k)      (KMV distinct count)

    Scale shape: each side reduces to (hash, flag) rows; the union
    groups by hash with map-side combine (flags are two max() bits) and
    the bottom-k cut plans as TakeOrderedAndProject — per-partition
    top-k, a k-row merge, never a global sort; the corpora themselves
    never join.  Estimate accuracy is pinned in pytest against the exact
    Jaccard on the fixture (+/- the k^-1/2 band).

    Columns: k (rows actually kept), shared, jaccard_bp, union_est —
    all derived from exact integers (one IEEE division each for the two
    estimates), hash-exact vs the same algebra in DuckDB.
    """
    from ocrd_calamari_spark.functions.dedup import PORTABLE_TOKEN_HASH_SQL

    h = PORTABLE_TOKEN_HASH_SQL.format(t=text_col)
    a = df_a.select(F.expr(h).alias("h"), F.lit(1).alias("in_a"),
                    F.lit(0).alias("in_b"))
    b = df_b.select(F.expr(h).alias("h"), F.lit(0).alias("in_a"),
                    F.lit(1).alias("in_b"))
    u = (
        a.unionByName(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(int(k))
    )
    m = float(1 << 60)  # portable hash range: 15 hex chars
    return u.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("shared"),
        F.max("h").alias("_hk"),
    ).select(
        "k",
        "shared",
        F.floor(F.col("shared") * 10000 / F.col("k")).cast("bigint").alias(
            "jaccard_bp"
        ),
        F.floor(
            ((F.col("k") - 1).cast("double") * F.lit(m))
            / F.col("_hk").cast("double")
        ).cast("bigint").alias("union_est"),
    )
