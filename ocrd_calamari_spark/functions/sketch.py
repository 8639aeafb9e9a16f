"""Distinct-count sketches over document tables.

Two tiers:

- ``hll_distinct`` — Spark's built-in HyperLogLog++ (`approx_count_distinct`)
  — THE answer at 10^12 rows: fixed-size sketch, map-side mergeable, one
  shuffle of sketch bytes per group.
- ``kmv_distinct_estimate`` — a k-minimum-values sketch built from plain
  DataFrame algebra (xxhash64 → k smallest distinct hashes → estimator
  (k-1)/R where R is the k-th normalized hash).  Deterministic (no RNG),
  so its estimate is exactly reproducible — useful where runs must agree
  bit-for-bit (resume/audit).  The collect_set form below is exact-memory
  per group; the production form replaces it with a partial top-k
  (aggregate over sorted partial arrays), same algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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
    """
    if hash_expr is None:
        h = F.abs(F.xxhash64(F.col(value_col)))
    else:
        h = F.expr(hash_expr.format(v=value_col))
    kth = F.element_at(F.col("_mins"), k)
    exact_n = F.size(F.col("_mins"))
    return (
        df.select(F.col(group_col), h.alias("_h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_mins"))
        .select(
            group_col,
            F.when(exact_n < k, exact_n.cast("double"))
            .otherwise(
                F.lit(float(k - 1)) / (kth.cast("double") / F.lit(hash_space))
            )
            .alias("distinct_est"),
            exact_n.alias("observed_k"),
        )
    )
