"""Data-layout operators: Z-order (Morton) clustering keys for
multi-dimensional data skipping.

Why this matters at 100 TB: a table laid out by ONE sort column prunes
scans only for predicates on that column; interleaving the bits of two
(or more) dimensions into a Morton key and range-partitioning on it gives
every dimension locality, so parquet row-group / file min-max stats prune
selective predicates on ANY of the interleaved columns.  This is the same
layout step `OPTIMIZE ZORDER BY` performs in lakehouse engines —
expressed here as plain DataFrame ops: a JVM fold builds the key, a
``repartitionByRange`` + ``sortWithinPartitions`` writes the clustered
files.  No Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(col_a, col_b, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton key (a's bit i → position 2i+1, b's → 2i).

    Values are masked to ``bits`` bits first, so out-of-range inputs
    degrade to their low bits instead of overflowing (callers should
    quantize real-valued dimensions into <= ``bits``-bit ranks first).
    One fold over a literal ``sequence(0, bits-1)`` — whole-stage codegen,
    no UDF.  ``2 * bits`` must be <= 63.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    a = (col_a if isinstance(col_a, Column) else F.col(col_a)).cast("long")
    b = (col_b if isinstance(col_b, Column) else F.col(col_b)).cast("long")
    mask = (1 << bits) - 1
    am, bm = a.bitwiseAND(F.lit(mask)), b.bitwiseAND(F.lit(mask))
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        # call_function: the PySpark shiftleft/shiftright wrappers only
        # take a python-int bit count, but the SQL functions accept any
        # integer expression (the fold variable here)
        lambda acc, i: acc
        + F.call_function(
            "shiftleft",
            F.call_function("shiftright", am, i).bitwiseAND(F.lit(1)),
            i * 2 + 1,
        )
        + F.call_function(
            "shiftleft",
            F.call_function("shiftright", bm, i).bitwiseAND(F.lit(1)),
            i * 2,
        ),
    )


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for two-dimensional data skipping: add the Morton
    key, range-partition on it (``n_files`` output splits), sort within
    partitions, and drop the key again — ready for ``.write.parquet``.

    The range exchange samples the key distribution, so skewed dimensions
    still yield balanced files.  Each output file then covers a compact
    Z-curve segment ≈ a small rectangle in (a, b) space, which is what
    makes BOTH columns' min-max footer stats selective.
    """
    if n_files is not None and n_files < 1:
        # a computed n_files of 0 (e.g. bytes // target_size on a tiny
        # table) is a caller bug, not a request for default parallelism
        raise ValueError(f"n_files must be >= 1 when given: {n_files}")
    keyed = df.withColumn("_z", zorder_key(col_a, col_b, bits))
    parts = keyed.repartitionByRange(n_files, "_z") if n_files is not None \
        else keyed.repartitionByRange("_z")
    return parts.sortWithinPartitions("_z").drop("_z")
