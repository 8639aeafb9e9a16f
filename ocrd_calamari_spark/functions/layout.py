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


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    n_shards: int = 16,
    n_buckets: int | None = None,
) -> DataFrame:
    """Balance rows into ``n_shards`` near-equal-total-weight output
    shards — the training-shard writer's placement step ("N output files
    of ~equal token counts"), reference position: the sink's flat
    one-file-per-page layout (``recognize.py:360`` save_mets appends
    per-page outputs with no size balancing).

    Serpentine (boustrophedon) round-robin over the weight-DESCENDING
    global rank: rank r (1-based) lands in pass ``(r-1)//N``; even passes
    walk shards 0..N-1, odd passes walk N-1..0, so each pair of passes
    gives every shard one larger-half and one smaller-half row — the
    classic one-pass approximation of LPT bin packing (imbalance bounded
    by one pass's weight spread, vs a full pass's for plain round-robin).

    Scale shape: only (id, weight) pairs ever move — never payloads.  The
    global rank is NOT a global-order window (single task): the ordering
    key ``(max_w - w) * C + (id - min_id)`` (C = id range; ascending key
    == weight desc, id asc) feeds the distributed prefix-sum
    (``packed_offsets`` with weight 1 = exclusive rank): range-bucket →
    tiny subtotal table → within-bucket window.  ``n_buckets`` defaults
    to ``min(max_w + 1, 4096)`` so bucket width stays <= C and a hot
    weight value (many same-length docs) still subdivides across its
    id-dense band instead of funneling into one bucket.  ``max_w * C``
    must fit int64 — at 10^12 dense ids that allows weights to ~9 * 10^6,
    far above any document token count; quantize coarser weights first if
    not.  Rows: ids must be unique; weights non-negative ints.

    Returns ``df`` plus ``rank`` and ``shard`` (both long).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    from ocrd_calamari_spark.functions.text import packed_offsets

    # bounded scalar collect: 3 values (weight/id extremes)
    r = df.agg(
        F.max(weight_col).alias("mw"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ).collect()[0]
    if r["mw"] is None:  # empty input: keep the output schema
        return df.withColumn("rank", F.lit(0).cast("long")).withColumn(
            "shard", F.lit(0).cast("long")
        )
    mw, lo = int(r["mw"]), int(r["lo"])
    span = int(r["hi"]) - lo + 1
    keyed = df.withColumn(
        "_ord",
        ((F.lit(mw) - F.col(weight_col)).cast("long") * F.lit(span)
         + (F.col(id_col) - F.lit(lo)).cast("long")),
    )
    if n_buckets is None:
        n_buckets = max(64, min(mw + 1, 4096))
    ranked = packed_offsets(
        keyed.withColumn("_one", F.lit(1).cast("long")),
        "_ord", "_one", n_buckets=n_buckets,
    ).withColumn("rank", (F.col("_start_offset") + 1).cast("long"))
    r0 = F.col("rank") - 1
    pos = F.pmod(r0, F.lit(n_shards))
    serpent = F.when(
        F.pmod(F.floor(r0 / F.lit(n_shards)), F.lit(2)) == 0, pos
    ).otherwise(F.lit(n_shards - 1) - pos)
    return ranked.withColumn("shard", serpent.cast("long")).drop(
        "_ord", "_one", "_start_offset"
    )


def write_point_lookup_table(
    df: DataFrame,
    path: str,
    bloom_cols: dict[str, int],
    mode: str = "overwrite",
) -> None:
    """Write parquet with Bloom filters on the given columns
    (column -> expected distinct count) — point-lookup data skipping,
    the equality-predicate complement of ``zorder_layout``'s min-max
    range stats (min-max footers cannot prune ``url = X`` on a
    high-cardinality unsorted column; a row-group Bloom filter can,
    at ~1.2 bytes/NDV for 1 % fp).

    At 100 TB this is the difference between a full scan and touching a
    handful of row groups for "fetch this url / did we crawl X"
    workloads: readers (Spark's parquet scan included) consult the
    filter per row group and skip groups whose Bloom excludes the key.
    Size the NDV per ROW GROUP (not per table) — overstating it only
    wastes filter bytes, understating it inflates the fp rate and reads
    more groups.  No reader change needed; files remain plain parquet
    for engines that ignore the filters.
    """
    w = df.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = (
            w.option(f"parquet.bloom.filter.enabled#{col}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
        )
    w.parquet(path)
