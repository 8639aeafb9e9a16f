"""Link-graph analytics over crawl edges.

PageRank as iterative DataFrame algebra — the canonical "iterative
algorithm the optimizer can't express in one query": a driver-side loop
of fixed, deterministic iterations where each step is pure DataFrame
ops.  Connected components (the other graph op this engine ships) lives
with the dedup family in functions/dedup.py.

Scale shape per iteration: one shuffle (contributions grouped by dst) +
one join of the compact (node, rank) table onto the edge list; edges and
degrees are computed once and persisted.  Only (node, rank) and
(src, dst, deg) tuples ever move — never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank → (node, rank).

    Standard formulation with dangling-mass redistribution: nodes with no
    out-links would leak their rank each step, so their summed rank is
    redistributed uniformly (rank totals stay ≈ 1.0 every iteration —
    asserted in tests against a numpy power-iteration reference).

    Deterministic structure (fixed iteration count, no RNG); floating
    sums are order-dependent across partitions, so parity with the numpy
    reference is allclose, not bitwise — same caveat every distributed
    PageRank carries.

    The RETURNED DataFrame is persisted (its lineage is the full
    iteration chain); the caller owns the unpersist, or clears the cache
    between jobs like bench.py / scripts/check_oracles.py do.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph: empty result, schema intact
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ed = e.join(deg, "src").persist()
    ed.count()  # materialize once; every iteration re-reads it
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).persist()
    dangling = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    for _ in range(iters):
        d_mass = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_s"))
        )
        new_ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_s"), F.lit(0.0))
                       + F.lit(d_mass / n_nodes))
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()  # cut the lineage chain before the next round
        ranks.unpersist()
        ranks = new_ranks
    nodes.unpersist()
    ed.unpersist()
    dangling.unpersist()
    return ranks
