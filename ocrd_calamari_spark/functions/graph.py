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


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_iters: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum-hop distance from a seed set → (node, depth) — the
    crawl-scheduling primitive (frontier expansion: "everything within k
    clicks of the seeds"), reference position: the workspace's page
    enumeration is a flat scan (`recognize.py:97` processes an already
    -resolved page list); hop-bounded discovery is the web-native
    generalization a crawl pipeline needs.

    Iterative frontier joins, driver-looped like :func:`pagerank`: each
    round joins the CURRENT frontier (only just-discovered nodes, not
    the whole visited set) onto the edge list, anti-joins the visited
    set, and tags survivors with the round number.  BFS invariant: a
    node's first discovery round IS its minimum hop distance, so no
    per-node min aggregation is ever needed.

    Scale shape per iteration: one equi-join frontier⋈edges (the
    frontier is typically small → AQE broadcasts it) + one anti-join
    against visited; only (node) / (node, depth) tuples move — never
    payloads.  Early-exits when the frontier drains (deterministic:
    emptiness is a property of the graph, not the partitioning).
    Unreachable nodes are absent from the result, matching the
    recursive-CTE oracle.

    Like :func:`pagerank`, the RETURNED DataFrame is persisted (its
    lineage is the whole frontier chain); the caller owns the unpersist,
    or clears the cache between jobs like bench.py / check_oracles.py.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .persist()
    )
    dist.count()
    frontier = dist.select("node")
    prev = None  # previous round's persisted frontier base
    for i in range(1, max_iters + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("depth", F.lit(i))
            .persist()
        )
        grew = nxt.count() > 0
        if prev is not None:
            prev.unpersist()
        if not grew:
            nxt.unpersist()
            prev = None
            break
        new_dist = dist.union(nxt).persist()
        new_dist.count()  # cut lineage before the next round
        dist.unpersist()
        dist = new_dist
        frontier = nxt.select("node")
        prev = nxt
    if prev is not None:
        prev.unpersist()
    e.unpersist()
    return dist


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


def hits(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration UNNORMALIZED HITS → (node, authority, hub) — the
    other classic link-analysis score (Kleinberg): authorities are
    pointed at by good hubs, hubs point at good authorities.  Reference
    position: the voter's mutual-reinforcement scoring
    (`recognize.py:305-311` weighs models by agreement) lifted to the
    link graph.

    Dropping per-iteration normalization makes every score an INTEGER
    (init hub=1; each step is pure sums over in-/out-neighborhoods), so
    results are hash-exact across engines and partitionings — no float
    summation-order noise at all.  The trade: magnitudes grow ~(λ_max)^k
    per round, so the iteration count must stay small enough that
    max_score fits int64 (k=3 on a web-scale graph with degree sums
    ≤ 10^6 is ≤ ~10^18 — at the edge; normalize offline from the raw
    integers when ranking is all you need, since ranking is invariant
    to the scale factor).  A guard raises if any score would overflow.

    Scale shape: per iteration, two equi-joins shipping only
    (node, score) pairs against the persisted edge table, partial-agg
    sums — identical economics to ``pagerank``; per-iteration persist +
    count cuts the lineage chain.  Score tables stay SPARSE through the
    loop (a node absent from the table has score 0 — zero scores
    contribute nothing to neighborhood sums, so dropping the rows is
    exact): the earlier dense form left-joined the full node set back in
    TWICE per iteration just to carry explicit zeros; the sparse form
    zero-fills against the node set exactly once, at the end.  The
    RETURNED DataFrame is persisted; caller owns the unpersist
    (bench/check_oracles clear the cache).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    e.count()
    # hub init = 1 for every node WITH an outgoing edge (sparse form of
    # the all-ones vector: nodes without out-edges contribute nothing
    # to any authority sum in round 1)
    hub = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1).cast("bigint").alias("hub")
    ).persist()
    auth = None
    try:
        for _ in range(iters):
            new_auth = (
                e.join(hub, e["src"] == hub["node"])
                .groupBy("dst")
                .agg(F.sum("hub").cast("bigint").alias("authority"))
                .select(F.col("dst").alias("node"), "authority")
                .persist()
            )
            new_auth.count()
            new_hub = (
                e.join(new_auth, e["dst"] == new_auth["node"])
                .groupBy("src")
                .agg(F.sum("authority").cast("bigint").alias("hub"))
                .select(F.col("src").alias("node"), "hub")
                .persist()
            )
            # one agg both materializes the persisted table AND fetches
            # the overflow-guard max — merging the former count() with a
            # separate max pass saved a full scan per iteration
            m = new_hub.agg(F.max("hub").alias("mh")).collect()[0]["mh"]
            if m is not None and m > (1 << 61):
                raise OverflowError(
                    f"HITS scores approaching int64 range after an "
                    f"iteration (max hub {m}); reduce iters"
                )
            hub.unpersist()
            if auth is not None:
                auth.unpersist()
            hub, auth = new_hub, new_auth
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        out = (
            nodes.join(auth, "node", "left")
            .join(hub, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("authority"), F.lit(0)).cast("bigint")
                .alias("authority"),
                F.coalesce(F.col("hub"), F.lit(0)).cast("bigint")
                .alias("hub"),
            )
            .persist()
        )
        out.count()  # materialized -> the iteration caches can go
        hub.unpersist()
        auth.unpersist()
        return out
    finally:
        e.unpersist()
