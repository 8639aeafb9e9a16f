"""Embedding clustering and semantic dedup (SemDeDup-style).

Reference parity: generalizes the reference's ensemble grouping step
(recognize.py:380-430's per-line voter pooling) to corpus-level embedding
clustering — group vectors, then dedup within groups.

Scale + exactness design:

- All arithmetic is INTEGER-EXACT: embeddings quantize once to a 1e-6
  grid (``floor(x * 1e6)`` as BIGINT) and every distance / dot product /
  centroid mean is integer (or floor-of-double on values < 2^53, which
  doubles represent exactly).  There is no floating-point accumulation
  anywhere, so results are bit-identical across engines, partitionings,
  and retries — the property that lets an iterative algorithm carry a
  DuckDB oracle (same trick as the quantized PageRank) and lets a resumed
  job reproduce its pre-kill assignments.
- Lloyd iterations are driver-looped DataFrame algebra (the PageRank
  pattern): centroids ride the plan as k*dim literals (broadcast-sized),
  assignment is a JVM-side fold per centroid, and the update shuffles
  only (cluster, dim-position, partial-sum) rows after map-side partial
  aggregation — k*dim*partitions rows, independent of corpus size.  The
  only driver collects are the k*dim centroid tables per iteration.
- SemDeDup's quadratic verify runs within clusters only (the point of
  clustering first): at production scale k is chosen ~sqrt(n) so
  per-cluster pair counts stay bounded; the cosine threshold test is
  integer (cross-multiplied squares), never a float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCALE = "1e6"  # quantization grid; see module docstring


def quantize_vec(vec_col) -> "F.Column":
    """array<double> -> array<bigint> on the 1e-6 grid (floor)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x * F.expr(_SCALE)).cast("bigint")
    )


def _sq_dist(vec_col, centroid: list) -> "F.Column":
    """Exact integer squared L2 distance to a literal centroid."""
    lits = F.array(*[F.lit(int(v)) for v in centroid]).cast("array<bigint>")
    return F.aggregate(
        F.zip_with(vec_col, lits, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic Lloyd's k-means over quantized embeddings.

    Init: the k lowest-id vectors (deterministic, no RNG).  Each
    iteration assigns every vector to the nearest centroid (exact
    integer distances; ties break on cluster index) and recomputes
    centroids as the elementwise ``floor(sum/count)`` of members —
    empty clusters keep their previous centroid.  Returns
    (id, cluster, dist) for the final assignment; ``dist`` is the exact
    quantized squared distance.
    """
    q = df.select(
        F.col(id_col), quantize_vec(vec_col).alias("_q")
    ).persist()
    try:
        # bounded collect: k rows of dim ints
        init = (
            q.orderBy(id_col).limit(k).collect()
        )
        cents = [list(r._q) for r in init]
        dim = len(cents[0])
        assign = None
        for _ in range(iters):
            best = F.array_sort(
                F.array(*[
                    F.struct(
                        _sq_dist(F.col("_q"), c).alias("dist"),
                        F.lit(j).cast("bigint").alias("cluster"),
                    )
                    for j, c in enumerate(cents)
                ])
            )[0]
            assign = q.select(
                id_col, "_q",
                best["cluster"].alias("cluster"),
                best["dist"].alias("dist"),
            )
            # update: posexplode -> (cluster, pos) partial sums; the
            # shuffle ships k*dim keys after map-side combine.  floor of
            # a < 2^53 integer-valued double is exact.
            upd = (
                assign.select("cluster", F.posexplode("_q").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(
                    F.floor(
                        F.sum("val").cast("double") / F.count("*")
                    ).cast("bigint").alias("val")
                )
                .collect()  # bounded: k*dim rows
            )
            by_cluster = {}
            for r in upd:
                by_cluster.setdefault(r.cluster, [0] * dim)[r.pos] = r.val
            cents = [
                by_cluster.get(j, cents[j]) for j in range(len(cents))
            ]
        return assign.select(id_col, "cluster", "dist")
    finally:
        q.unpersist()


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    tau_num: int = 95,
    tau_den: int = 100,
) -> DataFrame:
    """SemDeDup: cluster embeddings, then drop any vector whose cosine
    similarity to a LOWER-ID vector in the same cluster reaches
    tau_num/tau_den.  (The simple lower-id rule of the SemDeDup paper —
    not a transitive closure; ``connected_components`` covers that
    semantics for pair graphs.)

    The threshold test is integer-exact: ``cos(a,b) >= t`` iff
    ``dot > 0 AND den^2 * dot^2 >= num^2 * |a|^2 * |b|^2`` on quantized
    vectors, cross-multiplied in DECIMAL(38,0) — no float division, no
    sqrt, so the kept-set is reproducible bit-for-bit.

    Returns (id, cluster, kept).
    """
    assign = kmeans_assign(df, id_col, vec_col, k, iters)
    q = df.select(
        F.col(id_col), quantize_vec(vec_col).alias("_q")
    ).withColumn(
        "_n2",
        F.aggregate(
            F.zip_with(F.col("_q"), F.col("_q"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    vecs = assign.join(q, id_col).select(id_col, "cluster", "_q", "_n2")
    a = vecs.select(
        F.col(id_col).alias("_ida"), "cluster",
        F.col("_q").alias("_qa"), F.col("_n2").alias("_na"),
    )
    b = vecs.select(
        F.col(id_col).alias("_idb"), "cluster",
        F.col("_q").alias("_qb"), F.col("_n2").alias("_nb"),
    )
    dot = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    dec = "decimal(38,0)"
    dup_cond = (F.col("_dot") > 0) & (
        F.lit(tau_den * tau_den).cast(dec)
        * F.col("_dot").cast(dec) * F.col("_dot").cast(dec)
        >= F.lit(tau_num * tau_num).cast(dec)
        * F.col("_na").cast(dec) * F.col("_nb").cast(dec)
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .withColumn("_dot", dot)
        .where(dup_cond)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        assign.join(
            dropped.withColumn("_dropped", F.lit(True)), id_col, "left"
        )
        .select(
            id_col, "cluster",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )
