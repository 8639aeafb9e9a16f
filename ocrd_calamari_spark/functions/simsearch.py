"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
JVM-side dot products via zip_with/aggregate, per-query top-k via window.
Scale path: LSH-bucketed variant (random-hyperplane signs) that prunes the
candidate set before exact scoring — the IVF-style recipe for 10^9+ rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query.

    ``queries`` is expected to be small → broadcast crossJoin; the corpus
    side streams through one scan, no shuffle until the final per-query
    top-k (Window over query_id, tiny after filtering to rank ≤ k).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col)
    ).crossJoin(q).select(
        query_id_col,
        id_col,
        cosine(
            F.col(vec_col).cast("array<double>"),
            F.col("_qvec").cast("array<double>"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: deterministic random-hyperplane signatures.
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes as literal arrays (no RNG at
    runtime — resume/retry stability, SURVEY.md §7.3)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col, planes) -> "F.Column":
    """Sign-bit signature of a vector against literal hyperplanes."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(
            _dot(
                v.cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in plane]),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig.bitwiseOR(F.shiftleft(b.cast("long"), i))
    return sig


def embedding_near_dupes(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    LSH-blocked: a pair with cosine ≥ threshold almost surely agrees on a
    hyperplane-sign bucket; candidate pairs form within buckets only
    (quadratic work confined per bucket), verified with exact cosine.
    At 10^9 rows the bucket id becomes the table's physical bucket key.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    sigs = df.select(
        F.col(id_col), F.col(vec_col),
        lsh_signature(vec_col, planes).alias("_bucket"),
    )
    l, r = sigs.alias("l"), sigs.alias("r")
    return (
        l.join(
            r,
            (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(
                F.col(f"l.{vec_col}").cast("array<double>"),
                F.col(f"r.{vec_col}").cast("array<double>"),
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signature,
    score only same-bucket candidates.  At 10^9 rows the bucket column
    becomes the table's physical partition/bucket key so probes prune to
    ~n/2^planes rows."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("_bucket", lsh_signature(vec_col, planes))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
        ).withColumn("_bucket", lsh_signature("_qvec", planes))
    )
    scored = c.join(q, "_bucket").select(
        query_id_col,
        id_col,
        cosine(
            F.col(vec_col).cast("array<double>"),
            F.col("_qvec").cast("array<double>"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
