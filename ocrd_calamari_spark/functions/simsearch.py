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
    """Cosine similarity of two array<numeric> columns, JVM-side.

    Zero-norm vectors (the common dead/missing-embedding sentinel) score
    0.0, NOT NaN: Spark orders NaN ABOVE every double, so a raw 0/0
    would rank an all-zero corpus vector FIRST for every query and pass
    any ``>= threshold`` near-dup filter.  0.0 ranks it below all
    positive matches and fails thresholds — and matches the numpy
    scorers' convention (``_np_unit`` below)."""
    d = _norm(a) * _norm(b)
    return F.when(d > 0, _dot(a, b) / d).otherwise(F.lit(0.0))


def _np_unit(M):
    """Row-normalize a numpy matrix; zero rows stay zero (cosine 0.0
    against everything — same convention as the JVM ``cosine``)."""
    import numpy as np

    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0, 1.0, n)


def _topk_rows(scored: DataFrame, k: int, score_col: str, id_col: str,
               query_id_col: str) -> DataFrame:
    """Per-query top-k with the module-wide deterministic tie-break
    (score desc, id asc) — the single definition all six retrieval paths
    share, so ordering/NaN semantics cannot drift between them."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


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
    return _topk_rows(scored, k, "cosine_sim", id_col, query_id_col)


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
    if len(planes) > 63:
        # JVM shiftleft masks the shift count to 6 bits, so shifts 0-63
        # are all valid and aliasing only starts at a 65th plane (shift
        # 64 → masked to 0).  The cap is one stricter on purpose: it
        # keeps bit 63 — the long's sign bit — out of signatures, so
        # they stay non-negative (sorting/printing/partition-key sanity)
        raise ValueError(
            f"lsh_signature packs sign bits into one long: at most 63 "
            f"planes per table (got {len(planes)}); use more tables "
            f"(OR-construction) instead of wider signatures"
        )
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


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k via a vectorized numpy scorer (mapInPandas).

    The scale path for wide vectors / many queries: one BLAS matmul per
    Arrow batch instead of per-row HOF expression evaluation, and a LOCAL
    top-k inside each batch — only k rows per (query, batch) reach the
    final global top-k, so the shuffle is O(k·q·batches), not O(n·q).

    Results match brute_force_topk (same scores up to summation order;
    identical after 4-dp rounding — tested).
    """
    import numpy as np
    import pandas as pd

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = _np_unit(Q)
    qids = qpdf[query_id_col].to_numpy()

    out_schema = f"{query_id_col} long, {id_col} long, cosine_sim double"

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = _np_unit(M)
            sims = Mn @ Qn.T  # (batch, n_queries)
            top = min(k, len(pdf))
            ids = pdf[id_col].to_numpy()
            rows = []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                # local top-k (argpartition then exact sort of the k head)
                idx = np.argpartition(-col, top - 1)[:top]
                idx = idx[np.argsort(-col[idx], kind="stable")]
                for i in idx:
                    rows.append((int(qids[j]), int(ids[i]), float(col[i])))
            yield pd.DataFrame(rows, columns=[query_id_col, id_col, "cosine_sim"])

    scored = corpus.select(id_col, vec_col).mapInPandas(_score, out_schema)
    return _topk_rows(scored, k, "cosine_sim", id_col, query_id_col)


def _sample_train(corpus: DataFrame, id_col: str, vec_col: str,
                  train_rows: int, floor: int):
    """Deterministic bounded training sample → driver numpy matrix.

    Hash-sampled to ~``train_rows`` vectors regardless of corpus size
    (modulus derived from a metadata-cheap count), id-ordered before
    collect so the seeded init — and therefore the whole index — is
    identical across runs/retries.  Shared by ivf_topk and pq_topk so
    sampling fixes cannot drift between the two indexes."""
    import numpy as np

    n_corpus = corpus.count()
    mod = max(1, n_corpus // max(train_rows, floor))
    train = corpus
    if mod > 1:
        train = corpus.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
        )
    X = np.stack(
        train.orderBy(id_col).select(vec_col).toPandas()[vec_col].to_numpy()
    ).astype(np.float64)
    return _np_unit(X)



def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_rows: int = 8192,
    lloyd_iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → assign each vector
    to its nearest centroid (vectorized pandas scorer) → probe only the
    ``n_probe`` nearest cells per query.

    Deterministic end-to-end: centroid init from a seeded RNG over a
    hash-sampled training set, fixed Lloyd iteration count — retries and
    resume reproduce the same index.  At 10^9+ rows the ``_cell`` column
    becomes the table's physical partition key and probes prune the scan.

    Driver-memory bound: the k-means training set is hash-sampled to
    ~``train_rows`` vectors regardless of corpus size — the modulus is
    derived from a count() (metadata-cheap on parquet/Iceberg), so the
    collect is ≈ train_rows × dim × 8 bytes (a few MB), never a corpus
    fraction.  The hash filter keeps the sample deterministic.
    """
    import numpy as np
    import pandas as pd

    # ---- train: bounded hash-sampled subset → driver, Lloyd iterations ----
    Xn = _sample_train(corpus, id_col, vec_col, train_rows, n_centroids)
    rng = np.random.RandomState(seed)
    C = Xn[rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)]
    for _ in range(lloyd_iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(len(C)):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / (np.linalg.norm(m) or 1.0)

    out_schema_assign = f"{id_col} long, _cell int"

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = _np_unit(M)
            cell = np.argmax(Mn @ C.T, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "_cell": cell.astype("int32")}
            )

    cells = corpus.select(id_col, vec_col).mapInPandas(_assign, out_schema_assign)
    indexed = corpus.join(cells, id_col)

    # ---- probe: n_probe nearest cells per query (driver-side, tiny) ----
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = _np_unit(Q)
    probe_rows = []
    order = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]
    for qi, qid in enumerate(qpdf[query_id_col].to_numpy()):
        for cell in order[qi]:
            probe_rows.append((int(qid), int(cell)))
    spark = corpus.sparkSession
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, [query_id_col, "_cell"])
    )
    qdf = F.broadcast(
        queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
    )
    scored = (
        indexed.join(probes, "_cell")
        .join(qdf, query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(
                F.col(vec_col).cast("array<double>"),
                F.col("_qvec").cast("array<double>"),
            ).alias("cosine_sim"),
        )
    )
    return _topk_rows(scored, k, "cosine_sim", id_col, query_id_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_rows: int = 8192,
    lloyd_iters: int = 8,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization ANN top-k (asymmetric distance computation).

    Index = ``m`` small codes per vector (m subspace k-means assignments;
    at dim 64 / m=8 / 16 centroids that is 8 bytes per vector — 32×
    smaller than the float32 embedding).  Queries never touch the raw
    corpus vectors: per query, a lookup table of (subspace × centroid)
    dot products is built once and scoring is a table-gather-sum over the
    codes — THE shape that lets 10^9+ vectors score from an index that
    fits in memory, with the raw embeddings read exactly once at encode
    time.

    Deterministic end-to-end (id-ordered hash-sampled training set
    bounded to ~``train_rows``, farthest-first init, fixed Lloyd
    iterations — no RNG at all) — same resume/retry story as ivf_topk.
    Corpus vectors are L2-normalized
    before encoding so the reconstructed dot product approximates cosine.
    Scores are approximate → register rows-only; quality is quantified by
    the ann_recall query next to lsh/ivf.

    ``rerank``: retrieve the top-``rerank`` candidates by ADC and re-rank
    them with EXACT cosine against the raw vectors (the FAISS-style
    refine step).  Without it, tightly clustered corpora defeat coarse
    codebooks — cluster members quantize near-identically, ADC
    effectively ties, and the "top"-k is arbitrary within the cluster
    (measured on the clustered fixture: recall 0.08 bare → 1.0 with
    rerank=10k; iid 0.42 → 0.92).  The re-rank reads only
    ``rerank × n_queries`` raw vectors via a join — the codes index
    still does the heavy scan.  The per-batch local cut keeps
    max(k, rerank) rows: cutting at k would hand the re-rank a biased
    subset of the ADC top-rerank (this exact bug cost the fixture 0.7
    recall before it was caught).
    """
    import numpy as np
    import pandas as pd

    # ---- train codebooks: bounded sample → driver, per-subspace k-means ----
    Xn = _sample_train(corpus, id_col, vec_col, train_rows, n_centroids)
    dim = Xn.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    n_c = min(n_centroids, len(Xn))

    def _farthest_first(S: "np.ndarray", kk: int) -> "np.ndarray":
        """Deterministic k-means init (farthest-first traversal): random
        init can COLLAPSE subspace centroids onto a few blobs, after
        which ADC retrieves the wrong coarse region entirely (measured
        recall 0.08 on the clustered fixture before this init)."""
        idx = [0]
        d = ((S - S[0]) ** 2).sum(1)
        for _ in range(kk - 1):
            i = int(d.argmax())
            idx.append(i)
            d = np.minimum(d, ((S - S[i]) ** 2).sum(1))
        return S[idx].copy()

    CB = np.zeros((m, n_c, sub))
    for mi in range(m):
        S = Xn[:, mi * sub:(mi + 1) * sub]
        C = _farthest_first(S, n_c)
        for _ in range(lloyd_iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(n_c):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(0)
        CB[mi] = C

    # ---- encode: one corpus pass → m codes per vector (the stored index) --
    def _encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = _np_unit(M)
            codes = np.empty((len(Mn), m), dtype=np.int32)
            for mi in range(m):
                S = Mn[:, mi * sub:(mi + 1) * sub]
                d2 = ((S[:, None, :] - CB[mi][None, :, :]) ** 2).sum(-1)
                codes[:, mi] = d2.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": codes.tolist()}
            )

    codes_df = corpus.select(id_col, vec_col).mapInPandas(
        _encode, f"{id_col} long, codes array<int>"
    )

    # ---- ADC tables: (query, subspace, centroid) dot products ----
    qpdf = queries.select(query_id_col, vec_col).toPandas()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = _np_unit(Q)
    qids = qpdf[query_id_col].to_numpy()
    nq = len(qids)
    T = np.zeros((nq, m, n_c))
    for mi in range(m):
        T[:, mi, :] = Qn[:, mi * sub:(mi + 1) * sub] @ CB[mi].T

    # ---- score: gather-sum over codes, local top-keep per batch ----
    # the local cut must keep max(k, rerank) rows per (query, batch):
    # cutting at k here would hand the re-rank a biased subset of the
    # ADC top-rerank (measured: recall collapsed to the no-rerank level)
    keep = max(k, rerank)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            scores = np.zeros((len(codes), nq))
            for mi in range(m):
                scores += T[:, mi, codes[:, mi]].T
            top = min(keep, len(codes))
            rows = []
            for qi in range(nq):
                col = scores[:, qi]
                idx = np.argpartition(-col, top - 1)[:top]
                idx = idx[np.argsort(-col[idx], kind="stable")]
                for i in idx:
                    rows.append((int(qids[qi]), int(ids[i]), float(col[i])))
            yield pd.DataFrame(
                rows, columns=[query_id_col, id_col, "approx_score"]
            )

    scored = codes_df.mapInPandas(
        _score, f"{query_id_col} long, {id_col} long, approx_score double"
    )
    if not rerank:
        return _topk_rows(scored, k, "approx_score", id_col, query_id_col)
    cand = _topk_rows(scored, keep, "approx_score", id_col,
                      query_id_col).select(query_id_col, id_col)
    vecs = corpus.select(id_col, F.col(vec_col).alias("_cvec"))
    qdf = F.broadcast(
        queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
    )
    exact = cand.join(vecs, id_col).join(qdf, query_id_col).select(
        query_id_col,
        id_col,
        cosine(
            F.col("_cvec").cast("array<double>"),
            F.col("_qvec").cast("array<double>"),
        ).alias("cosine_sim"),
    )
    return _topk_rows(exact, k, "cosine_sim", id_col, query_id_col)


def embedding_near_dupes(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, multi-table LSH-blocked.

    OR-construction over ``n_tables`` independent hyperplane sets: a pair
    is a candidate if it shares a bucket in ANY table.  At cosine 0.98 a
    single 8-plane table has only ~0.6 recall (P[plane agrees] ≈ 0.94 per
    plane); 8 tables lift it to ~0.999.  Candidate pairs form within
    buckets only (quadratic work confined per bucket), then verify with
    exact cosine.  Only (table, bucket, id) rows shuffle — the vectors
    stream through the verify joins, which broadcast the small candidate
    set (AQE).  At 10^9 rows the table-0 bucket becomes the physical
    bucket key.

    The banded table is persisted (the pair self-join reads it twice);
    the RETURNED frame's lineage pins that cache, so long-lived sessions
    should ``spark.catalog.clearCache()`` after consuming the result —
    the bench / oracle harnesses do (same contract as minhash_dedup and
    pagerank).
    """
    from ocrd_calamari_spark.functions.dedup import _bucket_pairs

    banded = df.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_signature(
                        vec_col, _hyperplanes(dim, n_planes, seed + t)
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select(id_col, F.col("tb.tbl").alias("tbl"),
             F.col("tb.bucket").alias("bucket"))
    pairs = _bucket_pairs(banded.persist(), id_col, ["tbl", "bucket"])
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("_vb"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signature,
    score only same-bucket candidates.

    OR-construction over ``n_tables`` independent plane sets — a
    single-table variant misses any neighbor differing in one sign bit
    (round-1 evidence: 38 of 50 expected rows at k=10).  Candidates are
    deduped per (query, id) before scoring, so each pair is scored once.
    At 10^9 rows the table-0 bucket becomes the physical partition/bucket
    key so probes prune to ~n/2^planes rows per table.
    """
    def _table_buckets(df, vcol, *keep):
        """Explode one row per (table, bucket) signature of ``vcol``."""
        tb = F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_signature(
                        vcol, _hyperplanes(dim, n_planes, seed + t)
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        )
        return df.select(*keep, tb.alias("tb")).select(
            *keep, F.col("tb.tbl").alias("tbl"),
            F.col("tb.bucket").alias("_bucket"),
        )

    c = _table_buckets(corpus, vec_col, id_col, vec_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    qb = F.broadcast(_table_buckets(q, "_qvec", query_id_col, "_qvec"))
    # candidate dedup BEFORE scoring: a pair colliding in several tables
    # must be scored once.  _qvec rides the join (identical per query_id,
    # so the dedup stays deterministic) — no second query broadcast.
    cand = (
        c.join(qb, ["tbl", "_bucket"])
        .select(query_id_col, id_col, vec_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col,
        id_col,
        cosine(
            F.col(vec_col).cast("array<double>"),
            F.col("_qvec").cast("array<double>"),
        ).alias("cosine_sim"),
    )
    return _topk_rows(scored, k, "cosine_sim", id_col, query_id_col)
