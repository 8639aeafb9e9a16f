"""Targeted data selection: hashed n-gram importance weights (DSIR-style).

The selection step real LM-data pipelines run between quality filtering
and mixture sampling: score every corpus document by how much it looks
like a TARGET distribution (e.g. the high-resource language, a curated
reference corpus) relative to the raw SOURCE distribution, then resample
by that weight (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public method).  Reference
position: the ensemble's per-model confidence scoring
(`recognize.py:240-247`) generalized to a corpus-level contrastive
scorer; complements `hashed_linear_quality` (absolute quality) and
`bigram_lm_scores` (absolute fluency) with a *relative* target-vs-source
signal.

Method, re-expressed hash-exactly:

  features  unigrams + truncated bigrams of ``lower(text)`` split on
            single spaces — byte-identical to `hashed_linear_quality`'s
            feature stream, so the two scorers share one tokenization
            contract (and one oracle-SQL shape).
  buckets   portable 60-bit md5 hash (`dedup.py` PORTABLE_TOKEN_HASH_SQL,
            identical in Spark and DuckDB) mod ``n_buckets`` — DSIR's
            hashing trick; no vocabulary is materialized.
  weight    DSIR uses log p_target(b) - log p_source(b) summed over a
            document's feature occurrences.  Transcendental functions are
            not cross-engine bit-stable, so — exactly like BM25's
            log-free rational idf in this repo — the per-bucket weight is
            the *likelihood ratio itself* with add-one smoothing,

                r(b) = ((ct+1) * (NS+B)) / ((cs+1) * (NT+B))

            quantized once per bucket to an integer q(b) =
            floor(r * 1e9 + 0.5) (IEEE multiply/divide are correctly
            rounded, so both engines produce the same double bit-for-bit
            given the same expression shape; the established
            domain_divergence argument).  A document's weight is then the
            exact-integer sum Σ c_doc(b)·q(b) divided by its gram count —
            the MEAN target/source likelihood ratio over its features
            (the arithmetic-mean form of DSIR's geometric-mean weight;
            monotone in the same evidence, order-independent, hash-exact).

Scale shape (the part that must survive 10^12 docs): gram strings are
hashed to buckets map-side and NEVER shuffle — the only exchanges carry
(doc, bucket, count) rows bounded by document length, and the
(bucket, cs, ct) statistics table is at most ``n_buckets`` rows, derived
from the compact per-doc table and broadcast back to it.  Target and
source statistics come from ONE pass over the feature stream (the target
indicator rides the groupBy key), not separate scans of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocrd_calamari_spark.functions.dedup import PORTABLE_TOKEN_HASH_SQL

DEFAULT_BUCKETS = 1024
# quantization scale for the per-bucket likelihood ratio; r <= (NS+B)/(NT+B)
# (ct <= cs always), so q <= ~1e9/target_fraction and c*q sums stay far
# inside BIGINT for any document length
QUANT = "1e9"


def importance_weights(
    df: DataFrame,
    target_predicate: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, n_grams, weight) — mean target/source likelihood ratio per doc.

    ``target_predicate``: SQL boolean over ``df``'s columns selecting the
    target slice (e.g. ``"lang = 'en'"``); the source distribution is the
    whole corpus, per DSIR.  ``weight`` > 1 means the document's hashed
    n-gram profile is target-like; resample with `exact_sample` /
    `weighted_sample` downstream.

    Cache contract: the per-doc bucket table is persisted (three readers:
    bucket stats, totals, and the final join — recomputing it would
    re-explode the corpus each time) and the returned frame's lineage
    pins it; long-lived sessions should ``spark.catalog.clearCache()``
    after consuming the result, as bench.py / check_oracles.py do.
    """
    b = int(n_buckets)
    toks = "`_toks`"
    grams = (
        f"transform(sequence(1, greatest(size({toks}) - 1, 1)), "
        f"i -> concat_ws(' ', slice({toks}, i, 2)))"
    )
    feats = f"concat({toks}, {grams})"
    bucket = f"({PORTABLE_TOKEN_HASH_SQL.format(t='feat')} % {b})"

    occ = (
        df.withColumn("_toks", F.split(F.lower(F.col(text_col)), " "))
        .select(
            F.col(id_col),
            F.expr(target_predicate).cast("boolean").alias("_is_t"),
            F.explode(F.expr(feats)).alias("feat"),
        )
        .select(id_col, "_is_t", F.expr(bucket).alias("bucket"))
    )
    # ONE shuffle of compact (id, bucket, count) rows; the target flag is
    # functionally dependent on id, so carrying it in the key is free
    docb = occ.groupBy(id_col, "_is_t", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    docb = docb.persist()
    bstats = docb.groupBy("bucket").agg(
        F.sum("c").alias("cs"),
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
    )
    tot = bstats.agg(
        F.sum("cs").alias("ns"), F.sum("ct").alias("nt")
    )
    weights = bstats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"floor(((cast((ct + 1) as double) * cast((ns + {b}) as double))"
            f" / (cast((cs + 1) as double) * cast((nt + {b}) as double)))"
            f" * {QUANT} + 5e-1)"
        ).alias("q"),
    )
    out = (
        docb.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("q")).cast("bigint").alias("_score_q"),
        )
        .select(
            id_col,
            "n_grams",
            (
                (F.col("_score_q").cast("double") / F.expr(QUANT))
                / F.col("n_grams").cast("double")
            ).alias("weight"),
        )
    )
    return out
