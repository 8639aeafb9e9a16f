"""Model-based quality filtering: a hashed-feature linear classifier.

The component real web-corpus pipelines put between heuristic quality
scores and the training mix: a fastText-style linear model over hashed
unigram+bigram bag-of-words features (fastText's hashing trick — a
feature's weight lives at ``H(feature) mod B``; no vocabulary is ever
materialized).  Reference position: the ensemble's per-model confidence
scoring (`recognize.py:240-247` reads per-char probabilities off a
trained model) generalized to a per-DOCUMENT trained scorer.

Engine shape: the score is a pure per-row JVM expression — tokenize,
build bigrams, fold hash-derived weights with ``aggregate`` — so scoring
is a ZERO-SHUFFLE map over the corpus scan at any scale; whole-stage
codegen keeps it off the Python path entirely.  With real learned
weights the same plan holds: weights become a broadcast map (the model is
MBs for 10^6 hashed bins) applied inside the same fold.

This module's deterministic stand-in derives each weight from the
portable 60-bit md5 hash (`dedup.py:738` — identical in Spark and
DuckDB), mapped to an integer in [-1000, 1000]; scores are therefore
exact BIGINTs and the DuckDB oracle is hash-exact, while the plan is
byte-for-byte the one a learned model would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocrd_calamari_spark.functions.dedup import PORTABLE_TOKEN_HASH_SQL

# weight(feature) = H(feature) mod 2001 - 1000  ∈ [-1000, 1000]
WEIGHT_BINS = 2001
WEIGHT_SHIFT = 1000


def hashed_linear_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: int = 0,
) -> DataFrame:
    """(id, n_feats, score, keep) — linear classifier score per document.

    Features: single-space unigrams + bigrams of ``lower(text)`` (same
    tokenization as ``word_ngrams`` / heavy_hitters, so the oracle's
    ``string_split`` mirrors it exactly); a 1-token document contributes
    its truncated bigram like the shingle helpers do.  ``keep`` is the
    sign of ``bias + Σ w(f)`` — the accept/reject decision a quality
    classifier feeds into the pipeline's filter stage.
    """
    w = (
        f"({PORTABLE_TOKEN_HASH_SQL.format(t='f')} % {WEIGHT_BINS}"
        f" - {WEIGHT_SHIFT})"
    )
    # materialize the token array ONCE — referencing split(...) inside
    # the per-element lambdas would re-split the text per element
    # (quadratic in document length)
    toks = "`_toks`"
    grams = (
        f"transform(sequence(1, greatest(size({toks}) - 1, 1)), "
        f"i -> concat_ws(' ', slice({toks}, i, 2)))"
    )
    feats = f"concat({toks}, {grams})"
    return (
        df.withColumn(
            "_toks", F.split(F.lower(F.col(text_col)), " ")
        )
        .select(
            F.col(id_col),
            F.expr(f"size({feats})").alias("n_feats"),
            F.expr(
                f"cast({int(bias)} + aggregate({feats}, cast(0 as bigint), "
                f"(acc, f) -> acc + {w}) as bigint)"
            ).alias("score"),
        )
        .withColumn("keep", F.when(F.col("score") >= 0, 1).otherwise(0))
    )
