"""Text analysis over document tables — language ID, quality scoring,
token counting, fingerprinting.

All functions return JVM-side Column expressions (whole-stage codegen, no
Python in the loop).  Where a function is used in a driver-harness query
with a DuckDB oracle, the expression is written in the shared
ANSI-SQL subset both engines evaluate identically (length/replace/
greatest/case — no regexp, whose dialects differ).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# Token counting.  The oracle-parity variant assumes single-space-separated
# text (true for the synthetic documents table); the robust variant handles
# arbitrary whitespace.
# ---------------------------------------------------------------------------
def token_count_sql(col: str = "text") -> str:
    """Shared Spark/DuckDB SQL: token count for single-space-separated text."""
    return f"length({col}) - length(replace({col}, ' ', '')) + 1"


def token_count(col) -> Column:
    """Robust token count (Spark-side): split on whitespace runs.

    Empty / whitespace-only text counts 0 (``split('')`` returns [''],
    size 1 — the raw expression over-counts blank docs by one, which
    would let them through min-length filters)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# ---------------------------------------------------------------------------
# Quality scoring: length, punctuation density, mean token length.
# Built only from length/replace arithmetic → byte-identical across engines.
# ---------------------------------------------------------------------------
def _count_char_sql(col: str, ch: str) -> str:
    return f"length({col}) - length(replace({col}, '{ch}', ''))"


def quality_score_sql(col: str = "text") -> str:
    """Shared SQL: crude quality in [0,~1.5]: sentence-punct density +
    capped mean token length signal + length signal."""
    n_tok = token_count_sql(col)
    n_punct = f"({_count_char_sql(col, '.')} + {_count_char_sql(col, '!')} + {_count_char_sql(col, '?')})"
    # Cross-engine float parity: (1) e-notation literals (4e-1, not 0.4) —
    # Spark parses plain decimal literals as DECIMAL and would compute this
    # exactly while DuckDB computes in doubles; e-notation forces DOUBLE in
    # both, making every op IEEE-identical.  (2) floor(x*1e4+5e-1)/1e4
    # instead of round(): round() half-boundary modes differ across engines.
    score = (
        f"  least(1e0, length({col}) / 5e2) * 4e-1"
        f"+ least(1e0, {n_punct} * 1e1 / ({n_tok})) * 3e-1"
        f"+ least(1e0, (length({col}) * 1e0 / ({n_tok})) / 8e0) * 3e-1"
    )
    return f"cast(floor(({score}) * 1e4 + 5e-1) / 1e4 as double)"


def quality_score(col: str = "text") -> Column:
    return F.expr(quality_score_sql(col))


# ---------------------------------------------------------------------------
# Language ID: stopword-marker hit counting, argmax over language profiles.
# The n-gram-heuristic analogue of the reference's per-language model
# selection (MODEL env, test/test_recognize.py:13).
# ---------------------------------------------------------------------------
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " is "],
    "de": [" der ", " die ", " und ", " ist "],
    "fr": [" le ", " les ", " des ", " est "],
}


def _marker_hits_sql(col: str, marker: str) -> str:
    pad = f"concat(' ', {col}, ' ')"
    return (
        f"(length({pad}) - length(replace({pad}, '{marker}', '')))"
        f" / {len(marker)}"
    )


def lang_score_sql(col: str, lang: str) -> str:
    parts = " + ".join(_marker_hits_sql(col, m) for m in _LANG_MARKERS[lang])
    return f"({parts})"


def lang_id_sql(col: str = "text") -> str:
    """Shared SQL: argmax language over marker-hit scores ('und' = unknown)."""
    en, de, fr = (lang_score_sql(col, l) for l in ("en", "de", "fr"))
    return (
        f"case"
        f" when {en} >= {de} and {en} >= {fr} and {en} > 0 then 'en'"
        f" when {de} >= {fr} and {de} > 0 then 'de'"
        f" when {fr} > 0 then 'fr'"
        f" else 'und' end"
    )


def lang_id(col: str = "text") -> Column:
    return F.expr(lang_id_sql(col))


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------
def fingerprint(col) -> Column:
    """Stable 64-bit hex fingerprint (md5 prefix) — exact-dup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("binary")), 1, 16)


def fingerprint_sql_duckdb(col: str = "text") -> str:
    return f"substr(md5({col}), 1, 16)"


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
# BPE-ish pre-tokenization: letter runs, single digits, single punctuation
# marks — the GPT-2-style pre-split shape (letters | digits | symbols),
# whitespace elided.  A real BPE merge table would refine these further;
# this is the token-budget estimator variant.


def bpe_ish_token_count(col) -> Column:
    """Approximate LLM-token count via BPE-style pre-tokenization regex
    (JVM regexp_count — no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("bigint")


# ---------------------------------------------------------------------------
# Repetition signals (Gopher/C4-style quality filters)
# ---------------------------------------------------------------------------
def word_ngrams(col, n: int = 2) -> Column:
    """Array of space-joined word n-grams (single-space tokenization — the
    oracle-parity variant; DuckDB mirrors it with generate_series + list
    slicing).  A document shorter than n yields one truncated gram, same
    as the shingle helpers."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(c, " ")

    # bind the token array as a lambda variable (single-element outer
    # transform): inlining `tokens` in the per-gram lambda re-splits the
    # document once PER GRAM — O(len²) per row (same fix as
    # dedup.word_shingles, r06)
    def _grams(t):
        idx = F.sequence(F.lit(1), F.greatest(F.size(t) - n + 1, F.lit(1)))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))

    return F.element_at(F.transform(F.array(tokens), _grams), 1)


def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text",
                     n: int = 2):
    """Gopher-style repetition quality signals per document, all JVM HOFs:

    - ``dup_ngram_frac``: fraction of n-gram occurrences that repeat an
      earlier occurrence (1 - distinct/total) — boilerplate/looping text
      scores high;
    - ``top_ngram_frac``: share of the single most frequent n-gram
      (the "top 2-gram coverage" filter) — computed as the longest equal
      run of the SORTED gram array via one aggregate() fold, so there is
      no per-document groupBy or explode: one row in, one row out.

    Counts are exact integers (cross-engine safe); fractions are exact
    IEEE divisions of those integers.  At 10^12 rows this is a pure map —
    no shuffle, no Python.
    """
    grams = word_ngrams(text_col, n)
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(
        F.array_sort(grams), acc0, _merge, lambda acc: acc["best"]
    )
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        top_count.alias("top_gram_count"),
        ((n_grams - n_distinct).cast("double") / n_grams.cast("double"))
        .alias("dup_ngram_frac"),
        (top_count.cast("double") / n_grams.cast("double"))
        .alias("top_ngram_frac"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-slice token packing for LLM training
# (documents + EOS concatenated in a global order, cut into fixed-length
# sequences) — built on a DISTRIBUTED prefix sum, because the naive
# global-order window (`Window.orderBy(...)` with no partition) funnels
# the whole table through ONE task.
# ---------------------------------------------------------------------------
def packed_offsets(df, order_col: str, weight_col: str,
                   n_buckets: int = 64):
    """Exclusive running sum of ``weight_col`` in ``order_col`` order,
    as a ``_start_offset`` column — the distributed prefix-sum pattern:

    1. range-bucket rows by ``order_col`` (floor division by a width
       derived from one max() aggregate);
    2. per-bucket subtotals (tiny: ``n_buckets`` rows) get an exclusive
       prefix sum on a single partition — bounded by construction;
    3. the bases broadcast back and a within-bucket window adds the
       local exclusive cumsum.

    Equivalent to ``sum(weight) over (order by order_col rows unbounded
    preceding to 1 preceding)`` but every unbounded-size operation is
    partitioned; only the ``n_buckets``-row subtotal table is ever
    single-task.  ``order_col`` must be unique (it is the tie-break).
    """
    from pyspark.sql import Window

    r = df.agg(F.min(order_col).alias("lo"),
               F.max(order_col).alias("m")).collect()[0]
    if r["m"] is None:  # empty input: zero rows, but keep the output schema
        return df.withColumn("_start_offset", F.lit(0).cast("long"))
    # width over the RANGE (max - min), not max alone: order values
    # clustered far from zero (epoch-micros ids ~1.7e15) would otherwise
    # all land in the last bucket and the within-bucket window becomes
    # the single-task global sort this function exists to avoid
    lo = int(r["lo"])
    width = max(1, (int(r["m"]) - lo + n_buckets) // n_buckets)
    b = df.withColumn(
        "_bkt",
        F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("long"),
    )
    subtotals = b.groupBy("_bkt").agg(
        F.sum(weight_col).cast("long").alias("_sub")
    )
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = subtotals.select(
        "_bkt",
        F.coalesce(F.sum("_sub").over(wb), F.lit(0)).alias("_base"),
    )
    wi = (
        Window.partitionBy("_bkt").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(bases), "_bkt")
        .withColumn(
            "_start_offset",
            (F.col("_base")
             + F.coalesce(F.sum(weight_col).over(wi), F.lit(0))).cast("long"),
        )
        .drop("_bkt", "_base")
    )


def rolling_fingerprints(col, window: int = 8,
                         token_hash: str | None = None) -> Column:
    """Rolling-hash shingle fingerprints of each ``window``-token shingle —
    the content-defined-chunking primitive, all JVM-side.

    ``token_hash``: SQL template ({t} = shingle string); default xxhash64
    (fastest), or the md5-based portable hash for DuckDB oracle parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(F.trim(c), r"\s+")
    if token_hash is None:
        # token array bound as a lambda variable — inlining `tokens` in
        # the per-shingle lambda re-splits the text once per shingle
        # (see word_shingles, r06)
        def _fp(t):
            idx = F.sequence(
                F.lit(1), F.greatest(F.size(t) - window + 1, F.lit(1))
            )
            return F.transform(
                idx,
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(t, i, window))
                ),
            )

        return F.element_at(F.transform(F.array(tokens), _fp), 1)
    # portable path: whole pipeline as one SQL expression so the hash
    # template can wrap the shingle string ('\\s+' in SQL source = \s+).
    # The column must be a NAME here (it is spliced into SQL text).
    if not isinstance(col, str):
        raise TypeError(
            "rolling_fingerprints(token_hash=...) requires a column NAME; "
            "got a Column object"
        )
    # token array bound as a lambda variable (single-element outer
    # transform) — inlining the split() text per element re-splits the
    # document once per window (same fix as the xxhash64 path above)
    toks = f"split(trim(`{col}`), '\\\\s+')"
    shingle = f"concat_ws(' ', slice(t, i, {window}))"
    return F.expr(
        f"element_at(transform(array({toks}), t -> "
        f"transform(sequence(1, greatest(size(t) - {window} + 1, 1)), "
        f"i -> {token_hash.format(t=shingle)})), 1)"
    )


# ---------------------------------------------------------------------------
# Ranked retrieval: inverted index + BM25-style scoring.
# ---------------------------------------------------------------------------
def _tokens(df, id_col: str, text_col: str):
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "token"
        ),
    )


def inverted_index(df, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_df: int | None = None) -> "DataFrame":
    """token -> (document frequency, sorted posting list as CSV).

    Postings are CSV strings (not arrays) so downstream hashing/compare
    layers that can't canonicalize arrays work unchanged.

    ``max_df`` bounds every aggregation buffer (the round-3 verdict's
    hot-token hazard: a stop word at 10^12 docs is a corpus-sized
    ``collect_list`` array in a single executor buffer).  With a finite
    cap the plan is two-phase:

      1. exact per-token df via a count-only aggregation — rows are
         (token, count), ids never enter an aggregation buffer, and
         map-side partial combine collapses the exchange to vocab size;
      2. postings collected ONLY for tokens with df <= max_df (join on
         token reuses the same hash partitioning as the groupBy — one
         shuffle of the (token, id) pairs, AQE-visible); hotter tokens
         emit a df-only row with NULL postings, the sharded-index /
         stop-word convention of production search systems.

    No buffer anywhere holds more than max_df elements, for ANY df
    distribution.  ``max_df=None`` keeps the exact single-pass form
    (postings for every token — only safe when the corpus guarantees
    bounded df); SCALE.md requires a finite cap at corpus scale.
    tests/test_functions.py pins capped==uncapped equivalence below the
    cap; tests/test_plans.py pins the no-unbounded-collect plan shape.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            )
        ).alias("token"),
    )
    if max_df is None:
        return (
            toks.groupBy("token")
            .agg(
                F.count("*").alias("df"),
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(id_col))
                ).alias("postings"),
            )
        )
    dfs = toks.groupBy("token").agg(F.count("*").alias("df"))
    cold = dfs.where(F.col("df") <= F.lit(max_df)).select("token")
    postings = (
        toks.join(cold, "token")
        .groupBy("token")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(id_col))
            ).alias("postings")
        )
    )
    return dfs.join(postings, "token", "left").select(
        "token", "df", "postings"
    )


def bm25_scores(
    df,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> "DataFrame":
    """BM25 ranked retrieval with a RATIONAL (log-free) IDF:
    ``idf_r = (N - df + 0.5) / (df + 0.5)`` — the exponential of the
    classic Robertson log-IDF.  Log-free because every operation here
    (add/mul/div) is IEEE-correctly-rounded and therefore bit-identical
    across engines, while transcendentals differ per libm (the same
    trade the TF-IDF operator documents); idf_r is a monotone transform
    of the standard idf, so single-term rankings agree exactly and
    multi-term rankings agree wherever term contributions don't
    criss-cross.

    Determinism: the per-term scores are pivoted to fixed columns and
    summed in ONE expression (s1 + s2 + ...), never float-summed through
    a groupBy whose accumulation order is partition-dependent.

    Scale shape: tf/dl/df are three partial-agg shuffles over (id, token)
    pairs pre-filtered to the query terms where possible; the corpus
    totals row is a broadcast cross-join.  Nothing quadratic, no Python.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    # dedupe while preserving order: a repeated term would silently sum
    # its contribution twice (BM25 without a query-tf component)
    terms = list(dict.fromkeys(terms))
    toks = _tokens(df, id_col, text_col)
    hits = toks.where(F.col("token").isin(list(terms)))
    tf = hits.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    # df derives from tf — one row per distinct (doc, token) already —
    # instead of a second distinct+shuffle over the raw hits
    dft = tf.groupBy("token").agg(F.count("*").alias("df"))
    tot = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("bigint") * F.lit(1.0) / F.count("*")).alias(
            "avgdl"
        ),
    )
    per = (
        tf.join(dl, id_col)
        .join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "s",
            (
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (
                F.col("tf") * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ),
        )
    )
    parts = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    agg = per.groupBy(id_col).agg(*parts)
    score = agg.columns[1:]
    expr = F.col(score[0])
    for c in score[1:]:
        expr = expr + F.col(c)
    return agg.select(F.col(id_col), expr.alias("score"))


def strip_boilerplate_lines(
    df: "DataFrame",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    text_col: str = "text",
    thresh_num: int = 1,
    thresh_den: int = 2,
) -> "DataFrame":
    """Per-domain boilerplate-LINE removal (CCNet-style paragraph dedup):
    a line occurring in ≥ thresh_num/thresh_den of its domain's documents
    is boilerplate; each document is rebuilt from its surviving lines in
    original order.  Returns (id, n_lines, n_boiler, clean_text).

    The threshold is an exact integer comparison
    (df · thresh_den ≥ docs · thresh_num — no float cutoff), line
    identity is the md5 of the line bytes, and line-frequency counts are
    per-document-distinct — all reproducible bit-for-bit by the SQL twin
    and the randomized python reference (test_functions.py).

    Corner the definition implies: a single-document domain strips EVERY
    line (each occurs in 100 % of that domain's docs) — callers wanting
    different behavior raise the threshold or pre-group tiny domains.

    100 TB shape: the df pass ships only (domain, line-hash, doc)
    triples with map-side partial aggregation; the per-domain doc-count
    side is domain-cardinality and broadcast; full text crosses the wire
    exactly twice (df join + per-doc reassembly)."""
    lines = df.select(
        F.col(id_col),
        F.col(domain_col).alias("_dom"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "_line_no", "_line"
        ),
    )
    per_dom = lines.groupBy("_dom").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    df_line = lines.groupBy(
        "_dom", F.md5(F.col("_line").cast("binary")).alias("_h")
    ).agg(F.countDistinct(id_col).alias("_df"))
    flagged = (
        lines.withColumn("_h", F.md5(F.col("_line").cast("binary")))
        .join(df_line, ["_dom", "_h"])
        .join(F.broadcast(per_dom), "_dom")
        .withColumn(
            "_boiler",
            F.col("_df") * F.lit(int(thresh_den))
            >= F.col("_docs") * F.lit(int(thresh_num)),
        )
    )
    kept = F.when(~F.col("_boiler"), F.struct("_line_no", "_line"))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("_boiler").cast("int")).cast("bigint")
            .alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer-training + mixture-design support (beyond-reference ops for the
# 100 TB training-data pipeline; both all-JVM, DuckDB-oracled).
# ---------------------------------------------------------------------------
def bpe_pair_counts(df, text_col: str = "text", top_k: int = 50):
    """First BPE-training iteration: corpus-wide frequencies of adjacent
    character pairs inside whitespace tokens, top-k by count (the pair a
    BPE trainer would merge first is row one).

    Scale shape: one pure map (token explode → char-bigram explode — no
    joins, nothing but the bigram strings move), then a groupBy over the
    pair alphabet: at most |charset|² distinct keys, so map-side partial
    aggregation collapses the exchange to alphabet size regardless of
    corpus size.  Top-k via orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort).  Deterministic tie-break
    (count desc, pair asc).
    """
    toks = df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok")
    )
    pairs = toks.where(F.length("tok") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(top_k)
    )


def domain_divergence(df, domain_col: str = "source",
                      text_col: str = "text"):
    """χ² divergence of each domain's unigram distribution from the
    corpus distribution — the data-mixing design signal (which sources'
    token statistics deviate most → mixture re-weighting / quality
    triage; complements temperature_mix, which consumes such weights).

    χ² = Σ_t (p_d(t) − p(t))² / p(t) over the corpus vocabulary.  The
    absent-token mass is folded in closed form — Σ_{t∉d} p(t) equals
    1 − Σ_{t∈d} p(t), so χ² = 1 + Σ_{t∈d} [(p_d−p)²/p − p] — which means
    only PRESENT (domain, token) pairs ever shuffle: no dense
    vocab×domain outer join at web scale.  The corpus totals are a
    broadcast 1-row table; per-token terms are IEEE-deterministic
    (each a fixed dag of casts/divides both engines reproduce bitwise)
    and floor-quantized to 1e-12 BEFORE the sum, which runs in
    DECIMAL(38,0) — exact and order-independent, so the result is
    partitioning-invariant AND DuckDB-hash-exact.
    """
    toks = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    cs = toks.groupBy("domain", "tok").agg(F.count("*").alias("c_s"))
    ns = toks.groupBy("domain").agg(F.count("*").alias("n_s"))
    c = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("n"))
    j = cs.join(ns, "domain").join(c, "tok").crossJoin(F.broadcast(n))
    _p = "cast(c as double)/cast(n as double)"
    _ps = "cast(c_s as double)/cast(n_s as double)"
    term = f"(({_ps} - {_p}) * ({_ps} - {_p}) / ({_p})) - {_p}"
    q = j.select(
        "domain",
        F.expr(
            f"cast(floor(({term}) * 1e12 + 5e-1) as decimal(38,0))"
        ).alias("q"),
    )
    return (
        q.groupBy("domain")
        .agg(
            F.expr(
                "cast(1e0 + cast(sum(q) as double) / 1e12 as double)"
            ).alias("chi2")
        )
        # single-partition presentation sort: orderBy's range exchange
        # would re-execute the aggregation for boundary sampling
        .repartition(1).sortWithinPartitions("domain")
    )


def bigram_lm_scores(df, id_col: str = "doc_id",
                     text_col: str = "text"):
    """KenLM-style n-gram LM quality scoring, self-trained on the corpus:
    per document, the mean conditional bigram probability
    ``P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})`` under the corpus's
    own MLE bigram model — the perplexity-proxy filter real pipelines run
    (CCNet's LM stage) with the log/float replaced by a quantized-integer
    form so the score is EXACT: each bigram contributes
    ``floor(1e12 · c₂/c₁)`` (one IEEE-exact division + one exact-rounded
    multiply), per-doc sums are BIGINTs (order-independent), and
    ``lm_score = floor(Σq / n_bigrams)``.

    Scale shape: train = two groupBys (map-side combined) over the token
    stream; score = one shuffle join of per-doc bigram occurrences onto
    the bigram-count table keyed by the gram (co-partitioned with the
    unigram join via the leading token).  No Python, no collect — the
    "model" never exists as a driver-side object, unlike KenLM's
    monolithic ARPA file which stops fitting at web scale.

    Returns (id, n_bigrams, lm_score); documents with < 2 tokens carry
    ``n_bigrams = 0`` and a NULL score (nothing to condition on).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    c1 = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    # token array materialized once — lambdas referencing split(...)
    # directly would re-split per element (quadratic in doc length)
    grams = (
        df.withColumn("_toks", F.split(F.lower(F.col(text_col)), " "))
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.expr(
                    """CASE WHEN size(`_toks`) >= 2
                       THEN transform(
                         sequence(1, size(`_toks`) - 1),
                         i -> struct(
                           element_at(`_toks`, i) AS w1,
                           concat_ws(' ', element_at(`_toks`, i),
                                     element_at(`_toks`, i + 1)) AS gram))
                       ELSE array() END"""
                )
            ).alias("g"),
        )
        .select("id", F.col("g.w1").alias("w1"), F.col("g.gram").alias("gram"))
    )
    c2 = grams.groupBy("gram").agg(F.count("*").alias("c2"))
    q = (
        grams.join(c2, "gram")
        .join(c1, grams["w1"] == c1["tok"])
        .select(
            "id",
            F.floor(
                F.lit(1e12) * (F.col("c2").cast("double")
                               / F.col("c1").cast("double"))
            ).alias("q"),
        )
    )
    per_doc = q.groupBy("id").agg(
        F.count("*").alias("n_bigrams"), F.sum("q").alias("sum_q")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias(
                "n_bigrams"),
            F.floor(
                F.col("sum_q").cast("double") / F.col("n_bigrams")
            ).cast("bigint").alias("lm_score"),
        )
    )


def cooccurrence_pmi(df, text_col: str = "text", window: int = 2,
                     min_count: int = 5, top_k: int = 50):
    """Top-k token associations by pointwise mutual information over a
    ±``window`` co-occurrence relation — the word2vec-era association
    miner (collocations, multi-word entities) as pure DataFrame algebra.

    PMI's log is monotone, so ranking by the RATIO
    ``p(a,b) / (p(a)·p(b)) = c_ab·N_tok² / (N_pair·c_a·c_b)`` is
    rank-equivalent to PMI itself; numerator and denominator are exact
    BIGINT products and the reported ``pmi_ratio`` is one IEEE-exact
    division, so the result is hash-exact cross-engine.  (At 10^12
    tokens the bigint products overflow — the production form moves to
    log-space doubles and loses only bit-exactness of the REPORTED
    ratio, not the ranking's determinism on distinct ratios; min_count
    already prunes the noise floor where log-space error could reorder.)

    Scale shape: pair generation is a pure per-row map (array zip, no
    self-join — positions never leave the row); the only shuffles are the
    pair/unigram groupBys (map-side combined) and the top-k is a
    TakeOrdered, never a global sort.  Unordered pairs are canonicalized
    ``least/greatest`` and self-pairs (a = b) dropped.
    """
    # token array materialized once per row — lambdas referencing
    # split(...) directly would re-split per element (quadratic)
    toks_e = "`_toks`"
    parts = []
    for d in range(1, window + 1):
        parts.append(
            f"""CASE WHEN size({toks_e}) >= {d + 1}
                THEN transform(sequence(1, size({toks_e}) - {d}),
                  i -> struct(
                    least(element_at({toks_e}, i),
                          element_at({toks_e}, i + {d})) AS a,
                    greatest(element_at({toks_e}, i),
                             element_at({toks_e}, i + {d})) AS b))
                ELSE array() END"""
        )
    pairs_expr = f"concat({', '.join(parts)})"
    pairs = (
        df.withColumn("_toks", F.split(F.lower(F.col(text_col)), " "))
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") < F.col("b"))
    )
    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )
    c_tok = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n_tok = toks.agg(F.count("*").alias("n_tok"))
    c_ab = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    n_pair = pairs.agg(F.count("*").alias("n_pair"))
    out = (
        c_ab.join(c_tok.select(F.col("tok").alias("a"),
                               F.col("c").alias("c_a")), "a")
        .join(c_tok.select(F.col("tok").alias("b"),
                           F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .select(
            "a", "b", "c_ab",
            (
                (F.col("c_ab") * F.col("n_tok") * F.col("n_tok"))
                .cast("double")
                / (F.col("n_pair") * F.col("c_a") * F.col("c_b"))
                .cast("double")
            ).alias("pmi_ratio"),
        )
    )
    return out.orderBy(F.desc("pmi_ratio"), "a", "b").limit(top_k)


def oov_rate(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> "DataFrame":
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` tokens — the closed-vocab coverage signal quality
    pipelines threshold on (gibberish / wrong-language / OCR-noise pages
    score high; a trained tokenizer's vocab slots in for the corpus-
    derived one unchanged).

    Output per doc: ``n_tokens``, ``n_oov``, ``oov_bp`` (basis points,
    floor-quantized — integer-exact at any scale).

    Scale shape: the vocabulary is vocab-size rows (TakeOrdered over the
    token counts — ties break on the token so the vocab is
    deterministic) and BROADCASTS; the OOV flag is a broadcast-join
    residual computed map-side, so the only shuffle carries
    (doc, partial counts) after map-side combine — the corpus text
    never moves.  Tokenization is single-space unigrams of
    ``lower(text)``, shared with heavy_hitters / the classifiers.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
        .select(
            id_col, "n_tokens", "n_oov",
            F.floor(F.col("n_oov") * 10000 / F.col("n_tokens"))
            .cast("bigint").alias("oov_bp"),
        )
    )


def compression_signal(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> "DataFrame":
    """Per-document zlib compression ratio — the redundancy signal of
    Gopher-family quality filters: highly compressible pages are
    repetitive boilerplate / keyword stuffing, incompressible ones are
    binary garbage or encrypted junk; natural prose sits in a stable
    band.  Reported as integer basis points (compressed*10^4/raw).

    This is the one quality signal with no SQL equivalent (no
    compression primitive in either engine's SQL surface), so the
    kernel is Python zlib under ``mapInPandas`` — Arrow-batched, one
    pass, no shuffle, embarrassingly row-local; zlib at a fixed level
    is deterministic for a given zlib build, and the pytest pins
    equality to direct python zlib on the same strings.  Empty text
    reports its compressed size against a floor of 1 byte (documented
    sentinel; threshold rules should drop empties earlier anyway).
    """
    schema = f"{id_col} long, n_bytes long, n_comp long, ratio_bp long"

    def fn(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            nb = raw.str.len().astype("int64")
            nc = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": nb,
                "n_comp": nc,
                "ratio_bp": (nc * 10000) // nb.where(nb > 0, 1),
            })

    return df.select(id_col, text_col).mapInPandas(fn, schema)


def dedup_spans_in_doc(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    token_hash: str | None = None,
) -> "DataFrame":
    """Remove REPEATED spans WITHIN each document (the intra-document
    half of suffix-array-style substring dedup; `span_dedup` is the
    cross-document half): any token covered by a ``window``-token
    rolling fingerprint that already occurred EARLIER in the same
    document is dropped, and the text is reassembled from the surviving
    tokens — so a page whose template repeats its own header/footer
    block loses the second copy wholesale (every token of a repeated
    window is covered by some repeat-window, not just its first token).

    Plan shape: a PURE MAP — zero shuffles of any kind.  The repeat
    detection is per-document array algebra inside one projection:
    sort the (fingerprint, window-index) pairs (O(n log n) per doc,
    JVM-side), mark every pair whose sorted predecessor shares its
    hash (= not the earliest occurrence), expand the marked windows to
    their covered positions, and filter the token array against that
    drop set.  The earlier formulation posexploded windows AND tokens
    through a window function, a distinct, and a left-anti join — three
    doc_id-keyed shuffles that moved every token of the corpus;
    measured 7.9 s -> sub-second at sf0.1 (BENCH.md).  Worst-case
    compute is O(n·d) for the final containment filter (d = dropped
    positions), the usual rewrite-op bound, with JVM-array constants.

    Output: (id, n_tokens, n_removed, new_text), byte-exact across
    engines with the portable ``token_hash``.
    """
    toks_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        toks_arr.alias("_toks"),
        rolling_fingerprints(text_col, window=window,
                             token_hash=token_hash).alias("_fps"),
    ).withColumn("_n", F.size("_toks"))
    # (hash, 1-based window idx) sorted by hash then idx: within a
    # same-hash run every element but the first is a repeat
    srt = base.withColumn(
        "_srt",
        F.array_sort(
            F.transform(
                "_fps",
                lambda h, i: F.struct(h.alias("h"),
                                      (i + 1).alias("idx")),
            )
        ),
    )
    rep_idx = F.filter(
        F.transform(
            "_srt",
            # F.get is 0-based and null-safe: at i=0 the predecessor
            # lookup yields NULL (never an ANSI index error), the
            # equality is NULL, and the when() falls through to NULL
            lambda s, i: F.when(
                F.get(F.col("_srt"), i - 1)["h"] == s["h"], s["idx"]
            ),
        ),
        lambda x: x.isNotNull(),
    )
    drops = srt.withColumn(
        "_drops",
        F.array_distinct(
            F.flatten(
                F.transform(
                    rep_idx,
                    lambda idx: F.sequence(
                        idx, F.least(idx + window - 1, F.col("_n"))
                    ),
                )
            )
        ),
    )
    kept = F.filter(
        F.transform(
            "_toks",
            lambda t, p: F.struct(t.alias("t"), (p + 1).alias("p")),
        ),
        lambda s: ~F.array_contains(F.col("_drops"), s["p"]),
    )
    return drops.select(
        id_col,
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.size("_drops").cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda s: s["t"]), " "
        ).alias("new_text"),
    )


_BPE_SEP = "\x1f"


def _bpe_local_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side BPE merge loop over a collected word-frequency table —
    byte-identical semantics to the distributed loop: weighted adjacent
    pair counts, argmax with (count DESC, lhs ASC, rhs ASC) tie-break,
    left-to-right non-overlapping merge application."""
    from collections import Counter

    words = [(list(w), int(c)) for w, c in word_counts]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            raise ValueError(
                f"corpus exhausted its adjacent pairs after "
                f"{rank - 1} merges; reduce n_merges"
            )
        (lhs, rhs), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        merged = lhs + rhs
        nxt = []
        for syms, c in words:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        words = nxt
    return merges


def bpe_train_merges(
    df,
    text_col: str = "text",
    n_merges: int = 12,
    driver_vocab_max: int | None = 100_000,
) -> "DataFrame":
    """Train a BPE tokenizer's merge table DISTRIBUTED: the classic
    greedy loop (count adjacent symbol pairs -> merge the most frequent
    pair everywhere -> repeat) re-expressed so the corpus is scanned
    EXACTLY ONCE.  Reference position: the glyph->word assembly order
    (`recognize.py:336-360` builds words from ranked glyph alternatives)
    inverted into vocabulary LEARNING; completes the tokenizer story
    next to ``bpe_token_count`` (apply) and ``bpe_pair_counts`` (one
    counting round).

    Scale shape (the 100 TB argument): the corpus collapses to a
    word-frequency table in one pass — vocab-sized (~10^6-10^7 rows at
    web scale), orders of magnitude smaller than the corpus — and the
    merge loop never touches the corpus again.  Each iteration shuffles
    only (pair, partial count) rows off that table (map-side partial
    agg), takes the global argmax with a deterministic tie-break
    (count DESC, lhs ASC, rhs ASC) as a 1-row TakeOrdered collect
    (pagerank-style bounded driver scalar), and applies the merge as a
    pure map.  Per-iteration persist + unpersist cuts the lineage chain
    exactly like ``graph.pagerank``.

    The merge step needs NO stateful fold: word symbol sequences are
    carried as separator-wrapped strings (``\\x1f lhs \\x1f\\x1f rhs
    \\x1f``-style, every token bracketed) and a merge is one literal
    ``replace`` — left-to-right non-overlapping replacement IS the BPE
    greedy scan ("aaa" + merge(a,a) -> "aa","a"), and both Spark and
    DuckDB implement exactly that, which keeps the engine and the
    oracle byte-identical with zero lambda machinery in the hot path.

    Charset note: symbols start as UTF-16-code-unit characters
    (``split(w, '')``); the wrapped-string encoding is unambiguous
    because \\x1f never survives tokenization (non-ASCII-printable
    words are filtered — a production run on CJK/emoji corpora should
    split on codepoints instead; documented trade, not a silent one).

    Returns (merge_rank, lhs, rhs, merged, pair_count) with exactly
    ``n_merges`` rows — callers must size ``n_merges`` below the
    corpus's distinct-pair count (a tiny corpus that exhausts its pairs
    raises rather than silently under-returning).

    ``driver_vocab_max``: the merge loop runs over the WORD-FREQUENCY
    table, not the corpus — and that table can be tiny (a clean 10^6-word
    vocab is a few MB) while each distributed iteration still pays full
    job/stage scheduling on it.  The table is persisted and counted
    (one bounded action — the corpus scan it forces was already paid by
    the old ``cur.count()``); at or below the threshold it collects to
    the driver and the loop runs locally with byte-identical semantics
    (``_bpe_local_merges``: same weighted pair counts, same
    deterministic argmax, same left-to-right non-overlap merge —
    size-switch equality pinned in tests).  Above it, the distributed
    loop runs unchanged: at a raw crawl's 10^8-10^9-row vocab the
    cluster is the only place the loop fits — the same honest switch as
    ``bpe_encode_counts``'s ``broadcast_vocab_max``.  ``None`` forces
    the distributed path.
    """
    spark = df.sparkSession
    sep = _BPE_SEP
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.col("w").rlike(r"^[\x20-\x7e]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    schema = (
        "merge_rank bigint, lhs string, rhs string, "
        "merged string, pair_count bigint"
    )
    sized = False
    if driver_vocab_max is not None:
        # persist carries the word table through either branch: the
        # local path reads it once more (collect), the distributed path
        # builds cur off it without a second corpus scan
        words = words.persist()
        sized = True
        if words.count() <= driver_vocab_max:
            try:
                wc = [(r["w"], r["cnt"]) for r in words.collect()]
            finally:
                words.unpersist()
            return spark.createDataFrame(
                _bpe_local_merges(wc, n_merges), schema
            )
    cur = words.select(
        "cnt",
        F.concat(
            F.lit(sep),
            F.array_join(F.split("w", ""), sep + sep),
            F.lit(sep),
        ).alias("s"),
    ).persist()
    cur.count()
    if sized:
        words.unpersist()
    merges = []
    try:
        for rank in range(1, n_merges + 1):
            toks = F.split(
                F.expr("trim(BOTH char(31) FROM s)"), sep + sep
            )
            top = (
                cur.select(
                    "cnt",
                    F.explode(
                        F.arrays_zip(
                            toks.alias("l"),
                            F.slice(toks, F.lit(2), F.size(toks)).alias("r"),
                        )
                    ).alias("pr"),
                )
                .where(F.col("pr.r").isNotNull())
                .groupBy(
                    F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs")
                )
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not top:
                raise ValueError(
                    f"corpus exhausted its adjacent pairs after "
                    f"{rank - 1} merges; reduce n_merges"
                )
            lhs, rhs, cnt = (
                top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
            )
            merges.append((rank, lhs, rhs, lhs + rhs, cnt))
            nxt = cur.select(
                "cnt",
                F.replace(
                    F.col("s"),
                    F.lit(sep + lhs + sep + sep + rhs + sep),
                    F.lit(sep + lhs + rhs + sep),
                ).alias("s"),
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(merges, schema)


def dedup_paragraphs_global(df, id_col: str = "doc_id",
                            text_col: str = "text") -> "DataFrame":
    """Corpus-level exact paragraph dedup, first-occurrence-wins (CCNet's
    cross-shard paragraph pass): every repeat of a '\\n'-delimited
    paragraph anywhere in the corpus is removed; documents are rebuilt
    byte-exact from survivors (a doc whose every paragraph was seen
    earlier rebuilds to '').

    Scale shape: paragraphs shuffle once into md5-hash partitions for the
    streaming row_number rank (partition size = dup multiplicity),
    survivors shuffle once more keyed by doc for reassembly — text
    crosses the wire exactly twice (the CCNet lower bound); the rank
    never buffers a group.

    Returns (id, n_paras, n_removed, new_text).
    """
    from pyspark.sql import Window

    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, "\n")).alias("idx", "para"),
    )
    w = Window.partitionBy(F.md5(F.col("para").cast("binary"))).orderBy(
        id_col, "idx"
    )
    kept = paras.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s.para,
            ),
            "\n",
        ).alias("new_text"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_paras",
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def bpe_encode_counts(df, merges, text_col: str = "text",
                      broadcast_vocab_max: int | None = 1_000_000,
                      ) -> "DataFrame":
    """Apply a trained BPE merge table and count per-doc subwords — the
    token-budget accounting step after ``bpe_train_merges``.

    ``merges`` is the ordered [(lhs, rhs), ...] list from training (or a
    FROZEN external tokenizer's merge list — the production shape: price
    a new corpus in one pass without retraining).  The merge chain
    applies to the DISTINCT-word table only (vocab-sized), as one nested
    stack of literal ``replace`` expressions — whole-stage codegen, zero
    per-corpus-token work; each document's words then join the
    (word → n_subwords) map and aggregate.  Same separator-wrapped
    representation and left-to-right non-overlap replace semantics as
    training, so the DuckDB twin is byte-identical.

    The vocab side broadcasts ONLY while it fits: a clean web corpus's
    distinct-word table is ~10 MB/10^6 words, but a 100 TB crawl's is
    10^8-10^9 rows of typo/hash junk — broadcasting that OOMs the
    driver.  The encoded vocab is persisted and counted (one extra
    vocab-sized action; the cache repays it in the join), and the
    broadcast hint is dropped above ``broadcast_vocab_max`` rows in
    favor of a plain shuffled equi-join (both sides hash on ``w``).
    Pass ``broadcast_vocab_max=None`` to skip the count and always
    broadcast (small fixed vocab known a priori), or ``0`` to always
    shuffle.

    Returns (doc_id, n_words, n_subwords); docs with zero ASCII words
    drop (inner join), mirroring the training-side token filter.
    """
    sep = _BPE_SEP
    docw = (
        df.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .where(F.col("w").rlike(r"^[\x20-\x7e]+$"))
    )
    vocab = docw.select("w").distinct()
    s = F.concat(
        F.lit(sep), F.array_join(F.split("w", ""), sep + sep), F.lit(sep)
    )
    for lhs, rhs in merges:
        s = F.replace(
            s,
            F.lit(sep + lhs + sep + sep + rhs + sep),
            F.lit(sep + lhs + rhs + sep),
        )
    enc = vocab.select(
        "w",
        F.size(F.split(F.btrim(s, F.lit(sep)), sep + sep))
        .cast("bigint")
        .alias("n_sub"),
    )
    if broadcast_vocab_max is None:
        enc = F.broadcast(enc)
    else:
        enc = enc.persist()
        if enc.count() <= broadcast_vocab_max:
            enc = F.broadcast(enc)
    return (
        docw.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
        )
    )


def funnel_stage_sql(
    text_col: str = "text",
    min_tokens: int = 10,
    max_chars: int = 20000,
    min_quality: str = "5e-1",
) -> str:
    """Shared Spark/DuckDB SQL: FIRST-FAILING-stage number for the
    standard quality funnel (1 too_short, 2 too_long, 3 lang_unknown,
    4 low_quality, 5 kept).  ``min_quality`` is an e-notation string
    literal on purpose (cross-engine float parity — CLAUDE.md)."""
    toks = token_count_sql(text_col)
    return (
        f"case"
        f" when ({toks}) < {min_tokens} then 1"
        f" when length({text_col}) > {max_chars} then 2"
        f" when ({lang_id_sql(text_col)}) = 'und' then 3"
        f" when ({quality_score_sql(text_col)}) < {min_quality} then 4"
        f" else 5 end"
    )


FUNNEL_STAGE_NAMES = (
    "too_short", "too_long", "lang_unknown", "low_quality", "kept"
)


def quality_funnel(
    df,
    text_col: str = "text",
    min_tokens: int = 10,
    max_chars: int = 20000,
    min_quality: str = "5e-1",
) -> "DataFrame":
    """Per-stage drop accounting for the quality-filter cascade, fused
    into ONE corpus scan: (stage_no, stage, n_docs, n_tokens) with
    first-failing-stage attribution.  The production alternative — one
    pass per filter — scans the corpus k times and still can't
    attribute a doc to the FIRST filter that rejected it without extra
    bookkeeping; here every signal (token count, length, language ID,
    quality score) is computed once in a single projection, the CASE
    cascade assigns the stage, and a 5-row aggregation yields exact doc
    and token counts per stage.  All signals live in the shared
    Spark/DuckDB SQL subset (length/replace/case arithmetic), so the
    funnel is hash-exact vs the oracle.

    Scale shape: one scan, map-side partial agg onto ≤ 5 groups, a
    5-row exchange.  n_tokens per stage is the number pipeline owners
    actually watch (token mass removed per filter), integer-exact.
    """
    stage_no = funnel_stage_sql(text_col, min_tokens, max_chars,
                                min_quality)
    name = "case stage_no " + " ".join(
        f"when {i + 1} then '{n}'"
        for i, n in enumerate(FUNNEL_STAGE_NAMES)
    )
    return (
        df.select(
            F.expr(stage_no).alias("stage_no"),
            F.expr(f"cast({token_count_sql(text_col)} as bigint)").alias(
                "_nt"
            ),
        )
        .groupBy("stage_no")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("stage_no").cast("bigint").alias("stage_no"),
            F.expr(f"{name} end").alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )


def char_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_distinct, simpson) — per-document character-level
    concentration, the mojibake / keyboard-mash / repeated-char-spam
    signal the token-level filters structurally miss (a doc of
    "aaaa…" or "ŃŃŃ…" tokenizes into few "words" but screams at the
    character histogram; `compression_signal` sees it too but needs the
    Python zlib path — this is its all-JVM exact sibling).

    ``simpson`` is the Simpson concentration index Σ(cᵢ/n)² ∈ (0, 1]:
    1 = a single repeated character, →1/n = all characters distinct.
    Chosen over entropy because it needs no transcendental function —
    Σcᵢ² is an exact BIGINT and the index is ONE IEEE division, so the
    DuckDB oracle is hash-exact (the domain_divergence/χ² argument).

    Scale shape: the char explode partial-aggregates map-side into
    (doc, char, count) rows — per-doc fan-in is bounded by the
    document's ALPHABET (≤ a few hundred), not its length — and the
    per-doc rollup is a second compact agg; text itself never shuffles.
    Charset note: Spark splits per UTF-16 code unit, so astral-plane
    characters count as surrogate pairs (same caveat as `bpe_train`);
    empty documents are excluded (split("") is [] in Spark but [''] in
    DuckDB — the length guard keeps both engines aligned).
    """
    occ = (
        df.where(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "")).alias("ch"),
        )
    )
    counts = occ.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("_c2"),
        )
        .select(
            id_col,
            "n_chars",
            "n_distinct",
            (
                F.col("_c2").cast("double")
                / (
                    F.col("n_chars").cast("double")
                    * F.col("n_chars").cast("double")
                )
            ).alias("simpson"),
        )
    )


# Mojibake tells (public knowledge — the ftfy/UnicodeDammit failure
# catalog): UTF-8 bytes re-decoded as cp1252/latin-1 turn every
# U+2018-U+201D punctuation mark into an 'â€x' triple and every Latin-1
# accented letter into an 'Ãx' pair, while a lossy decode leaves
# U+FFFD replacement characters.  Counting those three markers is the
# standard cheap screen; a real fixer (ftfy) would then re-encode.
_MOJI_REPL = "�"
_MOJI_PUNCT = "â€"  # 'â€' — prefix of all double-encoded punctuation
_MOJI_LATIN = "Ã"        # 'Ã'  — prefix of double-encoded Latin-1 letters


def mojibake_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_repl, n_punct, n_latin, is_mojibake) — per-document
    encoding-damage screen: counts of U+FFFD replacement characters,
    double-encoded punctuation marker 'â€' (the cp1252 rendering of any
    UTF-8 U+20xx punctuation's first two bytes), and double-encoded
    Latin-1 letter marker 'Ã'.  A nonzero count in any class flags the
    document — the pre-quality-filter hygiene gate every webtext
    pipeline runs before scoring (damaged text would otherwise fail
    downstream filters for the WRONG reason and poison n-gram stats).

    Scale shape: a pure row-local map — three replace/length pairs in
    whole-stage codegen, zero shuffles beyond the scan; exact integer
    counts, so the DuckDB twin is hash-exact.  Counting by
    length-delta (len(s) - len(replace(s, marker, ''))) keeps both
    engines on identical codepoint semantics.
    """
    t = F.col(text_col)

    def _count(marker: str) -> "F.Column":
        delta = F.length(t) - F.length(F.replace(t, F.lit(marker)))
        return (delta / len(marker)).cast("bigint")

    n_repl = _count(_MOJI_REPL)
    n_punct = _count(_MOJI_PUNCT)
    n_latin = _count(_MOJI_LATIN)
    return df.select(
        F.col(id_col),
        n_repl.alias("n_repl"),
        n_punct.alias("n_punct"),
        n_latin.alias("n_latin"),
        ((n_repl > 0) | (n_punct > 0) | (n_latin > 0)).alias("is_mojibake"),
    )


def winnow_selections(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 5,
    window: int = 4,
    token_hash: str | None = None,
) -> DataFrame:
    """(id, pos, fp) — winnowing fingerprint selection (Schleimer et al.,
    SIGMOD 2003 — the MOSS algorithm; public method) over the rolling
    k-gram hashes `rolling_fingerprints` emits.

    Winnowing picks, from every window of ``window`` consecutive k-gram
    hashes, the RIGHTMOST minimum, then drops duplicate picks — giving
    the two guarantees raw rolling hashes lack: any shared run of at
    least kgram + window - 1 tokens is always detected (at least one
    shared fingerprint survives selection on both sides), and expected
    density is 2/(window+1) — the fingerprint INDEX is ~3x smaller than
    the full hash stream at window=4, bounded by construction.  This is
    the standard index layout for cross-corpus near-match lookup where
    `span_dedup`'s every-window hashing would over-index.

    All per-document work is one JVM projection (array HOFs: the
    rightmost-min scan is a fold per window, O(window) each); the output
    explodes to compact (id, pos, fp) rows — text never shuffles, and
    the selection is a pure function of the text (deterministic under
    retries / resume / growth, SURVEY.md §7.3).
    """
    from ocrd_calamari_spark.functions.dedup import PORTABLE_TOKEN_HASH_SQL

    th = token_hash or PORTABLE_TOKEN_HASH_SQL
    w = int(window)
    fps = rolling_fingerprints(text_col, window=int(kgram), token_hash=th)
    out = df.select(F.col(id_col), fps.alias("_fps"))
    sel = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(size(_fps) - {w} + 1, 1)),"
        f"  i -> aggregate("
        f"    sequence(i, least(i + {w} - 1, size(_fps))),"
        f"    named_struct('fp', cast(null as bigint),"
        f"                 'pos', cast(null as int)),"
        f"    (acc, p) -> if(acc.fp is null or element_at(_fps, p) <= acc.fp,"
        f"                   named_struct('fp', element_at(_fps, p),"
        f"                                'pos', cast(p as int)),"
        f"                   acc))))"
    )
    return (
        out.select(F.col(id_col), F.explode(sel).alias("_s"))
        .select(
            id_col,
            F.col("_s.pos").cast("bigint").alias("pos"),
            F.col("_s.fp").alias("fp"),
        )
    )
