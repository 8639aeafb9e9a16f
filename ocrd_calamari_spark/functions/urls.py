"""URL canonicalization — the crawl-native normalization pass that runs
before any url-keyed dedup (recrawls of one page arrive under tracking
params, fragments, mixed-case hosts, and explicit default ports).

All JVM-side Column expressions (split/filter/concat HOFs plus two
anchored regexp_extracts valid in Java regex AND RE2): the DuckDB oracle
mirrors the split structure on the exercised fixture subset, and the
guard paths the fixture can't produce (scheme-less inputs, userinfo) are
pinned by the randomized python-reference test in test_functions.py.

Normalizations applied (the conservative, always-safe set):
  - scheme and HOST lowercased (path/query case is preserved — it is
    significant on most servers; userinfo ``user:pass@`` is preserved
    byte-for-byte too, since credentials are case-significant)
  - fragment dropped (never sent to the server)
  - tracking params removed: utm_*, gclid=, fbclid=
  - '?' dropped when no params survive
  - explicit default ports stripped (:80 for http, :443 for https)

Inputs WITHOUT '://' (scheme-less, protocol-relative, garbage) pass
through UNCHANGED: canonicalization must never collapse distinct
malformed urls onto one key (a NULL canonical would make a url-keyed
dedup treat them all as one document).  Assumes at most one '://';
later '?' characters stay inside the query string.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")


def canonical_url(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.element_at(F.split(c, "#", 2), 1)
    base = F.element_at(F.split(no_frag, r"\?", 2), 1)
    query = F.when(
        no_frag.contains("?"), F.element_at(F.split(no_frag, r"\?", 2), 2)
    ).otherwise(F.lit(None))
    scheme = F.lower(F.element_at(F.split(base, "://", 2), 1))
    hostpath = F.element_at(F.split(base, "://", 2), 2)
    hostport_raw = F.element_at(F.split(hostpath, "/", 2), 1)
    # lowercase ONLY the host part: userinfo (anything up to the last
    # '@') is case-significant and kept verbatim
    userinfo = F.regexp_extract(hostport_raw, "^(.*@)", 1)
    hostport = F.concat(
        userinfo, F.lower(F.regexp_extract(hostport_raw, "([^@]*)$", 1))
    )
    path = F.when(
        hostpath.contains("/"),
        F.concat(F.lit("/"), F.element_at(F.split(hostpath, "/", 2), 2)),
    ).otherwise(F.lit(""))
    host = (
        F.when((scheme == "http") & hostport.endswith(":80"),
               F.substring(hostport, 1, F.length(hostport) - 3))
        .when((scheme == "https") & hostport.endswith(":443"),
              F.substring(hostport, 1, F.length(hostport) - 4))
        .otherwise(hostport)
    )
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: ~(
            p.startswith(_TRACKING_PREFIXES[0])
            | p.startswith(_TRACKING_PREFIXES[1])
            | p.startswith(_TRACKING_PREFIXES[2])
        ) & (p != ""),
    )
    q2 = F.array_join(kept, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    # no '://' → not a fetchable absolute url; pass through unchanged
    # rather than emitting NULL (which would collide every malformed url
    # onto one dedup key)
    return F.when(c.contains("://"), canon).otherwise(c)


def fuzzy_url_pairs(df, id_col: str = "doc_id",
                    url_col: str = "url") -> "DataFrame":
    """All url pairs within Levenshtein distance 1 — near-identical-url
    discovery (typo mirrors, off-by-one-char session paths), found with
    SymSpell-style DELETION-NEIGHBORHOOD blocking instead of an
    all-pairs scan.

    The classic exactness argument: if dist(a, b) <= 1 (one
    substitution, insertion, or deletion), then a and b share a string
    in {s} ∪ D1(s) on both sides (substitution → delete the differing
    position from both; insertion/deletion → the shorter string IS a
    deletion of the longer), so an equi-join on the ≤ L+1 deletion keys
    per url has EXACT recall at distance 1.  Shared keys can also arise
    at distance 2 (e.g. "ab"/"ba" share "a"), so candidates are
    verified with one levenshtein call — computed on candidate pairs
    only, never quadratically.

    Scale shape: (L+1)·N key rows shuffle once (L = url length, ~60-80
    on the web — two orders of magnitude below any pairwise scheme);
    candidate multiplicity is bounded by near-duplicate-url density,
    the thing being measured.  At corpus scale join on
    ``xxhash64(key)`` instead of the raw key string to shrink shuffle
    bytes 8x (the oracle keeps raw keys so both engines join on
    identical values; hash-join keys are an exact-equality superset —
    collisions are removed by the same levenshtein verify).
    """
    u = df.select(F.col(id_col), F.col(url_col).alias("_u"))
    dels = F.transform(
        F.sequence(F.lit(1), F.length("_u")),
        lambda i: F.concat(
            F.substring(F.col("_u"), F.lit(1), i - 1),
            F.substring(F.col("_u"), i + 1, F.length("_u")),
        ),
    )
    keys = u.select(
        id_col, "_u",
        F.explode(
            F.array_union(F.array(F.col("_u")), dels)
        ).alias("_k"),
    )
    a = keys.select(
        F.col(id_col).alias("id_a"), F.col("_u").alias("url_a"),
        F.col("_k"),
    )
    b = keys.select(
        F.col(id_col).alias("id_b"), F.col("_u").alias("url_b"),
        F.col("_k"),
    )
    cand = (
        a.join(b, "_k")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "url_a", "url_b")
        .distinct()
    )
    return cand.select(
        "id_a", "id_b",
        F.levenshtein("url_a", "url_b").cast("bigint").alias("dist"),
    ).where(F.col("dist") <= 1)
