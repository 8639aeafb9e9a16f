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
