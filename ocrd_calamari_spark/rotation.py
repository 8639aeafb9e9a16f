"""Mechanical driver-sample rotation for the query registry.

The per-round correctness harness samples the FIRST ~50 ``queries()``
keys, while the registry holds 125+ — so ordering decides which keys get
driver-visible evidence each round.  Rounds 1-4 reordered the dict by
hand; this module derives the order from the recorded evidence itself
(``CORRECTNESS_r*.json`` in the repo root), so the rotation is
deterministic and self-maintaining:

1. keys FORCED to the front (implementation changed after their last
   green driver row — the one judgment a file scan can't make; kept as
   an explicit, documented list),
2. keys never checked by any driver round, hash-checkable (has a DuckDB
   oracle) before rows-only — a rows-only row certifies less, so it must
   not displace a hash-checkable first shot,
3. previously-checked keys, least-recently-checked first (ascending last
   round), hash-checkable before rows-only within a round,
4. name as the final tiebreak everywhere (determinism).

A key whose last driver row recorded an error sorts as never-checked —
a failure must be re-proven, not rotated out.
"""

from __future__ import annotations

import glob
import json
import os
import re

# Keys whose implementation changed AFTER their most recent green driver
# row.  File-to-key mapping is many-to-many, so this stays a reviewed
# list rather than a git heuristic; entries are removed once a newer
# CORRECTNESS round shows them green again (the sort does that
# automatically — a fresh row updates last_round past the change).
CHANGED_SINCE_GREEN: tuple[str, ...] = (
    # round-4 bounded rewrite landed after the r03 green row
    "inverted_index",
    # round-5 driver_vocab_max size switch in bpe_train_merges landed
    # after bpe_train's last green row (bpe_encode shares the change but
    # has never been driver-checked, so it auto-fronts already)
    "bpe_train",
    # round-6 optimization pass: the packed-key counting-join rewrite of
    # jaccard_index_dedup (functions/dedup.py:_jaccard_packed_join)
    # changes the physical computation of every consumer
    "jaccard_dedup",
    "leakage_safe_split",
    "effective_tokens",
    "keep_best_dedup",
    # round-6: single-partition presentation sort (_psort) + up-front
    # input spreading (_tw) landed in these after their last green row
    "q1_pricing_summary",
    "join_revenue",
    "sessionize",
    "repetition_quality",
    "decontaminate",
    "pack_sequences",
    "span_dedup",
    "boilerplate_lines",
    "anchor_text",
    "tfidf_keywords",
    "minhash_dedup",
    "sparse_cosine_join",
    "lm_quality",
    "paragraph_dedup",
    "bpe_encode",
    "dsir_weights",
    "mojibake_detect",
    "tokenizer_fertility",
    "clean_pipeline",
    "lang_mix",
    "lang_id",
    "domain_divergence",
    "bpe_pair_counts",
    "pmi_pairs",
    # round-6 (late audit): the remaining keys whose computation ALSO
    # changed after their last green row — the lambda-binding fix in
    # word_shingles / rolling_fingerprints / chunk builders
    # (functions/text.py, functions/dedup.py), the shared
    # _minhash_sig_table refactor, simhash's exactly-once pair emission,
    # cosine_topk's scan spread, and the _with_injected_dups post-union
    # repartition that feeds the whole dedup family
    "simhash_dedup",
    "cosine_topk",
    "chunk_documents",
    "rolling_fingerprints",
    "winnow_fingerprints",
    "minhash_recall",
    "incremental_neardup",
    "dedup_clusters",
    "containment_join",
)

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def load_evidence(repo_dir: str) -> dict[str, int]:
    """Map each ever-checked key to the latest round that checked it
    (rows with a recorded error other than the inherent ``no_oracle``
    are treated as unchecked)."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            err = row.get("err") if isinstance(row, dict) else None
            if err not in (None, "no_oracle"):
                continue  # failed row: key must sort as unproven
            last[key] = max(last.get(key, 0), rnd)
    return last


def rotated_order(
    keys: list[str],
    oracle_keys: set[str],
    repo_dir: str,
    forced_front: tuple[str, ...] = CHANGED_SINCE_GREEN,
) -> list[str]:
    """Return ``keys`` reordered by the rotation policy above.

    With no CORRECTNESS files present (fresh clone), every key is
    never-checked and the result is simply hash-checkable-first
    alphabetical — still deterministic.
    """
    last = load_evidence(repo_dir)
    forced = {k: i for i, k in enumerate(forced_front) if k in set(keys)}

    def sort_key(k: str):
        if k in forced:
            return (0, forced[k], 0, k)
        return (1, last.get(k, 0), 0 if k in oracle_keys else 1, k)

    return sorted(keys, key=sort_key)
