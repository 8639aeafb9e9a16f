"""Driver-contract guard: __spark_entry__ loads, entry() runs at sf0.001,
every queries() entry is callable, and a fast subset of oracle pairs match
DuckDB (the full gate is scripts/check_oracles.py at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
FAST_ORACLED = ["filter_project", "topk_per_lang", "join_revenue",
                "token_stats", "lang_id", "salted_agg", "json_extract",
                "decode_media", "resize_images", "frame_plan",
                "exact_dup_groups", "repetition_quality", "decontaminate",
                "domain_quota", "incremental_dedup", "bpe_pair_counts",
                "domain_divergence", "inverted_index",
                "quality_classifier", "lm_quality", "crawl_depth",
                "snapshot_diff", "latest_snapshot", "normalized_dedup",
                "soft404_filter", "mojibake_detect", "clean_pipeline",
                "lang_mix", "global_shuffle", "vocab_coverage",
                "paragraph_dedup", "bpe_encode", "exact_sample"]


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert {"url", "text", "conf"} <= set(df.columns)


def test_every_query_is_registered_consistently(entrymod):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # no orphan oracles
    assert len(oracles) >= 18


@pytest.mark.parametrize("name", FAST_ORACLED)
def test_oracle_parity_fast_subset(spark, entrymod, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    a, b = normalize(sdf), normalize(odf)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_rotation_front_loads_unproven_keys(entrymod, tmp_path):
    """queries() ordering is the mechanical rotation: never-checked /
    changed-since-green / previously-failed keys sort into the driver's
    ~50-entry sample window ahead of recently-green ones."""
    import json

    from ocrd_calamari_spark.rotation import rotated_order

    keys = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())

    # live ordering: every key the evidence files have never certified
    # must sit inside the first-50 window (there are < 50 of them today;
    # if the registry outgrows that, the assert flags the overflow)
    from ocrd_calamari_spark.rotation import load_evidence

    last = load_evidence(entrymod._REPO_DIR)
    never = [k for k in keys if k not in last]
    assert all(keys.index(k) < 50 for k in never), never

    # synthetic evidence: a failed row re-fronts; green rows demote by age
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a_old_green": {"err": None},
        "c_failed": {"err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "b_new_green": {"err": None},
        "d_rows_only": {"err": "no_oracle"},
    }))
    order = rotated_order(
        ["a_old_green", "b_new_green", "c_failed", "d_rows_only", "e_never"],
        {"a_old_green", "b_new_green", "c_failed", "e_never"},
        str(tmp_path),
        forced_front=(),
    )
    assert order == ["c_failed", "e_never", "a_old_green", "b_new_green",
                     "d_rows_only"]
