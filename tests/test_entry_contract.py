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
                "soft404_filter", "global_shuffle", "vocab_coverage",
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
