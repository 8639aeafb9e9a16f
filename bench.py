"""Headline benchmark — prints ONE JSON line.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), then
measures the north_rule scaling criterion: the same extraction job at
local[8] vs local[CPUS] on identical input → throughput at both +
scaling efficiency (target ≥ 0.8 per BASELINE.json).

All timings force full materialization through the noop sink (no driver
collect).  Set SPARK_GRAFT_SKIP_SCALING=1 to skip the two-session scaling
measurement (e.g. for a quick smoke).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.entry_queries import QUERIES, pages_from_documents
from ocrd_calamari_spark.pipeline import extract_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "8"))

HEADLINE = [
    "q1_pricing_summary",
    "join_revenue",
    "running_total",
    "topk_per_lang",
    "sessionize",
    "hourly_windows",
    "cosine_topk",
    "exact_dedup",
    "token_stats",
    "quality_scores",
    "lang_id",
    "minhash_dedup",
    "simhash_dedup",
]


def make_session(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ocs-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def warm_python_workers(spark: SparkSession, cores: int) -> None:
    """Force python-worker spawn + module import on every core before any
    timed run — worker startup is a fixed cost that would otherwise be
    charged to the first measured job (and wreck small-run scaling)."""
    pages = replicated_pages(spark, SF_DIR, 1).limit(4 * cores)
    out = extract_df(
        pages, ExtractConfig(), with_lineage=False,
        num_partitions=4 * cores, salt=4,
    )
    out.write.format("noop").mode("overwrite").save()


def replicated_pages(spark: SparkSession, sf_dir: str, rep: int):
    """Deterministic ×rep corpus: distinct urls per copy, same payloads —
    the extraction workload for throughput/scaling runs."""
    pages = pages_from_documents(spark, sf_dir)
    return pages.select(
        F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("_rep"), "*"
    ).select(
        F.concat_ws("/", "url", F.col("_rep").cast("string")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


def run_noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def time_extraction(spark: SparkSession, rep: int, cores: int) -> tuple[float, int]:
    pages = replicated_pages(spark, SF_DIR, rep)
    n = pages.count()
    out = extract_df(
        pages, ExtractConfig(), with_lineage=False,
        num_partitions=4 * cores, salt=32,
    )
    return run_noop(out), n


def main():
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    results: dict[str, float] = {}

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, CPUS)

    ext_sec, n_docs = time_extraction(spark, REPLICATE, CPUS)
    results["extract_pages"] = round(ext_sec, 3)
    docs_per_sec = round(n_docs / ext_sec, 1)

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        results[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    scaling = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        lo_cores = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "8"))
        # larger corpus for the scaling pair so per-job fixed costs
        # (scheduling, scan, exchange) don't mask parallel speedup
        scale_rep = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "24"))
        thr = {}
        n_scale = 0
        for cores in (lo_cores, CPUS):
            s = make_session(cores)
            s.sparkContext.setLogLevel("ERROR")
            warm_python_workers(s, cores)
            sec, n_scale = time_extraction(s, scale_rep, cores)
            thr[cores] = n_scale / sec
            s.stop()
        eff = (thr[CPUS] / thr[lo_cores]) / (CPUS / lo_cores)
        scaling = {
            "cores_lo": lo_cores,
            "docs_per_sec_lo": round(thr[lo_cores], 1),
            "cores_hi": CPUS,
            "docs_per_sec_hi": round(thr[CPUS], 1),
            "docs": n_scale,
            "efficiency": round(eff, 3),
        }

    out = {
        "metric": "headline_suite_sec",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "extraction": {"docs": n_docs, "docs_per_sec": docs_per_sec},
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
