"""Isolated per-query measurement + plan capture (guide §1.1/§1.4/§1.5).

bench.py is FROZEN for measurement; this harness exists so optimization
work can (a) time one query at a time through the noop sink with the
IDENTICAL session configuration bench.py uses, and (b) dump
``.explain("formatted")`` for the plan evidence in plans/r06/.

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--plans OUTDIR] \
        [--label SUFFIX] [query ...]

With no query names: the full bench.py HEADLINE list.  Prints one JSON
line {"queries": {name: best_sec}, "sf_dir": ..., "trials": N} plus a
per-query line to stderr as it goes (with host-steal measured across the
timed region, same honesty protocol as bench.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, make_session, membw_probe_gbps, steal_during
from ocrd_calamari_spark.entry_queries import QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query><label>.txt explains")
    ap.add_argument("--label", default="",
                    help="suffix for plan filenames, e.g. _before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = args.queries or HEADLINE
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    warm_sf = os.path.dirname(args.sf.rstrip("/")) + "/sf0.001"
    results: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.label}.txt"), "w") as f:
                f.write(buf.getvalue())
        if not args.no_warm and os.path.isdir(warm_sf):
            spark.catalog.clearCache()
            fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        best = None
        steal_best = None
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        for _ in range(args.trials):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            _, steal = steal_during(
                lambda: fn(spark, args.sf).write.format("noop")
                .mode("overwrite").save())
            sec = time.monotonic() - t0
            if best is None or sec < best:
                best, steal_best = sec, steal
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"{name}: {best:.3f}s (steal={steal_best:.3f}, "
              f"membw={membw_probe_gbps():.1f} GB/s)", file=sys.stderr)

    print(json.dumps({"queries": results, "sf_dir": args.sf,
                      "trials": args.trials}))
    spark.stop()


if __name__ == "__main__":
    main()
