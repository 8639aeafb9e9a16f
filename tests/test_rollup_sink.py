"""write_partitioned_rollup: dynamic partition overwrite must replace
exactly the partitions being written — history stays byte-identical, and
re-running a partition is idempotent (no appends, no truncation).

This is the sink-side merge contract a periodic (daily) rollup job needs:
day N's recompute may not touch day N-1, and a retry of day N may not
double its rows.
"""

import os

from pyspark.sql import functions as F

from ocrd_calamari_spark.pipeline import write_partitioned_rollup


def _day_files(out_dir, day):
    d = os.path.join(out_dir, f"day={day}")
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


class TestPartitionedRollupSink:
    def test_dynamic_overwrite_replaces_only_written_days(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "rollup")
        v1 = spark.createDataFrame(
            [("d1", "hostA", 10), ("d1", "hostB", 20), ("d2", "hostA", 5)],
            ["day", "host", "n"],
        ).coalesce(1)
        write_partitioned_rollup(v1, out, "day")
        d1_before = _day_files(out, "d1")

        # recompute d2 with corrected numbers + a new host; d1 untouched
        v2 = spark.createDataFrame(
            [("d2", "hostA", 7), ("d2", "hostC", 3)], ["day", "host", "n"]
        ).coalesce(1)
        write_partitioned_rollup(v2, out, "day")

        assert _day_files(out, "d1") == d1_before  # same files, same bytes
        got = {
            (r["day"], r["host"]): r["n"]
            for r in spark.read.parquet(out).collect()
        }
        assert got == {
            ("d1", "hostA"): 10,
            ("d1", "hostB"): 20,
            ("d2", "hostA"): 7,
            ("d2", "hostC"): 3,
        }

    def test_rerun_is_idempotent(self, spark, tmp_path):
        out = str(tmp_path / "rollup")
        v = spark.createDataFrame(
            [("d1", "hostA", 10), ("d1", "hostB", 20)], ["day", "host", "n"]
        ).coalesce(1)
        write_partitioned_rollup(v, out, "day")
        write_partitioned_rollup(v, out, "day")  # retry of the same day
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 2  # replaced, not appended
        assert {r["host"] for r in rows} == {"hostA", "hostB"}

    def test_static_overwrite_would_destroy_history(self, spark, tmp_path):
        """Negative control documenting WHY dynamic mode is load-bearing:
        the same write with static overwrite truncates the other day."""
        out = str(tmp_path / "rollup")
        v1 = spark.createDataFrame(
            [("d1", "hostA", 10)], ["day", "host", "n"]
        ).coalesce(1)
        write_partitioned_rollup(v1, out, "day")
        v2 = spark.createDataFrame(
            [("d2", "hostA", 5)], ["day", "host", "n"]
        ).coalesce(1)
        (
            v2.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("day")
            .parquet(out)
        )
        days = {r["day"] for r in spark.read.parquet(out).collect()}
        assert days == {"d2"}  # d1 is gone — the failure mode dynamic avoids
