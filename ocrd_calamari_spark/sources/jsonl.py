"""JSONL source: newline-delimited JSON document dumps (the other
crawl-adjacent interchange format besides WARC — CC-NET, Dolma, HF
datasets exports all ship .jsonl / .jsonl.gz shards).

Spark shape: this is a thin, OPINIONATED wrapper over the built-in JSON
reader — the right engine choice (distributed line splitting, JVM-side
Jackson parse, predicate/column pushdown into the parse), so no custom
record reader.  What the wrapper adds is the web-dump reality:

- **Schema is mandatory.**  Without one, Spark runs a full inference scan
  (2× read of a 100 TB dump) and any malformed shard silently widens
  types.  Callers pass the DDL; we add the corrupt-record column.
- **Corrupt lines are data, not task failures** (PERMISSIVE +
  ``columnNameOfCorruptRecord``): a poisoned shard yields rows with the
  raw line in ``_corrupt`` for quarantine, the same per-row error policy
  the extraction kernel and multimodal decoders use.
- **Lineage**: ``_file`` (input_file_name) for shard-level reprocessing.

.gz shards decompress transparently (TextInputFormat codec); gzip is not
splittable, so parallelism is shard-granular — matching how these dumps
are produced (many ~100 MB–1 GB shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    with_lineage: bool = True,
) -> DataFrame:
    """Read a JSONL dump with quarantine semantics.

    ``schema_ddl``: the expected document schema as a DDL string, e.g.
    ``"doc_id bigint, text string, lang string"``.  Rows that fail to
    parse (or violate the schema) come back with data columns null and
    the raw line preserved in ``_corrupt``.
    """
    if not schema_ddl:
        raise ValueError("schema_ddl must be a non-empty DDL string")
    # compare parsed FIELD NAMES, not a raw substring of the DDL — a
    # legitimate column like `_corruption_score` contains the reserved
    # name as a substring but does not collide with it
    from pyspark.sql.types import StructType

    if CORRUPT_COL in {
        f.name for f in StructType.fromDDL(schema_ddl).fields
    }:
        raise ValueError(
            f"schema_ddl must not declare the reserved column "
            f"{CORRUPT_COL!r}"
        )
    full = f"{schema_ddl}, {CORRUPT_COL} string"
    out = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if with_lineage:
        out = out.withColumn("_file", F.input_file_name())
    return out


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows lose the corrupt column; the
    quarantine keeps the raw line + lineage for reprocessing.

    The parsed frame is persisted first: Spark refuses plans over a raw
    JSON scan whose referenced columns are ONLY the internal corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g.
    the quarantine side after column pruning), and materializing the
    parse is the engine-sanctioned pattern.  It also means the dump is
    parsed once, not once per side.  Caller owns the cache lifetime
    (``unpersist()`` / ``spark.catalog.clearCache()`` when done).
    """
    df = df.persist()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
