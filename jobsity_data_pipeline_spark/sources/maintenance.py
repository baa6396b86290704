"""Table maintenance for the parquet hist tables the upsert pipeline
produces (pipeline/trips.py): streaming/batch upserts append small
files every micro-batch, and scan efficiency at 100 TB depends on
compacting them back to near-target file sizes.

Reference parity: the reference's Postgres hist table gets this for
free from the storage engine (populate_postgres.sql upsert); a
file-based lake needs an explicit OPTIMIZE-style pass (the Delta/
Iceberg 'compaction' maintenance job, re-expressed on plain parquet).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(df: DataFrame, target_rows_per_file: int) -> int:
    """Number of output files for an exact-count compaction plan."""
    n = df.count()
    return max(1, math.ceil(n / max(1, target_rows_per_file)))


def compact_parquet(spark: SparkSession, path: str,
                    target_rows_per_file: int = 1_000_000) -> dict:
    """Rewrite a parquet directory into ``ceil(rows/target)`` files.

    Local-filesystem swap semantics: the compacted copy is written to a
    sibling temp dir, then atomically renamed over the original (rename
    is atomic on POSIX; on object stores this step must be replaced by
    a transactional table format — Delta/Iceberg commit — which is the
    production path; this operator is the maintenance job's Spark
    core). Row content is preserved exactly; only file layout changes.

    Returns {"files_before", "files_after", "rows"} for observability.
    """
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / max(1, target_rows_per_file)))
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {
        "files_before": len(before),
        "files_after": len(after),
        "rows": rows,
    }
