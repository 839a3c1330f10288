"""Table maintenance: the reference's OPTIMIZE pass re-expressed for OSS.

The reference runs `OPTIMIZE {fqn}` over an allowlist, skipping views/MVs
by tableType, with strict/lenient failure modes (reference:
job_tasks/ops/optimize_tables.py:17-52, 89-132). Delta OSS would use the
same SQL; on parquet tables compaction = coalesce-rewrite to a target
file count. Small-file pressure is the same problem at 100 TB — Bronze
appends one file per ingest, so periodic compaction keeps scan
parallelism aligned with data size instead of file count.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from youtube_analytics_lakehouse_databricks_spark import storage


def optimize_tables(
    spark: SparkSession,
    fqns: list[str],
    strict: bool = False,
    target_partitions: int | None = None,
) -> dict[str, str]:
    """Compact each table; skip non-tables; 'error'/'skipped'/'optimized'
    per fqn, raising only in strict mode (optimize_tables.py:110-132).

    The rewrite goes through storage.swap_overwrite, which captures and
    re-applies the table's existing partition layout — compacting a
    snapshot_date-partitioned Bronze table must NOT drop its partitioning,
    or the next partitioned append fails with a layout mismatch.
    On Delta the whole body becomes `OPTIMIZE {fqn}` (metadata compaction,
    no rewrite-by-read needed)."""
    results: dict[str, str] = {}
    for fqn in fqns:
        try:
            if not spark.catalog.tableExists(fqn):
                results[fqn] = "skipped_missing"
                continue
            table = spark.catalog.getTable(fqn)
            if (table.tableType or "").upper() == "VIEW":
                results[fqn] = "skipped_view"  # optimize_tables.py:91-94
                continue
            if storage.TABLE_FORMAT == "delta":
                spark.sql(f"OPTIMIZE {fqn}")
                results[fqn] = "optimized"
                continue
            df = spark.table(fqn)
            n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
            storage.swap_overwrite(spark, df.coalesce(n), fqn)
            results[fqn] = "optimized"
        except Exception as e:  # lenient mode records and continues
            if strict:
                raise
            results[fqn] = f"error: {e}"
    return results
