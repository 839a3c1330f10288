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


def optimize_tables(
    spark: SparkSession,
    fqns: list[str],
    strict: bool = False,
    target_partitions: int | None = None,
) -> dict[str, str]:
    """Compact each table; skip non-tables; 'error'/'skipped'/'optimized'
    per fqn, raising only in strict mode (optimize_tables.py:110-132)."""
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
            df = spark.table(fqn)
            n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
            df.coalesce(n).write.mode("overwrite").format("parquet").saveAsTable(
                f"{fqn}__compacted"
            )
            spark.table(f"{fqn}__compacted").write.mode("overwrite").format(
                "parquet"
            ).saveAsTable(fqn)
            spark.sql(f"DROP TABLE {fqn}__compacted")
            results[fqn] = "optimized"
        except Exception as e:  # lenient mode records and continues
            if strict:
                raise
            results[fqn] = f"error: {e}"
    return results
