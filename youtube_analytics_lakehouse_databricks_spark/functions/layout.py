"""Physical layout helpers: bucketed tables for co-located joins.

A join between two tables bucketed on the same key with the same bucket
count needs NO shuffle — each task zips matching buckets. At 100 TB this
is the difference between an exchange of the full fact table per join
and a scan-local join; pre-bucket the dimensions you join repeatedly.

Bucket pruning also applies: an equality predicate on the bucket key
scans one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import storage


def save_bucketed(
    df: DataFrame,
    fqn: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = (
        df.write.mode("overwrite")
        .format(storage.BUCKET_FORMAT)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(fqn)


def is_shuffle_free_join(spark: SparkSession, left_fqn: str, right_fqn: str, key: str) -> bool:
    """True when joining the two tables on ``key`` plans without a shuffle
    exchange (both sides bucket-distributed on the key)."""
    import io
    import re
    from contextlib import redirect_stdout

    joined = spark.table(left_fqn).join(spark.table(right_fqn), key)
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    return not re.search(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE)
