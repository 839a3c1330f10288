"""Gold layer: 5 summary marts (reference: dbt/models/gold_*.sql).

Each is a projection + left-join denormalization over silver tables. The
dim sides are broadcast (small); the silver_videos join key is video_id.
NULL policy preserved exactly: per-dimension marts coalesce
estimated_minutes_watched to 0, gold_video_daily_summary does NOT
(SURVEY §7.4.10) — a NULL channel_id after the left join is the designed
orphan-detection signal, not a bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gold_channel_daily_summary(spark: SparkSession) -> DataFrame:
    """(dbt/models/gold_channel_daily_summary.sql:1-13)"""
    f = spark.table("silver.fact_channel_daily_metrics")
    return f.select(
        "channel_id",
        "date",
        "views",
        "likes",
        "comments",
        "estimated_minutes_watched",
        "subscribers_gained",
        "subscribers_lost",
        (F.col("subscribers_gained") - F.col("subscribers_lost")).alias("net_subscribers"),
        "snapshot_date",
        "ingest_ts_utc",
    )


def gold_video_daily_summary(spark: SparkSession) -> DataFrame:
    """(dbt/models/gold_video_daily_summary.sql:1-14) — no emw coalesce."""
    f = spark.table("silver.fact_video_daily_metrics")
    v = spark.table("silver.silver_videos").select("video_id", "channel_id")
    return f.join(v, "video_id", "left").select(
        "video_id",
        "channel_id",
        "date",
        "views",
        "likes",
        "comments",
        "estimated_minutes_watched",
        "average_view_duration_seconds",
        "snapshot_date",
        "ingest_ts_utc",
    )


def _dim_mart(
    spark: SparkSession, fact: str, dim_table: str, key: str, name_col: str
) -> DataFrame:
    f = spark.table(fact)
    v = spark.table("silver.silver_videos").select("video_id", "channel_id")
    d = spark.table(dim_table).select(key, name_col)
    return (
        f.join(v, "video_id", "left")
        .join(F.broadcast(d), key, "left")
        .select(
            "video_id",
            "channel_id",
            "date",
            key,
            name_col,
            "views",
            F.coalesce(F.col("estimated_minutes_watched"), F.lit(0)).alias(
                "estimated_minutes_watched"
            ),
            "snapshot_date",
            "ingest_ts_utc",
        )
    )


def gold_video_country_daily_summary(spark: SparkSession) -> DataFrame:
    """(dbt/models/gold_video_country_daily_summary.sql:1-16)"""
    return _dim_mart(
        spark, "silver.fact_video_country_metrics", "silver.dim_country", "country_code", "country_name"
    )


def gold_video_device_daily_summary(spark: SparkSession) -> DataFrame:
    """(dbt/models/gold_video_device_daily_summary.sql:1-16)"""
    return _dim_mart(
        spark, "silver.fact_video_device_metrics", "silver.dim_device", "device_type", "device_name"
    )


def gold_video_traffic_source_daily_summary(spark: SparkSession) -> DataFrame:
    """(dbt/models/gold_video_traffic_source_daily_summary.sql:1-16)"""
    return _dim_mart(
        spark,
        "silver.fact_video_traffic_source_metrics",
        "silver.dim_traffic_source",
        "source_id",
        "source_name",
    )
