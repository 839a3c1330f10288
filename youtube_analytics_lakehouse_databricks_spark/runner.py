"""End-to-end job runner: the reference's orchestration DAG as plain Python.

Stage order (reference: databricks.yml:34-155):
init_run_context -> ingest -> silver+gold refresh (Lakeflow + dbt stand-in)
-> quality tests -> optimize -> smoke checks -> finalize (run_if ALL_DONE
= a finally block).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from youtube_analytics_lakehouse_databricks_spark import contract
from youtube_analytics_lakehouse_databricks_spark.models.pipeline import build_graph
from youtube_analytics_lakehouse_databricks_spark.ops.contract_check import validate_bronze_contract
from youtube_analytics_lakehouse_databricks_spark.ops.maintenance import ZORDER_DEFAULTS, optimize_tables
from youtube_analytics_lakehouse_databricks_spark.ops.run_log import finalize_run, init_run_log
from youtube_analytics_lakehouse_databricks_spark.ops.smoke import smoke_checks
from youtube_analytics_lakehouse_databricks_spark.plans.registry import ensure_schemas
from youtube_analytics_lakehouse_databricks_spark.quality import checks as q
from youtube_analytics_lakehouse_databricks_spark.sources.envelope import PayloadSource, RunContext, ingest


def gold_quality_checks(spark: SparkSession, today: str | None = None) -> list[q.CheckResult]:
    """The dbt test suite (reference: dbt/models/schema.yml:18-126 +
    dbt/tests/*.sql) as DataFrame checks."""
    gcd = spark.table("gold.gold_channel_daily_summary")
    gvd = spark.table("gold.gold_video_daily_summary")
    gvc = spark.table("gold.gold_video_country_daily_summary")
    gvdev = spark.table("gold.gold_video_device_daily_summary")
    gvt = spark.table("gold.gold_video_traffic_source_daily_summary")
    videos = spark.table("silver.silver_videos")
    dim_country = spark.table("silver.dim_country")
    dim_device = spark.table("silver.dim_device")
    dim_traffic = spark.table("silver.dim_traffic_source")

    out = [
        # uniqueness at grain (test_gold_*_unique.sql)
        q.unique_grain(gcd, ["channel_id", "date"], "gold_channel_daily_unique"),
        q.unique_grain(gvd, ["video_id", "date"], "gold_video_daily_unique"),
        q.unique_grain(gvc, ["video_id", "date", "country_code"], "gold_video_country_unique"),
        q.unique_grain(gvdev, ["video_id", "date", "device_type"], "gold_video_device_unique"),
        q.unique_grain(gvt, ["video_id", "date", "source_id"], "gold_video_traffic_unique"),
        # not_null keys (schema.yml)
        q.not_null(gcd, ["channel_id", "date", "views"], "gold_channel_daily_not_null"),
        q.not_null(gvd, ["video_id", "channel_id", "date"], "gold_video_daily_not_null"),
        q.not_null(gvc, ["video_id", "date", "country_code"], "gold_video_country_not_null"),
        q.not_null(gvdev, ["video_id", "date", "device_type"], "gold_video_device_not_null"),
        q.not_null(gvt, ["video_id", "date", "source_id"], "gold_video_traffic_not_null"),
        # relationships (schema.yml:48-53, 69-74, 99-104, 120-125)
        q.relationships(gvd, videos, "video_id", "gold_video_daily_fk_videos"),
        q.relationships(gvc, dim_country, "country_code", "gold_video_country_fk_dim"),
        q.relationships(gvdev, dim_device, "device_type", "gold_video_device_fk_dim"),
        q.relationships(gvt, dim_traffic, "source_id", "gold_video_traffic_fk_dim"),
        # accepted device values (schema.yml:90-98)
        q.accepted_values(gvdev, "device_type", contract.ACCEPTED_DEVICE_TYPES, "device_enum"),
        # non-negative metrics (test_gold_metrics_non_negative.sql)
        q.non_negative(gcd, ["views", "comments", "estimated_minutes_watched"], "gcd_non_negative"),
        q.non_negative(gvd, ["views", "comments", "estimated_minutes_watched"], "gvd_non_negative"),
        q.non_negative(gvc, ["views", "estimated_minutes_watched"], "gvc_non_negative"),
        q.non_negative(gvdev, ["views", "estimated_minutes_watched"], "gvdev_non_negative"),
        q.non_negative(gvt, ["views", "estimated_minutes_watched"], "gvt_non_negative"),
        # freshness (test_gold_freshness_recency.sql; injectable today)
        q.freshness(gcd, "date", 7, today, "gcd_freshness"),
        q.freshness(gvd, "date", 7, today, "gvd_freshness"),
        # warn-only traffic source monitor (warn_new_traffic_source_ids.sql)
        q.warn_unknown_values(gvt, "source_id", contract.KNOWN_TRAFFIC_SOURCES, "warn_new_traffic_sources"),
    ]
    return out


def run_pipeline(
    spark: SparkSession,
    source: PayloadSource,
    ctx: RunContext | None = None,
    today: str | None = None,
    optimize: bool = False,
) -> dict:
    """One full run. Returns a structured report; raises on hard failures
    after finalizing the run log (run_if: ALL_DONE semantics)."""
    ctx = ctx or RunContext.new()
    ensure_schemas(spark)
    init_run_log(spark, ctx)
    report: dict = {"run_id": ctx.run_id}
    status = "success"
    try:
        report["ingested"] = ingest(spark, source, ctx)
        # Catalog contract gate (unity_catalog_setup.py:195-236): only the
        # tables this run touched — a fresh warehouse may not have all 8.
        report["contract_errors"] = validate_bronze_contract(
            spark, tables=sorted(report["ingested"])
        )
        if report["contract_errors"]:
            raise RuntimeError(
                "Bronze contract validation failed:\n"
                + "\n".join(f" - {e}" for e in report["contract_errors"])
            )
        graph = build_graph()
        report["refreshed"] = graph.refresh(spark)
        results = gold_quality_checks(spark, today=today)
        report["quality"] = q.run_checks(results)
        hard_failures = [
            name
            for name, r in report["quality"].items()
            if not r["passed"] and r["severity"] == "error"
        ]
        if hard_failures:
            status = "failed"
            report["failed_checks"] = hard_failures
        if optimize:
            # Bronze: plain small-file compaction. Gold facts: ZORDER on
            # (date, dimension key) so per-file min/max stats prune scans
            # for either predicate family (ZORDER_DEFAULTS).
            report["optimize"] = optimize_tables(
                spark,
                [f"bronze.{t}" for t in contract.BRONZE_TABLES] + sorted(ZORDER_DEFAULTS),
                zorder_cols=ZORDER_DEFAULTS,
            )
        report["smoke"] = smoke_checks(spark, today=today)
    except Exception:
        status = "failed"
        raise
    finally:
        finalize_run(spark, ctx.run_id, status, dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))
        report["status"] = status
    return report


def main() -> None:
    """CLI: run the full pipeline on the deterministic fixture source
    (three generations) and print the structured report as JSON."""
    import json

    from youtube_analytics_lakehouse_databricks_spark.session import get_spark
    from youtube_analytics_lakehouse_databricks_spark.sources.envelope import ingest as _ingest
    from youtube_analytics_lakehouse_databricks_spark.sources.fixtures import FixtureSource, run_contexts

    spark = get_spark(app_name="youtube_analytics_lakehouse_databricks_spark-runner")
    ctxs = run_contexts(3)
    ensure_schemas(spark)
    _ingest(spark, FixtureSource(gen=1), ctxs[0])
    _ingest(spark, FixtureSource(gen=2), ctxs[1])
    report = run_pipeline(spark, FixtureSource(gen=3), ctxs[2], today="2025-08-04", optimize=True)
    print(json.dumps(report, default=str, indent=2))


if __name__ == "__main__":
    main()
