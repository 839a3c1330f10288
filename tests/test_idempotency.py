"""Idempotency contract (SURVEY §7.4.9): re-running ingestion for the same
run_id must not duplicate (DELETE-then-append); re-running refresh must be
a no-op on unchanged Bronze."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.models.pipeline import build_graph
from youtube_analytics_lakehouse_databricks_spark.plans.registry import ensure_schemas
from youtube_analytics_lakehouse_databricks_spark.sources.envelope import ingest
from youtube_analytics_lakehouse_databricks_spark.sources.fixtures import FixtureSource, run_contexts


def test_reingest_same_run_id_no_duplicates(spark):
    ensure_schemas(spark)
    ctx = run_contexts(1)[0]
    src = FixtureSource(gen=1)
    ingest(spark, src, ctx)
    first = spark.table("bronze.videos_raw").count()
    ingest(spark, src, ctx)  # same run_id again
    assert spark.table("bronze.videos_raw").count() == first
    # exactly one envelope row for this run_id
    assert spark.table("bronze.videos_raw").filter(f"run_id = '{ctx.run_id}'").count() == 1


def test_refresh_is_deterministic(spark):
    ensure_schemas(spark)
    ctx = run_contexts(1)[0]
    ingest(spark, FixtureSource(gen=1), ctx)
    graph = build_graph()
    graph.refresh(spark)
    counts1 = {v.fqn: spark.table(v.fqn).count() for v in graph.topo_order()}
    graph.refresh(spark)
    counts2 = {v.fqn: spark.table(v.fqn).count() for v in graph.topo_order()}
    assert counts1 == counts2


def test_scoped_refresh_pulls_upstream(spark):
    graph = build_graph()
    refreshed = graph.refresh(spark, only={"gold_video_country_daily_summary"})
    names = {fqn.split(".")[1] for fqn in refreshed}
    # upstream closure: fact + videos + scd2 + dims come along
    assert "fact_video_country_metrics" in names
    assert "silver_videos" in names
    assert "silver_video_metadata_scd2" in names
    assert "dim_country" in names
    assert "dim_country_reference" in names
    assert "gold_video_country_daily_summary" in names
    # unrelated marts don't refresh
    assert "gold_video_device_daily_summary" not in names
