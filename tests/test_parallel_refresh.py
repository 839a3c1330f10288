"""Concurrent same-depth MV refresh: dependency barriers hold and the
result is identical to a sequential refresh (dbt threads:4 parity —
reference dbt/profiles.yml:12)."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.plans.registry import (
    PipelineGraph,
    ViewDef,
    ensure_schemas,
)


def test_parallel_refresh_respects_depth_barriers(spark):
    ensure_schemas(spark, ("silver",))
    started: dict[str, int] = {}
    lock = threading.Lock()
    seq = iter(range(100))

    def leaf(tag):
        def build(s):
            with lock:
                started[tag] = next(seq)
            return s.range(3).select(F.col("id"), F.lit(tag).alias("src"))

        return build

    def combined(s):
        with lock:
            started["c"] = next(seq)
        # reads BOTH deps: fails unless the level barrier wrote them first
        return s.table("silver.par_a").unionByName(s.table("silver.par_b"))

    g = PipelineGraph()
    g.register(ViewDef("par_a", "silver", (), leaf("a")))
    g.register(ViewDef("par_b", "silver", (), leaf("b")))
    g.register(ViewDef("par_c", "silver", ("par_a", "par_b"), combined))
    refreshed = g.refresh(spark)

    assert refreshed == ["silver.par_a", "silver.par_b", "silver.par_c"]
    # c only starts after the whole first level completes
    assert started["c"] > started["a"] and started["c"] > started["b"]
    assert spark.table("silver.par_c").count() == 6
    assert set(
        r["src"] for r in spark.table("silver.par_c").select("src").distinct().collect()
    ) == {"a", "b"}


def test_scoped_refresh_pulls_upstream_only(spark):
    ensure_schemas(spark, ("silver",))
    g = PipelineGraph()
    g.register(ViewDef("sc_a", "silver", (), lambda s: s.range(1)))
    g.register(ViewDef("sc_b", "silver", ("sc_a",), lambda s: s.table("silver.sc_a")))
    g.register(ViewDef("sc_other", "silver", (), lambda s: s.range(2)))
    refreshed = g.refresh(spark, only={"sc_b"})
    assert refreshed == ["silver.sc_a", "silver.sc_b"]
