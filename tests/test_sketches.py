"""Sketch aggregates: approximation error bounded against exact values."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.queries import registry


def test_hll_and_quantile_sketches_bounded(spark):
    rows = registry()["sketch_user_counts"].builder(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        # HLL default rsd is 5%; allow 3x slack for small groups
        assert abs(r["approx_users"] - r["exact_users"]) <= max(3, 0.15 * r["exact_users"])
        assert r["approx_p50"] is not None and r["approx_p99"] is not None
        assert r["approx_p50"] <= r["approx_p99"]
        # the query's own self-validation columns agree
        assert r["hll_ok"] and r["p50_ok"] and r["p99_ok"], r
        assert r["hll_rel_err"] <= 0.15
