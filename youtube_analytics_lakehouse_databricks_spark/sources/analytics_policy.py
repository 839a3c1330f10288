"""Analytics-API ingestion policy: date-window resolution + the ordered
fallback ladder, normalized to the header+rows matrix Bronze expects.

Re-expresses the reference's driver-side retry policy (reference:
job_tasks/bronze/ingest_analytics_api_to_bronze.py — window resolution
:57-79, fallback chain :206-229, bulk video-dimension ladder :256-338,
per-video filter loop :353-430, report params :232-253) as pure Python
behind a transport protocol: no network dependency, tests inject fake
clients, and a real deployment plugs an OAuth'd HTTP GET.

Policy summary (all behavior, no HTTP):
- Window: explicit YYYY-MM-DD range (end defaults to yesterday), or a
  rolling N-day lookback ending yesterday; ``auto``-style keywords mean
  "use the default"; validation errors mirror the reference's messages.
- Fallback chain: try each params dict in order; first success wins and
  is annotated with fallback_used/fallback_level/previous_errors; all
  failing -> a structured error envelope listing every attempt.
- Video-dimension reports degrade along TWO axes: drop the expensive
  metric (estimatedMinutesWatched), then drop the ``day`` dimension —
  bulk (day,video,dim) -> (day,video,dim views-only) -> (video,dim) ->
  (video,dim views-only); if every bulk shape fails, loop per video with
  ``filters: video==<id>`` degrading the same way. Every response is
  normalized to one canonical 5-column header+rows matrix so Silver's
  header-positional extraction works unchanged.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable
from typing import Any, Protocol

from youtube_analytics_lakehouse_databricks_spark.sources.envelope import RunContext

# Keywords that mean "use the default" for each bound (reference :58-62).
_AUTO_START = {"auto", "default", "lookback", "rolling"}
_AUTO_END = {"auto", "default", "yesterday"}

CHANNEL_DAILY_METRICS = (
    "views,likes,comments,estimatedMinutesWatched,subscribersGained,subscribersLost"
)
VIDEO_DAILY_METRICS = "views,likes,comments,estimatedMinutesWatched,averageViewDuration"

# Canonical output matrix for every video-dimension report (reference :301-332).
_DIM_HEADERS = ("video", "day", None, "views", "estimatedMinutesWatched")


def _parse_iso_date(value: str, arg_name: str) -> dt.date:
    try:
        return dt.datetime.strptime(value, "%Y-%m-%d").date()
    except ValueError as exc:
        raise ValueError(f"{arg_name} must be in YYYY-MM-DD format. Got '{value}'.") from exc


def resolve_window(
    start_date: str = "",
    end_date: str = "",
    lookback_days: int = 7,
    today: dt.date | None = None,
) -> tuple[dt.date, dt.date, str]:
    """(start, end, mode): explicit range or rolling lookback ending
    yesterday (reference :57-79). ``today`` is injectable so tests are
    deterministic."""
    today = today or dt.date.today()
    start_raw = str(start_date or "").strip()
    end_raw = str(end_date or "").strip()
    if start_raw.lower() in _AUTO_START:
        start_raw = ""
    if end_raw.lower() in _AUTO_END:
        end_raw = ""

    yesterday = today - dt.timedelta(days=1)
    if start_raw:
        start = _parse_iso_date(start_raw, "start-date")
        end = _parse_iso_date(end_raw, "end-date") if end_raw else yesterday
        if start > end:
            raise ValueError(
                f"start-date must be on or before end-date. Got start-date={start.isoformat()} "
                f"and end-date={end.isoformat()}."
            )
        return start, end, "explicit_date_range"

    if lookback_days <= 0:
        raise ValueError("lookback-days must be greater than 0.")
    return yesterday - dt.timedelta(days=lookback_days - 1), yesterday, "rolling_lookback"


class ReportClient(Protocol):
    """Transport seam: run one report query, return the API-shaped dict.

    A success is ``{"status": "ok", "columnHeaders": [...], "rows": [...]}``;
    a failure is ``{"status": "error", "error": {...}}``. The HTTP
    implementation maps response.ok / response.json() onto this shape
    (reference :151-177); tests return canned dicts."""

    def query(self, params: dict[str, str]) -> dict[str, Any]: ...


def query_with_fallback_chain(
    client: ReportClient, params_chain: list[dict[str, str]]
) -> dict[str, Any]:
    """Ordered retry ladder (reference :206-229): first ok wins, annotated
    with which fallback level served it; total failure returns every
    attempt's error."""
    if not params_chain:
        raise ValueError("params_chain must contain at least one query definition.")
    errors: list[dict[str, Any]] = []
    for level, params in enumerate(params_chain):
        payload = client.query(params)
        if payload.get("status") == "ok":
            if level > 0:
                payload = {
                    **payload,
                    "fallback_used": True,
                    "fallback_level": level,
                    "previous_errors": errors,
                }
            return payload
        errors.append({"params": params, "error": payload.get("error")})
    return {"status": "error", "errors": errors, "request": {"params_chain": params_chain}}


def channel_daily_params(start: dt.date, end: dt.date) -> dict[str, str]:
    """(reference :232-241)"""
    return {
        "ids": "channel==MINE",
        "startDate": start.isoformat(),
        "endDate": end.isoformat(),
        "metrics": CHANNEL_DAILY_METRICS,
        "dimensions": "day",
        "sort": "day",
    }


def video_daily_params(start: dt.date, end: dt.date) -> dict[str, str]:
    """(reference :244-253)"""
    return {
        "ids": "channel==MINE",
        "startDate": start.isoformat(),
        "endDate": end.isoformat(),
        "metrics": VIDEO_DAILY_METRICS,
        "dimensions": "day",
        "sort": "day",
    }


def bulk_dimension_chain(start: dt.date, end: dt.date, dimension: str) -> list[dict[str, str]]:
    """The 4-step bulk ladder: full -> views-only -> no-day -> no-day
    views-only (reference :264-300)."""
    base = {"ids": "channel==MINE", "startDate": start.isoformat(), "endDate": end.isoformat()}
    return [
        {**base, "metrics": "views,estimatedMinutesWatched",
         "dimensions": f"day,video,{dimension}", "sort": f"day,video,{dimension}"},
        {**base, "metrics": "views",
         "dimensions": f"day,video,{dimension}", "sort": f"day,video,{dimension}"},
        {**base, "metrics": "views,estimatedMinutesWatched",
         "dimensions": f"video,{dimension}", "sort": f"video,{dimension}"},
        {**base, "metrics": "views",
         "dimensions": f"video,{dimension}", "sort": f"video,{dimension}"},
    ]


def per_video_chain(
    start: dt.date, end: dt.date, dimension: str, video_id: str
) -> list[dict[str, str]]:
    """The 3-step per-video ladder with a video filter (reference :356-386)."""
    base = {
        "ids": "channel==MINE",
        "startDate": start.isoformat(),
        "endDate": end.isoformat(),
        "filters": f"video=={video_id}",
    }
    return [
        {**base, "metrics": "views,estimatedMinutesWatched",
         "dimensions": f"day,{dimension}", "sort": f"day,{dimension}"},
        {**base, "metrics": "views", "dimensions": f"day,{dimension}", "sort": f"day,{dimension}"},
        {**base, "metrics": "views", "dimensions": dimension, "sort": dimension},
    ]


def _canonical_headers(dimension: str) -> list[dict[str, str]]:
    out = []
    for name in _DIM_HEADERS:
        name = dimension if name is None else name
        col_type = "METRIC" if name in ("views", "estimatedMinutesWatched") else "DIMENSION"
        data_type = "INTEGER" if col_type == "METRIC" else "STRING"
        out.append({"name": name, "columnType": col_type, "dataType": data_type})
    return out


def _row_maps(payload: dict[str, Any]) -> Iterable[dict[str, Any]]:
    names = [h.get("name", "") for h in payload.get("columnHeaders", [])]
    for row in payload.get("rows", []) or []:
        yield {names[i]: row[i] for i in range(min(len(names), len(row)))}


def query_video_dimension(
    client: ReportClient,
    start: dt.date,
    end: dt.date,
    video_ids: list[str],
    dimension: str,
) -> dict[str, Any]:
    """Bulk ladder first; on total bulk failure fall back to the per-video
    filter loop; every outcome is normalized to the canonical 5-column
    matrix (reference :256-430). Missing columns (a dropped metric or the
    day dimension) surface as None cells — exactly what the Silver
    CASE/array_position guards expect."""
    bulk = query_with_fallback_chain(client, bulk_dimension_chain(start, end, dimension))
    if bulk.get("status") == "ok":
        rows = [
            [m.get("video"), m.get("day"), m.get(dimension),
             m.get("views"), m.get("estimatedMinutesWatched")]
            for m in _row_maps(bulk)
        ]
        return {
            "status": "ok",
            "columnHeaders": _canonical_headers(dimension),
            "rows": rows,
            "bulk_query_used": True,
            "fallback_level": bulk.get("fallback_level", 0),
        }

    if not video_ids:
        return {
            "status": "ok",
            "columnHeaders": _canonical_headers(dimension),
            "rows": [],
            "request": {"video_count": 0, "dimension": dimension},
        }

    rows: list[list[Any]] = []
    errors: list[dict[str, Any]] = []
    for video_id in video_ids:
        payload = query_with_fallback_chain(
            client, per_video_chain(start, end, dimension, video_id)
        )
        if payload.get("status") != "ok":
            errors.append({"video_id": video_id, "errors": payload.get("errors")})
            continue
        for m in _row_maps(payload):
            rows.append(
                [video_id, m.get("day"), m.get(dimension),
                 m.get("views"), m.get("estimatedMinutesWatched")]
            )

    status = "ok" if not errors else ("partial_error" if rows else "error")
    return {
        "status": status,
        "columnHeaders": _canonical_headers(dimension),
        "rows": rows,
        "errors": errors,
        "bulk_query_error": bulk.get("errors"),
        "per_video_used": True,
    }


_DIMENSION_TABLES = {
    "analytics_video_traffic_source_daily_raw": "insightTrafficSourceType",
    "analytics_video_country_daily_raw": "country",
    "analytics_video_device_daily_raw": "deviceType",
}


class AnalyticsPolicySource:
    """PayloadSource running the full Analytics-API policy for one run:
    channel daily + video daily + the three per-dimension reports, each
    through its fallback ladder, emitting one envelope payload per table
    (reference main flow :609-660)."""

    def __init__(
        self,
        client: ReportClient,
        video_ids: list[str],
        start_date: str = "",
        end_date: str = "",
        lookback_days: int = 7,
        today: dt.date | None = None,
    ) -> None:
        self.client = client
        self.video_ids = video_ids
        self.start, self.end, self.window_mode = resolve_window(
            start_date, end_date, lookback_days, today
        )

    def fetch(self, ctx: RunContext) -> Iterable[tuple[str, dict]]:
        yield (
            "analytics_channel_daily_raw",
            self.client.query(channel_daily_params(self.start, self.end)),
        )
        yield (
            "analytics_video_daily_raw",
            self.client.query(video_daily_params(self.start, self.end)),
        )
        for table, dimension in _DIMENSION_TABLES.items():
            yield (
                table,
                query_video_dimension(self.client, self.start, self.end, self.video_ids, dimension),
            )
