"""Synthetic payload source for tests (FIXTURES.md requirements).

Builds deterministic YouTube-shaped payloads exercising every subtle path:
- three generations with overlapping business keys (latest-wins dedup);
- same-timestamp rows differing only in request_id (tiebreak path);
- SCD2: unchanged / changed / NULL<->'' swapped metadata generations;
- analytics matrices with shuffled headers, a missing `day` header
  (snapshot_date fallback), missing metric headers (NULL metrics),
  lowercase dimension values (upper() normalization), empty dimension
  values (filtered), one unknown traffic source (warn path).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable
from dataclasses import dataclass, field

from youtube_analytics_lakehouse_databricks_spark.sources.envelope import RunContext

CHANNEL_ID = "UC_chan_001"
VIDEO_IDS = ["vid_001", "vid_002", "vid_003"]


def channel_payload(gen: int) -> dict:
    return {
        "items": [
            {
                "id": CHANNEL_ID,
                "snippet": {
                    "title": f"Test Channel v{gen}",
                    "description": "A channel",
                    "customUrl": "@testchannel",
                    "country": "US",
                    "publishedAt": "2020-01-15T10:00:00Z",
                },
                "statistics": {
                    "viewCount": str(100000 + gen * 1000),
                    "subscriberCount": str(5000 + gen * 10),
                    "hiddenSubscriberCount": False,
                    "videoCount": "3",
                },
            }
        ]
    }


def videos_payload(gen: int) -> dict:
    """Metadata generations per FIXTURES §2.2: vid_001 title changes at
    gen 2 (new version); vid_002 flips description NULL<->'' (hash collapse,
    NO new version); vid_003 never changes."""
    items = []
    for vid in VIDEO_IDS:
        title = f"{vid} title"
        if vid == "vid_001" and gen >= 2:
            title = f"{vid} title CHANGED"
        description: str | None = "desc"
        if vid == "vid_002":
            description = None if gen % 2 == 0 else ""
        items.append(
            {
                "id": vid,
                "snippet": {
                    "channelId": CHANNEL_ID,
                    "title": title,
                    "description": description,
                    "publishedAt": "2024-05-01T00:00:00Z",
                    "defaultLanguage": "en",
                    "defaultAudioLanguage": "en",
                },
                "contentDetails": {
                    "duration": "PT10M",
                    "dimension": "2d",
                    "definition": "hd",
                    "caption": "false",
                    "licensedContent": True,
                    "projection": "rectangular",
                },
                "status": {
                    "uploadStatus": "processed",
                    "privacyStatus": "public",
                    "embeddable": True,
                    "publicStatsViewable": True,
                    "madeForKids": False,
                    "selfDeclaredMadeForKids": False,
                },
                "topicDetails": {"topicCategories": ["music", "entertainment"]},
                "statistics": {
                    "viewCount": str(1000 * gen),
                    "likeCount": str(50 * gen),
                    "favoriteCount": "0",
                    "commentCount": str(5 * gen),
                },
            }
        )
    return {"items": items}


def playlist_items_payload() -> dict:
    return {
        "items": [{"contentDetails": {"videoId": v}} for v in VIDEO_IDS],
        "item_count": len(VIDEO_IDS),
        "page_count": 1,
        "playlist_id": "UU_chan_001",
    }


def _matrix(headers: list[str], rows: list[list]) -> dict:
    return {
        "columnHeaders": [
            {"name": h, "columnType": "DIMENSION", "dataType": "STRING"} for h in headers
        ],
        "rows": rows,
    }


def channel_daily_payload(gen: int, days: list[str]) -> dict:
    # shuffled header order per FIXTURES §3 requirement (1)
    headers = [
        "views", "day", "likes", "comments",
        "estimatedMinutesWatched", "subscribersGained", "subscribersLost",
    ]
    rows = [
        [str(100 + gen), d, str(10 + gen), "2", str(300 + gen), "5", "1"] for d in days
    ]
    return _matrix(headers, rows)


def video_daily_payload(gen: int, days: list[str]) -> dict:
    headers = [
        "video", "day", "views", "likes", "comments",
        "estimatedMinutesWatched", "averageViewDuration",
    ]
    rows = [
        [v, d, str(40 + gen + i), str(4 + gen), "1", str(120 + gen), str(95.5 + gen)]
        for i, v in enumerate(VIDEO_IDS)
        for d in days
    ]
    return _matrix(headers, rows)


def traffic_source_payload(gen: int, days: list[str], missing_day: bool = False) -> dict:
    """Includes a lowercase source (upper path), an empty source (filtered),
    and one unknown id (warn path)."""
    sources = ["YT_SEARCH", "ext_url", "SHORTS", "", "MYSTERY_SOURCE"]
    if missing_day:
        # NOTIFICATION appears only in this generation, so its day-fallback
        # rows survive the latest-wins dedup and stay observable.
        headers = ["video", "insightTrafficSourceType", "views", "estimatedMinutesWatched"]
        rows = [
            [v, s, str(7 + gen), str(21 + gen)]
            for v in VIDEO_IDS[:2]
            for s in [*sources, "NOTIFICATION"]
        ]
    else:
        headers = ["video", "day", "insightTrafficSourceType", "views", "estimatedMinutesWatched"]
        rows = [
            [v, d, s, str(7 + gen), str(21 + gen)]
            for v in VIDEO_IDS[:2]
            for d in days
            for s in sources
        ]
    return _matrix(headers, rows)


def country_payload(gen: int, days: list[str], missing_metrics: bool = False) -> dict:
    """XX exercises the reference-miss fallback COALESCE(ref.name, code)."""
    countries = ["US", "de", "XX"]
    if missing_metrics:
        headers = ["video", "day", "country"]
        rows = [[v, d, c] for v in VIDEO_IDS[:2] for d in days for c in countries]
    else:
        headers = ["video", "day", "country", "views", "estimatedMinutesWatched"]
        rows = [
            [v, d, c, str(3 + gen), str(9 + gen)]
            for v in VIDEO_IDS[:2]
            for d in days
            for c in countries
        ]
    return _matrix(headers, rows)


def device_payload(gen: int, days: list[str]) -> dict:
    devices = ["DESKTOP", "mobile", "TV"]
    headers = ["video", "day", "deviceType", "views", "estimatedMinutesWatched"]
    rows = [
        [v, d, dev, str(2 + gen), str(6 + gen)]
        for v in VIDEO_IDS[:2]
        for d in days
        for dev in devices
    ]
    return _matrix(headers, rows)


@dataclass
class FixtureSource:
    """PayloadSource yielding one generation of all 8 payload families."""

    gen: int = 1
    days: list[str] = field(default_factory=lambda: ["2025-08-01", "2025-08-02"])

    def fetch(self, ctx: RunContext) -> Iterable[tuple[str, dict]]:
        yield "channels_raw", channel_payload(self.gen)
        yield "videos_raw", videos_payload(self.gen)
        yield "playlist_items_raw", playlist_items_payload()
        yield "analytics_channel_daily_raw", channel_daily_payload(self.gen, self.days)
        yield "analytics_video_daily_raw", video_daily_payload(self.gen, self.days)
        yield (
            "analytics_video_traffic_source_daily_raw",
            traffic_source_payload(self.gen, self.days, missing_day=self.gen == 2),
        )
        yield (
            "analytics_video_country_daily_raw",
            country_payload(self.gen, self.days, missing_metrics=self.gen == 2),
        )
        yield "analytics_video_device_daily_raw", device_payload(self.gen, self.days)


def run_contexts(n: int, start: dt.date = dt.date(2025, 8, 1)) -> list[RunContext]:
    """n deterministic run contexts with increasing snapshot dates/timestamps."""
    out = []
    for i in range(n):
        day = start + dt.timedelta(days=i)
        out.append(
            RunContext(
                run_id=f"run-{i:03d}",
                snapshot_date=day,
                ingest_ts_utc=dt.datetime(day.year, day.month, day.day, 6, 0, 0),
            )
        )
    return out
