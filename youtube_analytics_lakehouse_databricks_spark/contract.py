"""Bronze data contract: envelope schema + payload parse schemas.

Mirrors the reference's fixed 7-column Bronze envelope
(reference: lakeflow/bootstrap_unity_catalog.sql:16-26,
job_tasks/bronze/ingest_data_api_to_bronze.py:28-38) and the explicit
schema-on-read DDL strings its Silver layer feeds to from_json
(reference: lakeflow/bronze_to_silver_pipeline.sql:18-21, 83-85,
143-145, 309-312, 381-385).
"""

from __future__ import annotations

from pyspark.sql import types as T

SOURCE_SYSTEM = "youtube"
SCHEMA_VERSION = "v1"

# The universal envelope: one row per API response payload.
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_date", T.DateType(), False),
        T.StructField("ingest_ts_utc", T.TimestampType(), False),
        T.StructField("source_system", T.StringType(), False),
        T.StructField("request_id", T.StringType(), False),
        T.StructField("schema_version", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)

BRONZE_TABLES = [
    "channels_raw",
    "playlist_items_raw",
    "videos_raw",
    "analytics_channel_daily_raw",
    "analytics_video_daily_raw",
    "analytics_video_traffic_source_daily_raw",
    "analytics_video_country_daily_raw",
    "analytics_video_device_daily_raw",
]

# Data API envelope parse schemas (from_json DDL strings).
CHANNELS_SCHEMA = (
    "STRUCT<items: ARRAY<STRUCT<id: STRING, "
    "snippet: STRUCT<title: STRING, description: STRING, customUrl: STRING, "
    "country: STRING, publishedAt: STRING>, "
    "statistics: STRUCT<viewCount: STRING, subscriberCount: STRING, "
    "hiddenSubscriberCount: BOOLEAN, videoCount: STRING>>>>"
)

VIDEO_STATS_SCHEMA = (
    "STRUCT<items: ARRAY<STRUCT<id: STRING, "
    "snippet: STRUCT<channelId: STRING>, "
    "statistics: STRUCT<viewCount: STRING, likeCount: STRING, "
    "favoriteCount: STRING, commentCount: STRING>>>>"
)

VIDEO_METADATA_SCHEMA = (
    "STRUCT<items: ARRAY<STRUCT<id: STRING, "
    "snippet: STRUCT<channelId: STRING, title: STRING, description: STRING, "
    "publishedAt: STRING, defaultLanguage: STRING, defaultAudioLanguage: STRING>, "
    "contentDetails: STRUCT<duration: STRING, dimension: STRING, definition: STRING, "
    "caption: STRING, licensedContent: BOOLEAN, projection: STRING>, "
    "status: STRUCT<uploadStatus: STRING, privacyStatus: STRING, embeddable: BOOLEAN, "
    "publicStatsViewable: BOOLEAN, madeForKids: BOOLEAN, selfDeclaredMadeForKids: BOOLEAN>, "
    "topicDetails: STRUCT<topicCategories: ARRAY<STRING>>>>>"
)

VIDEO_CORE_SCHEMA = (
    "STRUCT<items: ARRAY<STRUCT<id: STRING, "
    "snippet: STRUCT<channelId: STRING, title: STRING, publishedAt: STRING>, "
    "status: STRUCT<privacyStatus: STRING, uploadStatus: STRING>>>>"
)

# Analytics API report matrix: header-described positional rows, parsed with
# primitivesAsString so mixed-type cells all arrive as strings and the casts
# below are the single source of typing.
ANALYTICS_MATRIX_SCHEMA = (
    "STRUCT<columnHeaders: ARRAY<STRUCT<name: STRING, columnType: STRING, "
    "dataType: STRING>>, rows: ARRAY<ARRAY<STRING>>>"
)

# The 22-value known traffic source list (dbt/tests/warn_new_traffic_source_ids.sql:9-33).
KNOWN_TRAFFIC_SOURCES = [
    "ADVERTISING", "ANNOTATION", "CAMPAIGN_CARD", "END_SCREEN", "EXT_URL",
    "HASHTAGS", "LIVE_REDIRECT", "NO_LINK_EMBEDDED", "NO_LINK_OTHER",
    "NOTIFICATION", "PLAYLIST", "PRODUCT_PAGE", "PROMOTED", "SHORTS",
    "SOUND_PAGE", "SUBSCRIBER", "VIDEO_REMIXES", "YT_CHANNEL",
    "YT_OTHER_PAGE", "YT_SEARCH", "YT_WATCH_PAGE", "UNKNOWN",
]

# Accepted device types (dbt/models/schema.yml:90-98).
ACCEPTED_DEVICE_TYPES = ["DESKTOP", "MOBILE", "TABLET", "TV", "GAME_CONSOLE", "UNKNOWN"]
