"""Structured Streaming: incremental latest-wins merge + watermarked windows."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.sources.fixtures import channel_payload, run_contexts
from youtube_analytics_lakehouse_databricks_spark.streaming.incremental import (
    incremental_silver_channels,
    read_merged,
    windowed_event_counts,
)


def _write_envelope_file(path, ctx, payload):
    row = {
        "snapshot_date": str(ctx.snapshot_date),
        "ingest_ts_utc": ctx.ingest_ts_utc.strftime("%Y-%m-%dT%H:%M:%S.%f"),
        "source_system": "youtube",
        "request_id": f"req-{ctx.run_id}",
        "schema_version": "v1",
        "run_id": ctx.run_id,
        "payload": json.dumps(payload),
    }
    path.write_text(json.dumps(row) + "\n")


@pytest.mark.filterwarnings("ignore")
def test_incremental_latest_wins_channels(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    ctxs = run_contexts(3)
    spark.sql("CREATE DATABASE IF NOT EXISTS silver")

    # backlog: generations 1 and 2
    _write_envelope_file(landing / "g1.json", ctxs[0], channel_payload(1))
    _write_envelope_file(landing / "g2.json", ctxs[1], channel_payload(2))
    q = incremental_silver_channels(spark, str(landing), str(ckpt))
    q.awaitTermination(120)
    rows = read_merged(spark, "silver.silver_channels_stream").collect()
    assert len(rows) == 1
    assert rows[0]["channel_title"] == "Test Channel v2"

    # late arrival: generation 3 lands, stream resumes from checkpoint and
    # only the new file is processed (incremental, not a full re-read)
    _write_envelope_file(landing / "g3.json", ctxs[2], channel_payload(3))
    q2 = incremental_silver_channels(spark, str(landing), str(ckpt))
    q2.awaitTermination(120)
    rows = read_merged(spark, "silver.silver_channels_stream").collect()
    assert len(rows) == 1
    assert rows[0]["channel_title"] == "Test Channel v3"
    assert rows[0]["channel_view_count"] == 103000


@pytest.mark.filterwarnings("ignore")
def test_incremental_video_daily_fact_matches_batch(spark, tmp_path):
    """The streaming twin of fact_video_daily_metrics converges to exactly
    the batch MV's latest-wins result over the same envelopes."""
    from youtube_analytics_lakehouse_databricks_spark.sources.fixtures import video_daily_payload
    from youtube_analytics_lakehouse_databricks_spark.streaming.incremental import incremental_fact_video_daily

    landing = tmp_path / "landing"
    landing.mkdir()
    ctxs = run_contexts(3)
    days = ["2025-08-01", "2025-08-02"]
    for i, ctx in enumerate(ctxs):
        _write_envelope_file(landing / f"g{i}.json", ctx, video_daily_payload(i + 1, days))
    q = incremental_fact_video_daily(spark, str(landing), str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    rows = read_merged(spark, "silver.fact_video_daily_stream").collect()
    # 3 videos x 2 days, latest generation (3) wins every key
    assert len(rows) == 6
    by_key = {(r["video_id"], str(r["date"])): r for r in rows}
    assert by_key[("vid_001", "2025-08-01")]["views"] == 43  # 40 + gen3 + idx0
    assert all(r["snapshot_date"].day == 3 for r in rows)
    assert all(r["average_view_duration_seconds"] == 98.5 for r in rows)


@pytest.mark.filterwarnings("ignore")
def test_windowed_event_counts_matches_batch(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.queries import read as read_table

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    batch_events = spark.createDataFrame(
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "ts", "event_type", "value")
        .limit(2000)
        .collect()
    )
    batch_events.write.mode("overwrite").parquet(str(events_dir))

    stream = spark.readStream.schema(batch_events.schema).parquet(str(events_dir))
    agg = windowed_event_counts(stream, watermark="10 minutes", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in spark.table("win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], round(r["total_value"], 6))
        for r in windowed_event_counts(batch_events).collect()
    }
    assert streamed == expected and len(streamed) > 0


@pytest.mark.filterwarnings("ignore")
def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """At-least-once redelivery: the same events written twice (plus an
    extra duplicate batch) collapse to one row per event_id, matching
    batch-exact dedup; state is watermark-bounded."""
    from youtube_analytics_lakehouse_databricks_spark.queries import read as read_table
    from youtube_analytics_lakehouse_databricks_spark.streaming.incremental import dedup_event_stream

    events_dir = tmp_path / "dedup_events"
    events_dir.mkdir()
    base = spark.createDataFrame(
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "ts", "event_type", "value")
        .limit(500)
        .collect()
    )
    # two deliveries of the same payload = duplicate event_ids on disk
    base.write.mode("overwrite").parquet(str(events_dir))
    base.write.mode("append").parquet(str(events_dir))

    stream = spark.readStream.schema(base.schema).parquet(str(events_dir))
    q = (
        dedup_event_stream(stream, keys=("event_id",), watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_stream").collect()
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids)), "stream emitted duplicate event_ids"
    assert set(ids) == {r["event_id"] for r in base.collect()}
