"""SCD2 incremental-vs-rebuild scaling: 1x vs 10x with late backfills.

Backs the incremental-refresh scale claim (VERDICT r4 #6) with a
measurement instead of an argument. A deterministic generator emits
``bronze.videos_raw``-shaped envelope tables (JSON payloads matching
contract.VIDEO_METADATA_SCHEMA, pages of 50 items) at two scales:

- 1x : 2,000 videos x 5 daily snapshots  (10k item observations)
- 10x: 20,000 videos x 5 daily snapshots (100k item observations)

~20% of videos mutate their metadata between snapshots (title bump), so
the SCD2 history carries real version chains. The LAST refresh batch is
adversarial: snapshot day 5 PLUS a late out-of-order backfill — envelopes
re-delivering day-2 observations with a NEW ingest_ts and an OLD
snapshot_date (the reference's rolling-lookback pattern). Both paths must
agree exactly in that case too.

Per scale it measures:

- ``full_rebuild``: wall + shuffle bytes for the from-scratch build
  (JSON parse of every envelope + global SCD2 windows) — what a naive
  pipeline pays on EVERY refresh;
- ``incremental``: wall + shuffle bytes for scd2_incremental_refresh of
  just the last batch (delta parse + affected-key rebuild + splice);
- ``tables_equal``: sorted-row equality of the incrementally maintained
  table vs the full rebuild over the same bronze — the correctness gate.

At 100 TB the full rebuild scales with HISTORY while the incremental
refresh scales with the DELTA (batch parse) plus the affected keys'
history; the 1x -> 10x ratios here demonstrate exactly that separation.

Usage: python tools/scaling_scd2.py [--markdown]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_curve import StageMeter  # noqa: E402

BASE_VIDEOS = 2_000
SNAPSHOTS = 5
PAGE = 50  # items per envelope payload, like an API page
CHANGE_FRACTION = 0.2
WAREHOUSE = "/tmp/sparkgraft_scd2_wh"


def _payload(video_ids: list[int], titles: dict[int, int]) -> str:
    items = [
        {
            "id": f"vid{v:06d}",
            "snippet": {
                "channelId": f"ch{v % 97}",
                "title": f"Video {v} rev {titles[v]}",
                "description": f"description of video {v}",
                "publishedAt": "2025-01-01T00:00:00Z",
                "defaultLanguage": "en",
                "defaultAudioLanguage": "en",
            },
            "contentDetails": {
                "duration": "PT10M",
                "dimension": "2d",
                "definition": "hd",
                "caption": "false",
                "licensedContent": False,
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
            "topicDetails": {"topicCategories": ["cat/a", "cat/b"]},
        }
        for v in video_ids
    ]
    return json.dumps({"items": items})


def _snapshot_rows(
    rng,
    n_videos: int,
    day: int,
    titles: dict[int, int],
    ingest_day: int | None = None,
    subset: list[int] | None = None,
):
    """Envelope rows for an observation of the corpus on ``day`` —
    the full corpus, or just ``subset`` (a partial crawl/backfill).
    ``ingest_day`` defaults to day (in-order); a later value models a
    late re-delivery/backfill of an old snapshot."""
    import datetime as dt

    universe = subset if subset is not None else list(range(n_videos))
    if day > 1:  # mutate ~20% of the observed videos before observing them
        mutated = rng.choice(universe, size=max(1, int(len(universe) * CHANGE_FRACTION)), replace=False)
        for v in mutated:
            titles[int(v)] += 1
    ingest_day = ingest_day or day
    snap = dt.date(2025, 8, day)
    rows = []
    for page_start in range(0, len(universe), PAGE):
        vids = universe[page_start : page_start + PAGE]
        rows.append(
            (
                snap,
                # hour = snapshot day, seconds = page index: a late
                # re-delivery (ingest_day > day) lands with an ingest_ts
                # EARLIER in its arrival day than the in-order batch —
                # genuinely out-of-order arrival. Pages stay < 3600 so
                # the second offset never crosses into the next hour.
                dt.datetime(2025, 8, ingest_day, day, 0, 0)
                + dt.timedelta(seconds=page_start // PAGE),
                "youtube",
                f"req-{day}-{ingest_day}-{page_start // PAGE:04d}",
                "v1",
                f"run-{day}-{ingest_day}",
                _payload(vids, titles),
            )
        )
    return rows


def run_scale(spark, mult: int) -> dict:
    import numpy as np

    from youtube_analytics_lakehouse_databricks_spark import storage
    from youtube_analytics_lakehouse_databricks_spark.contract import BRONZE_SCHEMA
    from youtube_analytics_lakehouse_databricks_spark.models.silver import (
        scd2_from_typed,
        scd2_incremental_refresh,
        video_metadata_typed,
    )
    from youtube_analytics_lakehouse_databricks_spark.plans.registry import ensure_schemas

    n_videos = BASE_VIDEOS * mult
    rng = np.random.default_rng(7)
    titles = {v: 0 for v in range(n_videos)}

    ensure_schemas(spark)
    for t in (
        "bronze.videos_raw",
        "silver.video_metadata_typed",
        "silver.silver_video_metadata_scd2",
        "silver.silver_video_metadata_scd2_full",
        "ops.refresh_watermarks",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    # days 1..5 (full daily crawls) land first; the incremental path
    # bootstraps on them — this is the accumulated HISTORY
    backlog = []
    for day in range(1, SNAPSHOTS + 1):
        backlog += _snapshot_rows(rng, n_videos, day, titles)
    storage.write_table(
        spark.createDataFrame(backlog, BRONZE_SCHEMA), "bronze.videos_raw"
    )
    scd2_incremental_refresh(spark, "auto")  # bootstrap (not timed)

    # the timed DELTA batch is partial — the realistic refresh shape: a
    # day-6 re-crawl of 5% of videos PLUS a late out-of-order re-delivery
    # of day-2 observations for a different 5% (old snapshot_date, new
    # ingest_ts). Incremental work should scale with THIS batch and the
    # affected keys' history, not with the full corpus.
    frac = max(1, n_videos // 20)
    recrawl = sorted(int(v) for v in rng.choice(n_videos, size=frac, replace=False))
    backfill = sorted(int(v) for v in rng.choice(n_videos, size=frac, replace=False))
    late = _snapshot_rows(rng, n_videos, SNAPSHOTS + 1, titles, subset=recrawl)
    late += _snapshot_rows(
        rng, n_videos, 2, titles, ingest_day=SNAPSHOTS + 1, subset=backfill
    )
    spark.createDataFrame(late, BRONZE_SCHEMA).write.mode("append").format(
        storage.TABLE_FORMAT
    ).saveAsTable("bronze.videos_raw")

    meter = StageMeter(spark)
    out: dict = {"n_videos": n_videos}

    meter.delta()
    t0 = time.time()
    mode = scd2_incremental_refresh(spark, "auto")
    out["incremental_sec"] = round(time.time() - t0, 2)
    out["incremental_shuffle_mb"] = round(meter.delta()[0] / 1e6, 2)
    assert mode == "merged", mode

    meter.delta()
    t0 = time.time()
    storage.write_table(
        scd2_from_typed(video_metadata_typed(spark)),
        "silver.silver_video_metadata_scd2_full",
    )
    out["full_rebuild_sec"] = round(time.time() - t0, 2)
    out["full_rebuild_shuffle_mb"] = round(meter.delta()[0] / 1e6, 2)

    incr = spark.table("silver.silver_video_metadata_scd2")
    full = spark.table("silver.silver_video_metadata_scd2_full")
    cols = sorted(incr.columns)
    from pyspark.sql import functions as F

    def table_hash(df):
        h = df.select(
            F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]), 256).alias("h")
        )
        return h.agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
                     F.count(F.lit(1)).alias("n")).collect()[0]

    hi, hf = table_hash(incr), table_hash(full)
    out["rows"] = hi["n"]
    out["tables_equal"] = (hi["s"] == hf["s"]) and (hi["n"] == hf["n"])
    return out


def main() -> None:
    from youtube_analytics_lakehouse_databricks_spark.session import get_spark

    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    spark = get_spark(
        app_name="scaling_scd2",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "1000000",
            "spark.sql.warehouse.dir": WAREHOUSE,
        },
    )
    run_scale(spark, 1)  # warmup: JIT/codegen, not recorded
    results = {m: run_scale(spark, m) for m in (1, 10)}
    print(json.dumps(results, indent=2))
    if "--markdown" in sys.argv:
        a, b = results[1], results[10]
        print()
        print(
            "| path | 1x wall s | 10x wall s | wall ratio | 1x shuffle MB | "
            "10x shuffle MB | tables equal |"
        )
        print("|---|---|---|---|---|---|---|")
        for key, label in (("incremental", "SCD2 incremental (last batch + day-2 backfill)"),
                           ("full_rebuild", "SCD2 full rebuild (all envelopes)")):
            r = round(b[f"{key}_sec"] / a[f"{key}_sec"], 1) if a[f"{key}_sec"] else float("inf")
            print(
                f"| {label} | {a[f'{key}_sec']} | {b[f'{key}_sec']} | {r}x | "
                f"{a[f'{key}_shuffle_mb']} | {b[f'{key}_shuffle_mb']} | "
                f"{a['tables_equal'] and b['tables_equal']} |"
            )


if __name__ == "__main__":
    main()
