"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no randomized testing).

For arbitrary generated observation histories, the engine's core
operators must uphold their contracts:
- latest-wins dedup: exactly one survivor per key, and it is the max by
  the recency ordering;
- SCD2: per key, validity windows tile the timeline without overlap,
  exactly one open (is_current) row, closed rows end 1µs before the next
  version starts, and consecutive versions differ in hash.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.models.silver import _latest_wins, scd2_from_typed

_SPARK = None


def _get_spark():
    global _SPARK
    if _SPARK is None:
        from youtube_analytics_lakehouse_databricks_spark.session import get_spark

        _SPARK = get_spark(
            app_name="property-tests", master="local[2]", shuffle_partitions=2
        )
    return _SPARK


observations = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=20),  # day offset
        st.integers(min_value=0, max_value=5),  # hour (ingest ts)
        st.text(alphabet="ab", min_size=0, max_size=2),  # request id suffix
        st.sampled_from(["x", "y", None]),  # payload value (hash input)
    ),
    min_size=1,
    max_size=25,
)


@given(observations)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_latest_wins_is_max_by_recency(rows):
    spark = _get_spark()
    base = dt.date(2025, 1, 1)
    data = [
        (
            k,
            base + dt.timedelta(days=d),
            dt.datetime(2025, 1, 1 + d, h),
            f"req-{r}",
            v,
        )
        for k, d, h, r, v in rows
    ]
    df = spark.createDataFrame(
        data, "key int, snapshot_date date, ingest_ts_utc timestamp, request_id string, v string"
    )
    out = _latest_wins(df, ["key"]).collect()
    # exactly one row per key
    assert len(out) == len({r["key"] for r in out}) == df.select("key").distinct().count()
    # and it is the lexicographic max by (snapshot, ingest, request)
    expected = {}
    for k, sd, ts, req, v in data:
        cur = expected.get(k)
        cand = (sd, ts, req, v)
        if cur is None or cand[:3] > cur[:3]:
            expected[k] = cand
    for r in out:
        e = expected[r["key"]]
        assert (r["snapshot_date"], r["ingest_ts_utc"], r["request_id"]) == e[:3]


@given(observations)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_scd2_windows_tile_without_overlap(rows):
    spark = _get_spark()
    data, seen = [], set()
    for k, d, h, r, v in rows:
        ts = dt.datetime(2025, 1, 1 + d, h)
        # Two observations of one key at the same microsecond are
        # pathological input: the reference closes a version at
        # next_valid_from - 1µs (P:286), so a same-instant successor yields
        # a negative window there exactly as here. The real ingest can't
        # produce them (observed_at is per-run ingest time), so the
        # generator excludes them rather than asserting on undefined input.
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        data.append((f"vid{k}", v, ts, dt.date(2025, 1, 1 + d), ts, f"req-{r}", "run", "v1"))
    df = spark.createDataFrame(
        data,
        "video_id string, metadata_hash string, observed_at_utc timestamp, "
        "snapshot_date date, ingest_ts_utc timestamp, request_id string, "
        "run_id string, schema_version string",
    )
    df = df.withColumn("metadata_hash", F.coalesce("metadata_hash", F.lit("")))
    # the window stage projects the full flat schema; supply the unused
    # descriptive fields as nulls
    from youtube_analytics_lakehouse_databricks_spark.models.silver import _SCD2_HASH_FIELDS

    for c in _SCD2_HASH_FIELDS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    scd2 = scd2_from_typed(df).collect()
    by_key: dict = {}
    for r in scd2:
        by_key.setdefault(r["video_id"], []).append(r)
    sentinel = dt.datetime(9999, 12, 31, 23, 59, 59, 999999)
    for vid, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from_utc"])
        opens = [r for r in versions if r["is_current"]]
        assert len(opens) == 1 and opens[0] is versions[-1]
        assert versions[-1]["valid_to_utc"] == sentinel
        for a, b in zip(versions, versions[1:]):
            # closed exactly 1µs before the next version starts: no overlap, no gap
            assert a["valid_to_utc"] == b["valid_from_utc"] - dt.timedelta(microseconds=1)
            # a new version only starts when the hash changed
            assert a["metadata_hash"] != b["metadata_hash"]
        for r in versions:
            assert r["valid_from_utc"] <= r["valid_to_utc"]
