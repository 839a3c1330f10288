"""Hot-bucket guard: an over-common LSH band key must never expand to
O(|bucket|^2) pairs in one task. 10^4 docs sharing one band key would be
5*10^7 candidate pairs unguarded — the guard drops the bucket (it carries
no discriminating information) and the audit query surfaces it."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.operators import dedup

N_HOT = 10_000


def _banded(spark):
    # band0: one adversarial key shared by all N_HOT docs (plus two
    # singleton keys); band1: unique per hot doc, one genuine shared pair.
    rows = [(i, "HOT", f"u{i}") for i in range(N_HOT)]
    rows += [(100_000, "X", "pair"), (100_001, "Y", "pair")]
    return spark.createDataFrame(rows, "id long, band0 string, band1 string")


def test_hot_bucket_dropped_output_bounded(spark):
    cand = dedup.band_join_candidates(
        _banded(spark), "id", ["band0", "band1"], max_bucket_size=100
    ).collect()
    # Only the genuine 2-doc bucket survives: the hot bucket contributes
    # zero pairs instead of ~5*10^7.
    assert [(r["doc_a"], r["doc_b"]) for r in cand] == [(100_000, 100_001)]


def test_oversized_audit_reports_dropped_bucket(spark):
    dropped = dedup.oversized_band_buckets(
        _banded(spark), "id", ["band0", "band1"], max_bucket_size=100
    ).collect()
    assert len(dropped) == 1
    assert dropped[0]["band_key"] == "HOT"
    assert dropped[0]["bucket_size"] == N_HOT


def test_default_cap_keeps_normal_buckets(spark):
    # Buckets at or below the cap are untouched: 3 docs on one key yield
    # all 3 ordered pairs under the default cap.
    banded = spark.createDataFrame(
        [(1, "k"), (2, "k"), (3, "k")], "id long, band0 string"
    )
    cand = dedup.band_join_candidates(banded, "id", ["band0"])
    got = sorted((r["doc_a"], r["doc_b"]) for r in cand.collect())
    assert got == [(1, 2), (1, 3), (2, 3)]
