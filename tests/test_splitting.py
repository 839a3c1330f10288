"""Leakage-safe splitting (operators/splitting.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.splitting import leakage_safe_split

@pytest.fixture(scope="module")
def audit(spark):
    import random

    rng = random.Random(17)
    words = [f"word{j}" for j in range(4000)]
    rows = []
    for i in range(120):
        body = " ".join(rng.choice(words) for _ in range(30))
        rows.append((3 * i, body))
        rows.append((3 * i + 1, body))  # exact dup
        toks = body.split(" ")
        toks[5] = "variant"
        rows.append((3 * i + 2, " ".join(toks)))  # near dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return curate(df, "doc_id", "text").cache()


def splits(audit, **kw):
    return {
        r["doc_id"]: (r["cluster_root"], r["split"])
        for r in leakage_safe_split(audit, "doc_id", **kw).collect()
    }


def test_clusters_never_straddle_the_split(spark, audit):
    got = splits(audit, val_frac=0.3, seed=1, include_dropped=True)
    by_root: dict[int, set[str]] = {}
    for root, side in got.values():
        by_root.setdefault(root, set()).add(side)
    assert all(len(sides) == 1 for sides in by_root.values())
    # the fixture really does produce multi-member clusters
    from collections import Counter

    sizes = Counter(root for root, _ in got.values())
    assert max(sizes.values()) >= 2


def test_chained_duplicates_share_a_root_and_a_side(spark):
    """The exact-dup -> near-folded-keeper chain (round-6 VERDICT #1):
    docs 5,6 byte-exact (keeper 5), doc 2 near-dups 5, so the component
    root is 2 — doc 6 must resolve THROUGH 5 to root 2, and every seed
    must land the whole cluster {2, 5, 6} on one side."""
    import random

    rng = random.Random(3)
    words = [f"w{j}" for j in range(2000)]
    rows = []
    for i in range(40):
        base = 10 * i
        body = " ".join(rng.choice(words) for _ in range(30))
        toks = body.split(" ")
        toks[4] = "variant"
        rows.append((base + 2, " ".join(toks)))  # near-dup, min id: the root
        rows.append((base + 5, body))            # exact keeper, near-folds
        rows.append((base + 6, body))            # exact dup of +5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 8 bands of 1 row: candidate recall ~1 for J>=0.5 (the default 4x2
    # banding misses ~2% of J~0.8 pairs — flaky at 40 clusters)
    audit = curate(df, "doc_id", "text", rows_per_band=1)

    for seed in (0, 1, 2, 3, 4):
        got = splits(audit, val_frac=0.4, seed=seed, include_dropped=True)
        for i in range(40):
            base = 10 * i
            cluster = [got[base + k] for k in (2, 5, 6)]
            roots = {root for root, _ in cluster}
            sides = {side for _, side in cluster}
            assert roots == {base + 2}, (i, cluster)
            assert len(sides) == 1, (i, cluster)


def test_kept_only_by_default_and_frac_tracks(spark, audit):
    got = splits(audit, val_frac=0.25, seed=2)
    kept_ids = {r["doc_id"] for r in audit.filter("keep").collect()}
    assert set(got) == kept_ids
    frac = sum(1 for _, s in got.values() if s == "validation") / len(got)
    assert abs(frac - 0.25) < 0.12


def test_deterministic_and_nested(spark, audit):
    a = splits(audit, val_frac=0.2, seed=7)
    assert a == splits(audit, val_frac=0.2, seed=7)
    b = splits(audit, val_frac=0.4, seed=7)
    lo = {d for d, (_, s) in a.items() if s == "validation"}
    hi = {d for d, (_, s) in b.items() if s == "validation"}
    assert lo < hi  # growing the validation set only adds clusters
    assert a != splits(audit, val_frac=0.2, seed=8)


def test_validates_frac(spark, audit):
    with pytest.raises(ValueError):
        leakage_safe_split(audit, "doc_id", val_frac=1.5)


def test_lehmer_split_matches_python_reference(spark, audit):
    """draw='lehmer' reproduces the Park-Miller threshold draw on the
    CLUSTER ROOT exactly (the shard_split_assignment oracle contract),
    and clusters still never straddle the split."""
    M31 = 2147483647
    seed, frac = 7, 0.3
    got = splits(audit, val_frac=frac, seed=seed, include_dropped=True, draw="lehmer")
    assert len(got) == 360
    sides_by_root: dict[int, set[str]] = {}
    for doc_id, (root, side) in got.items():
        expect = "validation" if ((root + seed + 1) * 48271) % M31 / M31 < frac else "train"
        assert side == expect, (doc_id, root)
        sides_by_root.setdefault(root, set()).add(side)
    assert all(len(s) == 1 for s in sides_by_root.values())


def test_lehmer_split_rejects_non_integral_ids(spark, audit):
    bad = audit.withColumn("duplicate_of", F.col("duplicate_of").cast("string"))
    with pytest.raises(ValueError, match="integral id"):
        leakage_safe_split(bad, "doc_id", val_frac=0.3, draw="lehmer")
