"""Deterministic shuffle-shard export (operators/sharding.py).

The contract under test: shard assignment and within-shard order are a
pure function of (row ids, seed, n_shards) — independent of input
partitioning, row order, and file layout — and every input row lands in
exactly one shard. Written shard files are byte-order-deterministic
(verified by reading them back with pyarrow, which preserves file row
order, across two writes from differently-arranged inputs).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.sharding import (
    assign_shards,
    shuffle_shards,
    write_shards,
)

N = 5000
N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).selectExpr(
        "id AS doc_id", "concat('document body ', id) AS text"
    )


def read_shard_ordered(path: str, shard: int) -> list[int]:
    files = sorted(glob.glob(os.path.join(path, f"shard={shard}", "*.parquet")))
    ids: list[int] = []
    for f in files:
        ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    return ids


def test_assignment_deterministic_and_total(spark, docs):
    a = assign_shards(docs, "doc_id", n_shards=N_SHARDS, seed=3)
    rows = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in a.collect()}
    assert len(rows) == N
    assert all(0 <= s < N_SHARDS for s, _ in rows.values())
    # identical under a different physical arrangement of the input
    b = assign_shards(
        docs.repartition(17).sortWithinPartitions("text"),
        "doc_id",
        n_shards=N_SHARDS,
        seed=3,
    )
    assert {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in b.collect()} == rows


def test_shards_balanced(spark, docs):
    sizes = [
        r["n"]
        for r in assign_shards(docs, "doc_id", n_shards=N_SHARDS, seed=0)
        .groupBy("shard")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    ]
    assert len(sizes) == N_SHARDS
    mean = N / N_SHARDS
    assert all(0.8 * mean < s < 1.2 * mean for s in sizes), sizes


def test_seed_is_the_epoch_knob(spark, docs):
    a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, "doc_id", n_shards=N_SHARDS, seed=0).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(docs, "doc_id", n_shards=N_SHARDS, seed=1).collect()}
    moved = sum(1 for d in a if a[d] != b[d])
    # a new seed re-permutes: ~(1 - 1/N_SHARDS) of rows change shard
    assert moved > 0.7 * N


def test_written_shards_deterministic_and_shuffled(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    write_shards(docs, p1, "doc_id", n_shards=N_SHARDS, seed=42)
    # second run from a deliberately different input arrangement
    write_shards(
        docs.repartition(23).sortWithinPartitions("text"),
        p2,
        "doc_id",
        n_shards=N_SHARDS,
        seed=42,
    )
    all_ids: list[int] = []
    for s in range(N_SHARDS):
        ids1 = read_shard_ordered(p1, s)
        assert ids1 == read_shard_ordered(p2, s), f"shard {s} not deterministic"
        assert ids1 != sorted(ids1), f"shard {s} not shuffled"
        all_ids.extend(ids1)
    assert sorted(all_ids) == list(range(N))  # total coverage, no dup/loss


def test_plan_is_one_exchange_no_udfs(spark, docs):
    plan = (
        shuffle_shards(docs, "doc_id", n_shards=N_SHARDS, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rejects_bad_shard_count(spark, docs):
    with pytest.raises(ValueError):
        assign_shards(docs, "doc_id", n_shards=0)


M31 = 2147483647


def test_lehmer_draw_matches_python_reference(spark, docs):
    """draw='lehmer' (the ANSI-replayable verification mode) must
    reproduce the Park-Miller recurrence exactly — the property the
    shard_split_assignment oracle's DuckDB replay rests on."""
    seed = 3
    got = {
        r["doc_id"]: (r["shuffle_key"], r["shard"])
        for r in assign_shards(
            docs, "doc_id", n_shards=N_SHARDS, seed=seed, draw="lehmer"
        ).collect()
    }
    assert len(got) == N
    for i in range(N):
        key = ((i + seed + 1) * 48271) % M31
        assert got[i] == (key, key % N_SHARDS)


def test_lehmer_rejects_non_integral_id(spark, docs):
    strdocs = docs.selectExpr("CAST(doc_id AS STRING) AS doc_id", "text")
    with pytest.raises(ValueError, match="integral id"):
        assign_shards(strdocs, "doc_id", n_shards=N_SHARDS, draw="lehmer")


def test_lehmer_shard_order_is_key_then_id(spark, docs):
    """shuffle_shards under lehmer keeps the (key, id) within-shard
    order contract — the rank the registered oracle row hash-matches."""
    shuffled = shuffle_shards(docs, "doc_id", n_shards=N_SHARDS, seed=3, draw="lehmer")

    def per_partition(it):
        rows = list(it)
        for shard in {r["shard"] for r in rows}:
            keys = [(r["shuffle_key"], r["doc_id"]) for r in rows if r["shard"] == shard]
            yield (shard, keys == sorted(keys), len(keys))

    checks = shuffled.rdd.mapPartitions(per_partition).collect()
    assert all(ok for _, ok, _ in checks)
    assert sum(n for _, _, n in checks) == N
