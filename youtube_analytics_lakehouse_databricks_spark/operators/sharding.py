"""Deterministic global shuffle + shard export for training data.

A training run wants the curated/packed corpus in (a) a pseudo-random
global order that is (b) reproducible run-to-run, (c) split into N
shards a data loader can stream independently, with (d) a different
permutation per epoch. At 100 TB none of that can involve a driver-side
permutation or a global sort by random(): the engine expresses it as

    shuffle key  = xxhash64(id, seed)      -- deterministic per (id, seed)
    shard        = pmod(key, n_shards)     -- balanced in expectation
    shard order  = (key, id)               -- total, tie-broken, stable

which is ONE hash-partition exchange (`repartition(n_shards, shard)`) +
a per-partition sort — the theoretical minimum for a global random
order, and completely independent of the input's partitioning, file
layout, or row order. Changing ``seed`` re-permutes everything (the
epoch knob); keeping it fixes every byte.

No sampled range boundaries (`repartitionByRange` samples → output
depends on input partitioning), no ``rand()`` (non-deterministic under
task retry — a retried task would re-draw and corrupt the epoch), no
driver collection.

``draw='lehmer'`` swaps the key for one Park-Miller step
(((id + seed + 1) * 48271) mod (2^31 - 1)) — the same ANSI-SQL-
replayable verification mode as operators.mixing: an external engine
(DuckDB) recomputes the key, the shard assignment, and the within-shard
order bit-for-bit, putting the epoch permutation under the cross-engine
hash-match regime (the registered `shard_split_assignment` row).
Statistically weaker (2^31 period, multiplicative-congruential); keep
the xxhash64 default for production epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.mixing import (
    lehmer_key,
    require_integral_id,
)

SHARD_COL = "shard"
KEY_COL = "shuffle_key"


def _shuffle_key(df: DataFrame, id_col: str, seed: int, draw: str):
    if draw == "xxhash64":
        return F.xxhash64(F.col(id_col), F.lit(int(seed)))
    if draw == "lehmer":
        require_integral_id(df, id_col, "assign_shards")
        return lehmer_key(F.col(id_col), seed)
    raise ValueError(f"unknown draw {draw!r} (xxhash64 | lehmer)")


def assign_shards(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 0,
    draw: str = "xxhash64",
) -> DataFrame:
    """Input columns + (shuffle_key, shard). Narrow — no shuffle; the
    assignment is a pure function of (id, seed), so it survives retries,
    repartitioning, and re-reads bit-for-bit. ``draw='lehmer'`` is the
    ANSI-replayable verification mode (module docstring)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _shuffle_key(df, id_col, seed, draw)
    return df.withColumn(KEY_COL, key).withColumn(
        SHARD_COL, F.pmod(key, F.lit(int(n_shards))).cast("int")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 0,
    draw: str = "xxhash64",
) -> DataFrame:
    """The shuffled corpus, physically arranged for export: partitioned
    by shard (one exchange), each partition sorted by (shuffle_key, id).
    Iterating partition by partition yields the epoch's global order
    interleaved across shards — exactly what a sharded data loader
    consumes."""
    assigned = assign_shards(df, id_col, n_shards=n_shards, seed=seed, draw=draw)
    # repartition hash-partitions the shard VALUE, so two shards can
    # share a task (and some tasks are empty) — all rows of one shard
    # still land together, which is what partitionBy-write needs. Sort
    # shard-first so a shared task emits each shard contiguously, in
    # its own (key, id) order.
    return assigned.repartition(n_shards, SHARD_COL).sortWithinPartitions(
        SHARD_COL, KEY_COL, id_col
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 0,
    draw: str = "xxhash64",
    format: str = "parquet",
) -> None:
    """Materialize <path>/shard=K/... with rows in shuffled order.

    Parquet preserves task row order, and every task holds exactly the
    rows of the shards it was hash-assigned, already sorted — so each
    shard directory's content AND order are a pure function of
    (input rows, seed, n_shards)."""
    shuffled = shuffle_shards(df, id_col, n_shards=n_shards, seed=seed, draw=draw)
    shuffled.write.mode("overwrite").format(format).partitionBy(SHARD_COL).save(path)
