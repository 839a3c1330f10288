"""Query registry: named (Spark builder, DuckDB oracle SQL) pairs.

Each query re-expresses one operator family from the reference
(SURVEY.md §2, citations in each docstring) on the driver's synthetic
testdata tables, plus the beyond-reference training-data operators.
The oracle SQL is the ANSI equivalent the driver runs on DuckDB; column
names and value semantics are kept bit-identical (decimal-exact sums,
matching hash functions, explicit tie-breaks).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def registry() -> dict[str, Query]:
    # Import side-effect modules on first use.
    from youtube_analytics_lakehouse_databricks_spark.queries import (  # noqa: F401
        advanced,
        extended,
        relational,
        textops,
        tpch_like,
        vectorops,
    )

    # Oracle-checked queries first (registration order), rows-only checks
    # last: downstream gates iterate in dict order under a bounded budget,
    # so the strongest checks must never be starved by the weaker ones.
    oracled = {n: q for n, q in _REGISTRY.items() if q.oracle is not None}
    rows_only = {n: q for n, q in _REGISTRY.items() if q.oracle is None}
    return {**oracled, **rows_only}


_NANO_TS_CACHE: dict[str, list[str]] = {}


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects by default (PARQUET_TYPE_ILLEGAL)."""
    if path not in _NANO_TS_CACHE:
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            _NANO_TS_CACHE[path] = [
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            ]
        except Exception:
            _NANO_TS_CACHE[path] = []
    return _NANO_TS_CACHE[path]


_DF_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table; transparently downcast nanosecond timestamps.

    Parquet TIMESTAMP(NANOS) columns are read as nano-epoch longs
    (spark.sql.legacy.parquet.nanosAsLong) and truncated to microsecond
    timestamps — the same truncation DuckDB applies, so oracle comparisons
    stay exact.

    The analyzed DataFrame is memoized per (session, path): DataFrames
    are immutable and lazy, so reuse is safe, and it avoids re-paying the
    driver-side file listing + footer schema read (~50 ms) on every
    builder call — a query joining 7 tables would otherwise spend ~0.4 s
    of pure driver time per build before any job runs.
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    hit = _DF_CACHE.get(key)
    if hit is not None and hit[0] is spark:  # identity-checked: a gc'd
        return hit[1]  # session's id could be reused by a new one
    nanos = _nano_ts_columns(path)
    if not nanos:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nanos:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        df = df.select(*[f.name for f in df.schema])
    _DF_CACHE[key] = (spark, df)
    return df


_SIZE_CACHE: dict[str, int] = {}


def _table_bytes(path: str) -> int:
    """On-disk bytes of a parquet file or directory (driver-side stat,
    cached per path — no Spark planning, no jobs)."""
    import os

    if path not in _SIZE_CACHE:
        total = 0
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(path):
            total = os.path.getsize(path)
        _SIZE_CACHE[path] = total
    return _SIZE_CACHE[path]


def read_fanned(
    spark: SparkSession, sf_dir: str, name: str, by: str | None = None
) -> DataFrame:
    """read() + fan-out to >= defaultParallelism partitions, ONLY when the
    scan is narrower than the cluster. For pipelines whose per-row compute
    (crypto hashing, Arrow matmuls) dwarfs their input bytes: a small file
    scans as one partition and serializes on a single core, so the tiny
    shuffle buys full-width parallelism. At 100 TB the scan already has
    thousands of partitions and the condition is false — no reshuffle is
    ever paid at scale.

    The scan-width check is a driver-side file stat against
    spark.sql.files.maxPartitionBytes (cheap, cached) — asking the
    physical plan via .rdd.getNumPartitions() would pay full Catalyst
    planning (~0.1-0.2 s of driver time) on EVERY build of every fanned
    query.

    ``by``: hash-partition the fan-out on this column instead of round-
    robin. When the downstream pipeline aggregates on that column (e.g.
    the per-doc MinHash mins), the exchange satisfies the aggregation's
    required distribution, so Catalyst elides the second shuffle AND the
    partial/final aggregation split — one less stage wave at any scale.
    """
    if by is not None:
        # Belt-and-suspenders for the Spark 4.1 partitioning-aware-union
        # hazard: a union whose children BOTH descend from this ``by``
        # exchange can report the common partitioning and let a
        # downstream groupBy(by) elide its Exchange — while the physical
        # union concatenates branches into 2x partitions (duplicate
        # group keys; see youtube_analytics_lakehouse_databricks_spark/session.py:80 and
        # tests/test_union_partition_hazard.py). Engine operators are
        # structurally single-branch-safe; this pins the conf on
        # WHATEVER session the caller brought (driver harness, user
        # notebook) the way read() pins nanosAsLong, so even a future
        # regression can't produce wrong results on a raw session.
        spark.conf.set("spark.sql.unionOutputPartitioning", "false")
    base = read(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
    est_parts = max(1, -(-_table_bytes(f"{sf_dir}/{name}.parquet") // max_bytes))
    if est_parts < par:
        base = base.repartition(par, by) if by else base.repartition(par)
    return base
