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


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table; transparently downcast nanosecond timestamps.

    Parquet TIMESTAMP(NANOS) columns are read as nano-epoch longs
    (spark.sql.legacy.parquet.nanosAsLong) and truncated to microsecond
    timestamps — the same truncation DuckDB applies, so oracle comparisons
    stay exact.
    """
    path = f"{sf_dir}/{name}.parquet"
    nanos = _nano_ts_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df.select(*[f.name for f in df.schema])


def read_fanned(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """read() + fan-out to >= defaultParallelism partitions, ONLY when the
    scan is narrower than the cluster. For pipelines whose per-row compute
    (crypto hashing, Arrow matmuls) dwarfs their input bytes: a small file
    scans as one partition and serializes on a single core, so the tiny
    shuffle buys full-width parallelism. At 100 TB the scan already has
    thousands of partitions and the condition is false — no reshuffle is
    ever paid at scale. (Partition count comes from the physical plan on
    the driver; no job runs.)"""
    base = read(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    return base
