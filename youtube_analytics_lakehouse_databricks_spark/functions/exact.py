"""Deterministic double aggregation.

Plain SUM(double) is summation-order-dependent — across partitionings,
engines, and reruns the last ulps wander. These helpers sum exact integer
units (floor(x*scale + 0.5), pure IEEE ops identical everywhere), so
aggregates are bit-stable at any parallelism. Used by every oracle-checked
money/quantity aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SCALE = 10_000.0  # 1e-4 units


def unit_round(col: Column, scale: float = DEFAULT_SCALE) -> Column:
    """Round a double to integer units using only mult/add/floor."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def exact_sum(col: Column, alias: str, scale: float = DEFAULT_SCALE) -> Column:
    """Order-independent exact sum of a double expression, as double."""
    return (F.sum(unit_round(col, scale)).cast("double") / F.lit(scale)).alias(alias)


def exact_avg(col: Column, alias: str, scale: float = DEFAULT_SCALE) -> Column:
    return (
        (F.sum(unit_round(col, scale)).cast("double") / F.lit(scale)) / F.count(F.lit(1))
    ).alias(alias)
