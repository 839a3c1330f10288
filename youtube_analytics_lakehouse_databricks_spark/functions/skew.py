"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime; these helpers cover the two cases AQE doesn't: skewed
aggregations (one reducer owns the hot key) and broadcast-ineligible
joins against a skewed build side.

Pattern: salt = hash(row) % n_salts appended to the key -> partial
aggregate on (key, salt) spreads the hot key over n_salts reducers ->
final aggregate on key merges the partials. Works for any algebraic
aggregate (sum/count/min/max); result is identical to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output column -> (input column,
    fn) with fn in {sum, count, min, max}. The hot key's rows spread over
    ``n_salts`` partial groups before the final merge."""
    salt = (F.abs(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id())) % n_salts)
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe left equi-join: left rows get a random salt, the right
    side is replicated n_salts times (explode), and the join key becomes
    (key, salt) — the hot key's probe rows spread across n_salts tasks.
    Use when the right side is too big to broadcast and AQE's skew split
    doesn't apply (e.g. the skew is in the build side)."""
    salted_left = left.withColumn(
        "__salt", (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts)
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, [key, "__salt"], "left")
    return out.drop("__salt")
