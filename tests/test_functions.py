"""functions/: exact sums, skew-salted aggregate/join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.functions import exact_sum, salted_aggregate, salted_left_join


def test_exact_sum_is_partitioning_independent(spark):
    rows = [(i % 3, 0.1 + i * 0.01) for i in range(1000)]
    df = spark.createDataFrame(rows, "k int, v double")
    a = {r["k"]: r["s"] for r in df.repartition(1).groupBy("k").agg(exact_sum(F.col("v"), "s")).collect()}
    b = {r["k"]: r["s"] for r in df.repartition(32).groupBy("k").agg(exact_sum(F.col("v"), "s")).collect()}
    assert a == b  # bit-identical across parallelism


def test_salted_aggregate_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    salted = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in salted_aggregate(
            df, ["k"], {"cnt": ("v", "count"), "total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")}
        ).collect()
    }
    plain = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 1e-6
        assert salted[k][2:] == plain[k][2:]


def test_salted_left_join_matches_plain(spark):
    left = spark.createDataFrame(
        [("hot",) for _ in range(500)] + [("cold1",), ("cold2",), ("orphan",)], "k string"
    )
    right = spark.createDataFrame(
        [("hot", 1), ("cold1", 2), ("cold2", 3), ("unused", 9)], "k string, payload int"
    )
    salted = salted_left_join(left, right, "k").groupBy("k", "payload").count().collect()
    plain = left.join(right, "k", "left").groupBy("k", "payload").count().collect()
    as_set = lambda rows: {(r["k"], r["payload"], r["count"]) for r in rows}
    assert as_set(salted) == as_set(plain)
    # orphan keeps left-join NULL semantics
    assert ("orphan", None, 1) in as_set(salted)
