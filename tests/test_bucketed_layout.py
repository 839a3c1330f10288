"""Bucketed tables: co-located joins plan without a shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.functions.layout import is_shuffle_free_join, save_bucketed
from youtube_analytics_lakehouse_databricks_spark.queries import read

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS layout")
    orders = read(spark, SF_DIR, "orders")
    lineitem = read(spark, SF_DIR, "lineitem")
    save_bucketed(orders, "layout.orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    save_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "layout.lineitem_b",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    # co-bucketed join: no exchange in the plan
    assert is_shuffle_free_join(spark, "layout.orders_b", "layout.lineitem_b", "o_orderkey")
    # sanity: the same join on plain tables needs a shuffle (or broadcast);
    # results are identical either way
    bucketed_cnt = (
        spark.table("layout.orders_b").join(spark.table("layout.lineitem_b"), "o_orderkey").count()
    )
    plain_cnt = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert bucketed_cnt == plain_cnt > 0


def test_bucketed_aggregation_avoids_exchange(spark):
    import io
    import re
    from contextlib import redirect_stdout

    df = spark.table("layout.lineitem_b").groupBy("o_orderkey").agg(F.sum("l_quantity"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # grouping on the bucket key reuses the bucket distribution
    assert not re.search(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE), plan
