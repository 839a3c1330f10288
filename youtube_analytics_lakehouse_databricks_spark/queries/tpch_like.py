"""TPC-H-shaped multi-join analytics over the full star schema — breadth
coverage for every testdata table (part/supplier included) and the join
strategies that matter at 100 TB: dims broadcast, facts shuffle on keys,
aggregates push partial (map-side) before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.queries import read, register
from youtube_analytics_lakehouse_databricks_spark.queries.relational import _dsum, _dsum_sql


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment filter -> 3-way join -> revenue agg -> deterministic top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT fanned (r16, interleaved A/B: 0.687 vs 0.923 s — the fan-out
    # exchange of the fact costs more than the single-task probe it
    # parallelizes, and handing AQE a materialized fact size invites a
    # fact-broadcast build-side flip; see q5 below)
    customer, orders, lineitem = (
        read(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_supplier_volume",
    f"""
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_lineitems,
           {_dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           {_dsum_sql("CASE WHEN p.p_type = 'ECONOMY' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", "economy_revenue")}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5 + Q14 shapes in one star query: region-pruned 7-way join "
        "with the same-nation customer/supplier condition, plus the "
        "fact->part conditional revenue share (CASE-sum ratio numerator) "
        "per nation. Dims broadcast; the fact shuffles once per join key."
    ),
)
def q5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, supplier, lineitem, part, orders, customer = (
        read(spark, sf_dir, t)
        for t in ("region", "nation", "supplier", "lineitem", "part", "orders", "customer")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # FACT-CENTRIC join order (r16): lineitem is the streamed left side of
    # every join — the scale-correct posture (the fact must never be a
    # build side) and the measured local win (interleaved A/B min-of-5:
    # 0.95 s dim-first -> 0.60 s fact-centric). The old dim-first chain
    # left the planner free to pick the fact join's build side — probed
    # here: once the fact's size was materialized by a fan-out exchange,
    # AQE BROADCAST THE 600k-row FACT and collapsed the probe onto the
    # 202-row supplier chain's task. The supplier chain is one explicit
    # broadcast (region+nation+supplier is dim-sized at any sf);
    # orders/customer joins stay planner-chosen (broadcast at bench
    # scale, shuffle at 100 TB). Deliberately NOT fanned: the fan-out
    # exchange measured 0.5 s WORSE than letting the probes pipeline into
    # the map-side partial agg on the scan task (nothing shuffles after).
    sup_chain = F.broadcast(
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        lineitem.join(sup_chain, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            _dsum(rev, "revenue"),
            _dsum(
                F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0)),
                "economy_revenue",
            ),
        )
    )


@register(
    "purchase_signup_users_minus_errors",
    """
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'signup'
    )
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc=(
        "INTERSECT + EXCEPT set ops in one query (beyond the reference's "
        "UNION-only surface): users who both purchased and signed up, minus "
        "users who ever errored."
    ),
)
def purchase_signup_users_minus_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    signed_up = ev.filter(F.col("event_type") == "signup").select("user_id")
    errored = ev.filter(F.col("event_type") == "error").select("user_id")
    # intersect == INTERSECT DISTINCT; subtract == EXCEPT DISTINCT
    return purchased.intersect(signed_up).subtract(errored)


@register(
    "regex_token_counts",
    """
    SELECT token, COUNT(*) AS token_count
    FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS token
      FROM documents
    )
    GROUP BY token
    HAVING COUNT(*) >= 10
    """,
    doc="BPE-ish regex tokenizer: alpha/digit runs via regexp_extract_all, counted per token.",
)
def regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops

    return text_ops.token_counts(
        read(spark, sf_dir, "documents"), "text", pattern="[a-z]+|[0-9]+", min_count=10
    )
