"""Systematic sweep of the Spark 4.1 partitioning-aware-union hazard.

The shape: a ``unionByName`` whose children descend from a COMMON
exchange hash-partitioned on key K, feeding an aggregation on K. The
planner lets the union report its children's partitioning and the
aggregation elides its Exchange — but the physical union concatenates
the branches into 2x partitions, so one group key can aggregate once
per branch (duplicate group keys, wrong verdicts). Reproduced on this
build by paragraph_dedup's former union(exempt, semi-join) plan
(678 audit rows for 500 docs); that operator is now structurally
single-branch and regression-pinned in test_paragraph_dedup.py.

This file sweeps the REMAINING union->aggregate shapes flagged in the
r7 audit — connected components (operators/graph.py:40), the grid and
bucket ANN searches (operators/similarity.py:122,190), incremental
curation (operators/curation_incremental.py:432,499) — by feeding each
operator an id-PREPARTITIONED input under BOTH settings of
``spark.sql.unionOutputPartitioning``:

  - ``false``: the engine session's wrong-results pin
               (youtube_analytics_lakehouse_databricks_spark/session.py:80)
  - ``true``:  Spark's default, i.e. a raw user / oracle-driver session
               that never saw the engine's conf

and asserting unique group keys plus verdicts identical to the
unpartitioned run. Operators must be correct on ANY session and ANY
input partitioning — the session pin is belt-and-suspenders, never the
correctness mechanism.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

GUARDS = ["false", "true"]


@contextmanager
def union_conf(spark, value):
    key = "spark.sql.unionOutputPartitioning"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            # unset, don't skip: leaving the parametrized value (incl.
            # 'true', the hazard setting) would leak into the shared
            # session for every later test (r8 ADVICE)
            spark.conf.unset(key)


# ---------------------------------------------------------------- graph


@pytest.mark.parametrize("guard", GUARDS)
@pytest.mark.parametrize("part_cols", [["src"], ["src", "dst"]])
def test_connected_components_prepartitioned(spark, guard, part_cols):
    from youtube_analytics_lakehouse_databricks_spark.operators.graph import connected_components

    # Three chains and an isolated pair; symmetric-union -> distinct ->
    # iterated groupBy("node") is the shape under test.
    edges = [(i, i + 1) for i in range(0, 28, 2)] + [(100, 101), (1, 3), (5, 9)]
    base_df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        (r["node"], r["component"])
        for r in connected_components(base_df, "src", "dst").collect()
    }
    with union_conf(spark, guard):
        pre = base_df.repartition(16, *part_cols)
        rows = connected_components(pre, "src", "dst").collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes)), "duplicate node labels"
    assert {(r["node"], r["component"]) for r in rows} == want


# ----------------------------------------------------------- similarity


def _vec_rows(n, dim=8):
    # Deterministic, no two identical vectors, non-trivial neighborhoods.
    return [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 + (0.5 if j == i % dim else 0.0) for j in range(dim)])
        for i in range(n)
    ]


@pytest.mark.parametrize("guard", GUARDS)
def test_cosine_topk_prepartitioned(spark, guard):
    from youtube_analytics_lakehouse_databricks_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(_vec_rows(40), "id long, vec array<float>")
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(df, "id", "vec", k=3).collect()
    }
    with union_conf(spark, guard):
        pre = df.repartition(16, "id")
        rows = cosine_topk(pre, "id", "vec", k=3).collect()
    keys = [(r["query_id"], r["rank"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (query, rank) keys"
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"]) for r in rows}
    assert got == want


@pytest.mark.parametrize("guard", GUARDS)
def test_bucket_topk_prepartitioned(spark, guard):
    from youtube_analytics_lakehouse_databricks_spark.operators.similarity import bucket_topk

    df = spark.createDataFrame(_vec_rows(40), "id long, vec array<float>")
    want = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in bucket_topk(df, "id", "vec").collect()
    }
    with union_conf(spark, guard):
        pre = df.repartition(16, "id")
        rows = bucket_topk(pre, "id", "vec").collect()
    qids = [r["query_id"] for r in rows]
    assert len(qids) == len(set(qids)), "duplicate query ids"
    assert {(r["query_id"], r["neighbor_id"], r["cosine"]) for r in rows} == want


# --------------------------------------------------------------- curation


@pytest.mark.parametrize("guard", GUARDS)
def test_curate_prepartitioned(spark, guard):
    """curate()'s audit assembly unions the per-stage dropped frames
    (curation.py:335-377) and left-joins them back onto the corpus on
    the id — the same hazard class through JOIN elision: a union
    wrongly claiming HashPartitioning(id) against an id-partitioned
    probe side would let dropped rows miss their match (docs silently
    reported kept)."""
    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
    from tests.test_curation_incremental import A_TXT, B_TXT, C_TXT, OTHER, PARAMS, _df

    rows = [
        (1, A_TXT),
        (2, B_TXT),
        (3, OTHER),
        (4, "tiny doc"),  # low_quality gate
        (5, A_TXT),  # exact duplicate
        (6, C_TXT),  # bridges 1 and 2 (near-dup fold)
    ]
    want = sorted(map(tuple, curate(_df(spark, rows), "doc_id", "text", **PARAMS).collect()))
    with union_conf(spark, guard):
        pre = _df(spark, rows).repartition(16, "doc_id")
        got = sorted(map(tuple, curate(pre, "doc_id", "text", **PARAMS).collect()))
    ids = [t[0] for t in got]
    assert len(ids) == len(set(ids)), "duplicate audit doc_ids"
    assert got == want


# ---------------------------------------------------- incremental curation


@pytest.mark.parametrize("guard", GUARDS)
def test_curate_incremental_prepartitioned(spark, guard):
    from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
        curate_incremental,
    )
    from tests.test_curation_incremental import A_TXT, B_TXT, C_TXT, OTHER, PARAMS, _df

    corpus = [(1, A_TXT), (2, B_TXT), (3, OTHER)]
    # C bridges 1 and 2 (retro merge), 6 is an exact dup of stored 3 —
    # exercises both the band-index union (:432) and edges union (:499).
    batch = [(5, C_TXT), (6, OTHER), (7, "paragraph dedup style fresh text")]
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **PARAMS)
    want = sorted(
        map(
            tuple,
            curate_incremental(_df(spark, batch), "doc_id", "text", state=st, **PARAMS)[
                0
            ].collect(),
        )
    )
    with union_conf(spark, guard):
        pre = _df(spark, batch).repartition(16, "doc_id")
        audit, _ = curate_incremental(pre, "doc_id", "text", state=st, **PARAMS)
        got = sorted(map(tuple, audit.collect()))
    ids = [t[0] for t in got]
    assert len(ids) == len(set(ids)), "duplicate audit doc_ids"
    assert got == want
