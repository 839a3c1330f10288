"""Exact substring dedup (operators/dedup.py::substring_dedup).

Correctness pinned against an independent pure-Python implementation of
the sliding-window ExactSubstr rule (a token is removed iff it lies in a
window of length W whose exact token sequence occurs at a smaller
(id, pos)), on handcrafted adversarial corpora and hypothesis-generated
ones; plus partitioning invariance and the no-UDF plan contract.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_analytics_lakehouse_databricks_spark.operators.dedup import substring_dedup


def reference_substring_dedup(docs, W):
    """id -> (text_deduped, n_tokens, n_kept); first-occurrence-wins."""
    first: dict[tuple, tuple] = {}
    toks_by_id = {}
    for doc_id, text in sorted(docs):
        toks = [t for t in text.split(" ") if t]
        toks_by_id[doc_id] = toks
        for i in range(len(toks) - W + 1):
            key = tuple(toks[i : i + W])
            if key not in first:
                first[key] = (doc_id, i)
    out = {}
    for doc_id, _ in sorted(docs):
        toks = toks_by_id[doc_id]
        removed = [False] * len(toks)
        for i in range(len(toks) - W + 1):
            key = tuple(toks[i : i + W])
            if first[key] != (doc_id, i):
                for j in range(i, i + W):
                    removed[j] = True
        kept = [t for t, r in zip(toks, removed) if not r]
        out[doc_id] = (" ".join(kept), len(toks), len(kept))
    return out


def run_spark(spark, docs, W, pre=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    if pre:
        df = pre(df)
    rows = substring_dedup(df, "doc_id", "text", min_tokens=W).collect()
    return {
        r["doc_id"]: (r["text_deduped"], r["n_tokens"], r["n_kept"], r["n_dropped"])
        for r in rows
    }


def check(spark, docs, W, pre=None):
    got = run_spark(spark, docs, W, pre=pre)
    want = reference_substring_dedup(docs, W)
    assert set(got) == {d for d, _ in docs}
    for doc_id, (text, n, k) in want.items():
        gt, gn, gk, gd = got[doc_id]
        assert gt == text, f"doc {doc_id}: {gt!r} != {text!r}"
        assert (gn, gk, gd) == (n, k, n - k), doc_id
    return got


def toks(*idx):
    return " ".join(f"w{i:03d}" for i in idx)


def test_embedded_span_removed_from_second_doc_only(spark):
    shared = toks(*range(100, 106))  # 6-token shared span
    docs = [
        (1, toks(0, 1, 2) + " " + shared + " " + toks(3, 4, 5)),
        (2, toks(10, 11) + " " + shared + " " + toks(12, 13)),
    ]
    got = check(spark, docs, W=6)
    assert "w100" in got[1][0] and "w100" not in got[2][0]
    # doc 2 keeps its unique flanks
    assert got[2][0] == toks(10, 11) + " " + toks(12, 13)


def test_span_shorter_than_window_survives(spark):
    shared = toks(*range(100, 105))  # 5 tokens < W=6: never removed
    docs = [
        (1, toks(0, 1) + " " + shared + " " + toks(2, 3)),
        (2, toks(10, 11) + " " + shared + " " + toks(12, 13)),
    ]
    got = check(spark, docs, W=6)
    assert "w100" in got[1][0] and "w100" in got[2][0]


def test_exact_duplicate_doc_drains(spark):
    body = toks(*range(20))
    docs = [(1, body), (2, body), (3, toks(*range(50, 60)))]
    got = check(spark, docs, W=8)
    assert got[1][0] == body and got[2][0] == "" and got[2][3] == 20


def test_within_doc_repeat_removed(spark):
    span = toks(*range(100, 108))
    docs = [(5, toks(0) + " " + span + " " + toks(1) + " " + span + " " + toks(2))]
    got = check(spark, docs, W=8)
    # second in-doc occurrence cut, first kept
    assert got[5][0] == toks(0) + " " + span + " " + toks(1) + " " + toks(2)


def test_short_docs_untouched(spark):
    docs = [(1, toks(1, 2, 3)), (2, toks(1, 2, 3)), (3, "")]
    got = check(spark, docs, W=6)
    assert got[1][0] == got[2][0] == toks(1, 2, 3) and got[3] == ("", 0, 0, 0)


def test_periodic_run_collapses(spark):
    docs = [(7, " ".join(["na"] * 30))]
    got = check(spark, docs, W=6)  # documented degenerate behavior
    assert got[7][0] == "na" and got[7][2] == 1


def test_multiple_disjoint_and_adjacent_spans_merge(spark):
    a, b = toks(*range(100, 106)), toks(*range(200, 206))
    docs = [
        (1, a + " " + b),
        (2, toks(10) + " " + a + " " + b + " " + toks(11)),  # adjacent spans
        (3, toks(20) + " " + a + " " + toks(21) + " " + b),  # disjoint spans
    ]
    got = check(spark, docs, W=6)
    assert got[2][0] == toks(10) + " " + toks(11)
    assert got[3][0] == toks(20) + " " + toks(21)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=5),
        min_size=1,
        max_size=6,
    )
)
def test_property_matches_reference(spark, doc_blocks):
    # docs assembled from a pool of 4-token blocks: W=8 spans appear
    # whenever two docs share two consecutive blocks
    pool = [toks(*range(10 * b, 10 * b + 4)) for b in range(6)]
    docs = [
        (doc_id, " ".join(pool[j] for j in blocks))
        for doc_id, blocks in enumerate(doc_blocks)
    ]
    check(spark, docs, W=8)


def test_partitioning_invariance_and_prepartitioned_input(spark):
    shared = toks(*range(100, 110))
    docs = [(i, toks(i) + " " + shared + " " + toks(1000 + i)) for i in range(40)]
    base = run_spark(spark, docs, 10)
    for pre in [
        lambda df: df.repartition(13),
        lambda df: df.repartition(16, "doc_id"),  # union-hazard shape guard
    ]:
        assert run_spark(spark, docs, 10, pre=pre) == base


def test_no_python_udfs_in_plan(spark):
    df = spark.createDataFrame([(1, toks(*range(12)))], "doc_id long, text string")
    plan = (
        substring_dedup(df, "doc_id", "text", min_tokens=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_min_tokens_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_dedup(df, "doc_id", "text", min_tokens=1)


def test_seen_index_reproduces_full_union_run(spark):
    """Incremental contract: batch2 deduped against substring_hash_keys
    (batch1) must emit EXACTLY the batch2 rows of the full run over
    batch1 ∪ batch2 (append-only ids make first-occurrence monotone, so
    stored docs are never rewritten retroactively)."""
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import substring_hash_keys

    W = 4
    span = "alpha beta gamma delta"  # a W-token span planted across batches
    b1 = [
        (0, f"{span} one two three four five"),
        (1, f"unique opening {span} closing words here"),  # loses to doc 0
        (2, "completely unrelated text with no duplicate span at all"),
    ]
    b2 = [
        (10, f"later batch embeds {span} mid document"),  # loses to stored
        (11, "repeat me now ok repeat me now ok tail"),  # batch-local dup?
        (12, f"fresh tokens only {span}"),  # loses to stored
        (13, "totally novel text of this second batch run"),
    ]
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    df2 = spark.createDataFrame(b2, "doc_id long, text string")
    full = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup(
            spark.createDataFrame(b1 + b2, "doc_id long, text string"),
            "doc_id",
            "text",
            min_tokens=W,
        ).collect()
        if r["doc_id"] >= 10
    }
    inc = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup(
            df2,
            "doc_id",
            "text",
            min_tokens=W,
            seen=substring_hash_keys(df1, "doc_id", "text", min_tokens=W),
        ).collect()
    }
    assert inc == full
    # the planted span really was removed from the later batch
    assert full[10][4] > 0 and full[12][4] > 0
