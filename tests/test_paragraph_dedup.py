"""Paragraph-level exact dedup (operators/dedup.py::paragraph_dedup).

Correctness is pinned against an independent pure-Python reference
implementation of the C4/RefinedWeb rule (first corpus occurrence by
(doc id, position) wins; shorter-than-min_chars paragraphs exempt),
on handcrafted adversarial corpora and on hypothesis-generated ones.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _norm(p: str) -> str:
    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", p.lower())).strip()


def reference_paragraph_dedup(
    docs: list[tuple[int, str]],
    *,
    split_pattern: str = r"\n{2,}",
    joiner: str = "\n\n",
    normalize: bool = True,
    min_chars: int = 30,
) -> dict[int, tuple[str, int, int]]:
    """id -> (text_deduped, n_paras, n_kept), first-occurrence-wins."""
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for doc_id, text in sorted(docs):
        paras = [p for p in re.split(split_pattern, text) if p.strip()]
        kept = []
        for p in paras:
            if len(p) < min_chars:
                kept.append(p)
                continue
            key = _norm(p) if normalize else p
            if key not in seen:
                seen.add(key)
                kept.append(p)
        out[doc_id] = (joiner.join(kept), len(paras), len(kept))
    return out


def run_spark(spark, docs, **kw):
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = paragraph_dedup(df, "doc_id", "text", **kw).collect()
    return {
        r["doc_id"]: (r["text_deduped"], r["n_paras"], r["n_kept"], r["n_dropped"])
        for r in rows
    }


def check(spark, docs, **kw):
    got = run_spark(spark, docs, **kw)
    want = reference_paragraph_dedup(docs, **kw)
    assert set(got) == {d for d, _ in docs}
    for doc_id, (text, n_paras, n_kept) in want.items():
        gt, gp, gk, gd = got[doc_id]
        assert gt == text, f"doc {doc_id}: {gt!r} != {text!r}"
        assert (gp, gk, gd) == (n_paras, n_kept, n_paras - n_kept), doc_id
    return got


BOILER = "This cookie banner paragraph is repeated on every single page of the site."
UNIQ = "Document {} has its own unique body paragraph with enough characters to count."


def test_first_occurrence_wins_across_docs(spark):
    docs = [
        (1, f"{BOILER}\n\n{UNIQ.format(1)}"),
        (2, f"{BOILER}\n\n{UNIQ.format(2)}"),
        (3, f"{UNIQ.format(3)}\n\n{BOILER}"),
    ]
    got = check(spark, docs)
    # doc 1 keeps the banner (first occurrence), docs 2-3 lose it
    assert BOILER in got[1][0] and BOILER not in got[2][0] and BOILER not in got[3][0]
    assert got[2][3] == 1 and got[3][3] == 1


def test_within_doc_duplicates_collapse(spark):
    body = "Repeated within one document body, long enough to be a candidate."
    docs = [(7, f"{body}\n\n{body}\n\n{body}")]
    got = check(spark, docs)
    assert got[7] == (body, 3, 1, 2)


def test_short_paragraphs_exempt(spark):
    docs = [
        (1, "Intro\n\nA long first unique paragraph body for document number one."),
        (2, "Intro\n\nA long second unique paragraph body for document number two."),
    ]
    got = check(spark, docs)
    # "Intro" < min_chars: kept in BOTH docs, never deduped
    assert got[1][0].startswith("Intro") and got[2][0].startswith("Intro")


def test_normalization_collides_cosmetic_variants(spark):
    a = "The Quick, Brown Fox Jumps Over The Lazy Dog In The Meadow!"
    b = "the quick brown fox jumps over the lazy dog in the meadow"
    docs = [(1, a), (2, b)]
    got = check(spark, docs)
    assert got[1][0] == a and got[2][0] == ""
    # and with normalize off they are distinct
    got_raw = check(spark, docs, normalize=False)
    assert got_raw[2][0] == b


def test_degenerate_single_paragraph_is_doc_dedup(spark):
    t = "A single-paragraph document repeated verbatim across several ids here."
    docs = [(5, t), (6, t), (9, t)]
    got = check(spark, docs)
    assert got[5][0] == t and got[6][0] == "" and got[9][0] == ""


def test_empty_and_delimiter_only_docs_survive(spark):
    docs = [
        (1, ""),
        (2, "\n\n\n\n"),
        (3, "A perfectly normal paragraph with more than thirty characters in it."),
    ]
    got = check(spark, docs)
    assert got[1] == ("", 0, 0, 0) and got[2] == ("", 0, 0, 0)


def test_document_order_preserved(spark):
    p = ["Paragraph body number {} long enough to be a dedup candidate.".format(i) for i in range(4)]
    docs = [(1, "\n\n".join(p)), (2, "\n\n".join([p[2], "Own paragraph of doc two, long enough to be a candidate.", p[0]]))]
    got = check(spark, docs)
    assert got[1][0] == "\n\n".join(p)
    assert got[2][0] == "Own paragraph of doc two, long enough to be a candidate."


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=1),
)
def test_property_matches_reference(spark, doc_paras, norm_flag):
    pool = [
        f"Shared paragraph template number {i} padded to exceed the length gate."
        for i in range(8)
    ]
    docs = [
        (doc_id, "\n\n".join(pool[j] for j in paras))
        for doc_id, paras in enumerate(doc_paras)
    ]
    check(spark, docs, normalize=bool(norm_flag))


def test_partitioning_invariance(spark):
    docs = [
        (i, f"{BOILER}\n\n" + UNIQ.format(i % 5))  # heavy cross-doc dup
        for i in range(40)
    ]
    a = run_spark(spark, docs)
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(13)
    rows = paragraph_dedup(df, "doc_id", "text").collect()
    b = {
        r["doc_id"]: (r["text_deduped"], r["n_paras"], r["n_kept"], r["n_dropped"])
        for r in rows
    }
    assert a == b


@pytest.mark.parametrize("guard_conf", ["false", "true"])
def test_prepartitioned_input_no_duplicate_keys(spark, guard_conf):
    """Wrong-results guard for Spark 4.1's partitioning-aware union:
    with input HASH-PARTITIONED ON THE ID, paragraph_dedup's former
    union(exempt-units, semi-joined-units) -> groupBy(id) plan let the
    planner elide the aggregation exchange (both children report the
    same reused-exchange partitioning) and the same doc aggregated
    separately per branch — 678 audit rows for 500 docs. The operator is
    now structurally single-branch (left-join keep marker, no union), so
    it must be correct on ANY session — including one WITHOUT the
    engine's spark.sql.unionOutputPartitioning=false pin. The ``true``
    parametrization simulates exactly that raw session (the conf is
    runtime-settable; restored after)."""
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import paragraph_dedup

    docs = [
        # ≥30-char body paragraphs so some units are dedup-eligible AND
        # short exempt fragments so the exempt keep path is non-empty
        (i, f"{BOILER}\n\nshort {i % 4}\n\n" + UNIQ.format(i % 5))
        for i in range(60)
    ]
    prev = spark.conf.get("spark.sql.unionOutputPartitioning", None)
    spark.conf.set("spark.sql.unionOutputPartitioning", guard_conf)
    try:
        df = (
            spark.createDataFrame(docs, "doc_id long, text string")
            .repartition(32, "doc_id")  # the triggering pre-partitioning
        )
        rows = paragraph_dedup(df, "doc_id", "text").collect()
        want = run_spark(spark, docs)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.unionOutputPartitioning", prev)
        else:
            # unset, don't skip: leaving the parametrized value (incl.
            # 'true', the hazard setting) would leak into the shared
            # session for every later test (r8 ADVICE)
            spark.conf.unset("spark.sql.unionOutputPartitioning")
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 60 and len(set(ids)) == 60, (
        f"{len(ids)} rows / {len(set(ids))} distinct — duplicate group keys"
    )
    # and the verdicts still match the unpartitioned run
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_paras"], r["n_kept"], r["n_dropped"])
        for r in rows
    }
    assert got == want


def test_no_python_udfs_in_plan(spark):
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame([(1, "x\n\ny")], "doc_id long, text string")
    plan = paragraph_dedup(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_stays_out_of_the_dedup_pipeline(spark):
    """r9 shape pin: paragraph text must never enter an aggregation or a
    join — the keys pipeline carries (id, pos, hash) only, losers
    collapse to a per-doc drop-position list, and the rebuild is a
    per-row indexed filter. The old shape's collect_list(struct(pos,
    para)) reassembly shuffled document text and measured 18x/decade at
    the 10x->100x scaling corpus."""
    from youtube_analytics_lakehouse_databricks_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(i, f"{'long enough paragraph body to be dedup eligible':>40}\n\nuniq {i}") for i in range(8)],
        "doc_id long, text string",
    )
    plan = (
        paragraph_dedup(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no text-carrying reassembly aggregate
    assert "collect_list(struct(para_pos" not in plan, plan
    # the only collect_list is the keys-only drop-position list
    assert plan.count("collect_list") == plan.count("collect_list(para_pos"), plan
    # every hash aggregation groups on the sha key or the id, never text
    import re

    for keys in re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        assert "para#" not in keys and "text#" not in keys, keys
