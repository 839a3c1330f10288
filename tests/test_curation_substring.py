"""substring_dedup (ExactSubstr) composed into curate() /
curate_incremental() / prepare_training_data.

The flag rewrites each document — duplicated >= substring_min_tokens
token runs survive only at their first corpus occurrence — BETWEEN
paragraph dedup and the quality gate, and each doc's removed-token
count lands in the audit's ``substring_tokens_dropped`` column. Docs
drained to (near) nothing drop as low_quality at the next gate.
Incremental appends dedup against the persisted window-hash index and
must match the full run over the union row for row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
    CurationState,
    curate_incremental,
)

W = 6
SPAN = "alpha beta gamma delta epsilon zeta"  # exactly W tokens
BODY_A = (
    "distributed query engines shuffle partitions across executors while "
    "aggregations combine map side and joins broadcast their smaller inputs"
)
BODY_B = (
    "marine biology essays describe coral reefs tidal pools plankton "
    "migration and bioluminescence in waters no other fixture mentions"
)
BODY_C = (
    "sourdough recipes need patience flour water salt and a starter "
    "culture refreshed daily while the oven heats and the dough proofs"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def audit_map(df):
    return {
        r["doc_id"]: (
            r["keep"],
            r["drop_reason"],
            r["duplicate_of"],
            r["substring_tokens_dropped"],
        )
        for r in df.collect()
    }


def test_gate_rewrites_audits_and_drains(spark):
    docs = _df(
        spark,
        [
            (1, f"{BODY_A} {SPAN}"),  # first occurrence: keeps every token
            (2, f"{BODY_B} {SPAN}"),  # loses the span (W tokens) but keeps
            (3, SPAN),  # nothing but the span: drains -> low_quality
            (4, BODY_C),  # untouched: 0 tokens dropped
        ],
    )
    got = audit_map(
        curate(docs, "doc_id", "text", substring_dedup=True, substring_min_tokens=W)
    )
    assert got[1] == (True, None, None, 0)
    assert got[2] == (True, None, None, W)
    assert got[3] == (False, "low_quality", None, W)
    assert got[4] == (True, None, None, 0)


def test_column_is_null_when_gate_off(spark):
    docs = _df(spark, [(1, BODY_A), (2, BODY_B)])
    rows = curate(docs, "doc_id", "text").collect()
    assert all(r["substring_tokens_dropped"] is None for r in rows)


def test_incremental_matches_full_union_run(spark, tmp_path):
    params = dict(substring_dedup=True, substring_min_tokens=W)
    b1 = [(1, f"{BODY_A} {SPAN}"), (2, BODY_B), (3, SPAN)]
    b2 = [
        (10, f"{BODY_C} {SPAN}"),  # span claimed by stored doc 1
        (11, f"{BODY_B} extra trailing tokens beyond the stored copy"),
        (12, SPAN + " " + SPAN),  # periodic + stored: drains entirely
    ]
    full = audit_map(curate(_df(spark, b1 + b2), "doc_id", "text", **params))
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **params)
    # round-trip the state (covers the windows frame in save/load)
    st.save(str(tmp_path / "state"))
    st = CurationState.load(spark, str(tmp_path / "state"))
    assert st.windows is not None
    inc_audit, _ = curate_incremental(
        _df(spark, b2), "doc_id", "text", state=st, **params
    )
    assert audit_map(inc_audit) == full
    assert full[10][3] == W and full[12][3] == 2 * W


def test_state_parameter_mismatch_raises(spark):
    b1 = [(1, BODY_A)]
    b2 = [(10, BODY_B)]
    _, st_plain = curate_incremental(_df(spark, b1), "doc_id", "text")
    # the r9 parameter fingerprint catches the flag flip up front (the
    # index-presence checks remain as a second line for pre-fingerprint
    # states, which carry params=None)
    with pytest.raises(ValueError, match="substring_dedup"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=st_plain, substring_dedup=True
        )
    _, st_sub = curate_incremental(
        _df(spark, b1), "doc_id", "text", substring_dedup=True
    )
    with pytest.raises(ValueError, match="substring_dedup"):
        curate_incremental(_df(spark, b2), "doc_id", "text", state=st_sub)
    # a pre-fingerprint state still trips the index-presence check
    st_plain.params = None
    with pytest.raises(ValueError, match="no window index"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=st_plain, substring_dedup=True
        )


def test_export_gate_removes_span_from_shards(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.operators.training_export import prepare_training_data

    docs = _df(spark, [(1, f"{BODY_A} {SPAN}"), (2, f"{BODY_B} {SPAN}"), (3, BODY_C)])
    out = str(tmp_path / "shards")
    stats = prepare_training_data(
        docs,
        "doc_id",
        "text",
        out,
        n_shards=2,
        substring_dedup=True,
        substring_min_tokens=W,
        capacity=None,
    )
    assert stats["kept_docs"] == 3
    texts = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    assert SPAN in texts[1] and SPAN not in texts[2] and texts[3] == BODY_C


def test_incremental_matches_full_with_both_rewrite_gates(spark):
    """Stage-order pin across modes: paragraph dedup rewrites first, the
    substring pass sees post-paragraph text, and the incremental run
    (paragraph index + window index both persisted) must still match the
    full-union run row for row."""
    params = dict(
        paragraph_dedup=True,
        paragraph_min_chars=20,
        substring_dedup=True,
        substring_min_tokens=W,
    )
    banner = "shared cookie banner paragraph repeated on every page here"
    b1 = [
        (1, f"{banner}\n\n{BODY_A} {SPAN}"),
        (2, f"{banner}\n\n{BODY_B}"),
    ]
    b2 = [
        (10, f"{banner}\n\n{BODY_C} {SPAN}"),  # loses banner AND span to stored
        (11, f"{BODY_B} with a fresh unique tail beyond the stored copy"),
    ]
    full = audit_map(curate(_df(spark, b1 + b2), "doc_id", "text", **params))
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **params)
    assert st.paras is not None and st.windows is not None
    inc, _ = curate_incremental(_df(spark, b2), "doc_id", "text", state=st, **params)
    assert audit_map(inc) == full
    # doc 10 lost the span tokens (banner loss is the paragraph stage's,
    # which does not count toward substring_tokens_dropped)
    assert full[10][3] == W


def test_pre_r9_state_without_audit_column_upgrades(spark):
    """A CurationState persisted before the audit grew
    substring_tokens_dropped (7-column schema) must still serve appends:
    the splice upgrades the stored audit with a NULL-typed column instead
    of failing its select."""
    b1 = [(1, BODY_A), (2, BODY_B)]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text")
    st.audit = st.audit.drop("substring_tokens_dropped")  # simulate old state
    audit, _ = curate_incremental(
        _df(spark, [(10, BODY_C)]), "doc_id", "text", state=st
    )
    rows = {r["doc_id"]: r["substring_tokens_dropped"] for r in audit.collect()}
    assert set(rows) == {1, 2, 10} and all(v is None for v in rows.values())


def test_state_params_fingerprint_enforced(spark, tmp_path):
    """The persisted state records the scalar parameter fingerprint of
    the run that built it; an append with a DIFFERENT index-shaping
    parameter (here shingle_k) must fail loudly instead of silently
    corrupting equivalence — and the fingerprint survives save/load."""
    b1 = [(1, BODY_A), (2, BODY_B)]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", shingle_k=3)
    st.save(str(tmp_path / "st"))
    st = CurationState.load(spark, str(tmp_path / "st"))
    assert st.params is not None and st.params["shingle_k"] == 3
    with pytest.raises(ValueError, match="shingle_k"):
        curate_incremental(
            _df(spark, [(10, BODY_C)]), "doc_id", "text", state=st, shingle_k=4
        )
    # identical params append fine
    audit, _ = curate_incremental(
        _df(spark, [(10, BODY_C)]), "doc_id", "text", state=st, shingle_k=3
    )
    assert audit.count() == 3
