"""paragraph_dedup composed into curate() / curate_incremental().

The flag rewrites each document to its first-occurrence paragraphs
BEFORE the quality gate (the C4/RefinedWeb order), so boilerplate-only
docs drop as low_quality and doc-level dedup compares boilerplate-free
text. Incremental appends dedup against the persisted paragraph-hash
index and must match the full run over the union row for row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
    CurationState,
    curate_incremental,
)

BANNER_X = "Accept our cookies to continue browsing this site with all features enabled."
BANNER_Y = "Subscribe to the newsletter for weekly updates delivered straight to you."
BODY_A = (
    "The actual article body discusses distributed query engines at considerable "
    "length and with enough tokens to pass every quality gate in the chain easily "
    "because it keeps talking about partitions shuffles joins and aggregations."
)
BODY_B = (
    "A completely different essay about marine biology follows here with plenty "
    "of words on coral reefs tidal pools plankton migration and bioluminescence "
    "so that no shingle overlaps the other bodies in this fixture at all."
)
BODY_C = (
    "Recipes for sourdough bread require patience flour water salt and a lively "
    "starter culture refreshed on a schedule while the oven reaches temperature "
    "and the dough proofs slowly in a cool spot away from drafts entirely."
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def audit_map(df):
    return {
        r["doc_id"]: (r["keep"], r["drop_reason"], r["duplicate_of"])
        for r in df.collect()
    }


def test_boilerplate_only_doc_drops_low_quality(spark):
    docs = _df(
        spark,
        [
            (1, f"{BODY_A}\n\n{BANNER_X}"),
            (2, f"{BANNER_X}\n\n{BANNER_X}"),  # nothing but (dup) boilerplate
        ],
    )
    got = audit_map(curate(docs, "doc_id", "text", paragraph_dedup=True))
    assert got[1] == (True, None, None)
    assert got[2] == (False, "low_quality", None)
    # without the flag, doc 2 survives as a distinct doc
    got_off = audit_map(curate(docs, "doc_id", "text"))
    assert got_off[2][0] is True


def test_chrome_variants_drain_and_drop(spark):
    # docs 3 and 4 share the body but wear DIFFERENT banners. Paragraph
    # dedup claims every paragraph at its first occurrence, so doc 4
    # loses its banner (doc 2 owns it) AND its body (doc 3 owns it),
    # drains to '' and drops at the quality gate — paragraph dedup
    # SUBSUMES doc-level exact dedup for shared-paragraph docs (the C4
    # behavior: the later copy simply vanishes).
    docs = _df(
        spark,
        [
            (1, f"{BANNER_X}\n\n{BODY_B}"),
            (2, f"{BANNER_Y}\n\n{BODY_C}"),
            (3, f"{BANNER_X}\n\n{BODY_A}"),
            (4, f"{BANNER_Y}\n\n{BODY_A}"),
        ],
    )
    got = audit_map(curate(docs, "doc_id", "text", paragraph_dedup=True))
    assert got[3] == (True, None, None)
    assert got[4] == (False, "low_quality", None)
    # without the flag the pair is only caught LATER, by the (much more
    # expensive) near-dup chain — the banners dilute the shingle overlap
    # but the shared body dominates
    got_off = audit_map(curate(docs, "doc_id", "text"))
    assert got_off[4] == (False, "near_duplicate", 3)


def _batches():
    b1 = [
        (1, f"{BANNER_X}\n\n{BODY_A}"),
        (2, f"{BANNER_X}\n\n{BODY_B}"),
    ]
    b2 = [
        # banner seen in batch 1; body collides with doc 1 once stripped
        (10, f"{BANNER_X}\n\n{BODY_A}"),
        # fresh content + a fresh banner claimed at first occurrence
        (11, f"{BANNER_Y}\n\n{BODY_C}"),
        # boilerplate-only relative to history
        (12, f"{BANNER_X}\n\n{BANNER_Y}"),
    ]
    return b1, b2


def test_incremental_matches_full_run(spark, tmp_path):
    b1, b2 = _batches()
    _, st = curate_incremental(
        _df(spark, b1), "doc_id", "text", paragraph_dedup=True
    )
    st.save(str(tmp_path / "state"))
    st2 = CurationState.load(spark, str(tmp_path / "state"))
    assert st2.paras is not None
    inc_audit, st3 = curate_incremental(
        _df(spark, b2), "doc_id", "text", state=st2, paragraph_dedup=True
    )
    full_audit = curate(_df(spark, b1 + b2), "doc_id", "text", paragraph_dedup=True)
    assert audit_map(inc_audit) == audit_map(full_audit)
    # docs 10 and 12 lose every paragraph to history -> drain -> low_quality
    got = audit_map(inc_audit)
    assert got[10] == (False, "low_quality", None)
    assert got[11] == (True, None, None)
    assert got[12] == (False, "low_quality", None)
    # the updated index covers both batches' paragraphs (distinct)
    n_paras = st3.paras.count()
    assert n_paras == st3.paras.distinct().count()
    assert n_paras >= 5


def test_state_flag_mismatch_raises(spark, tmp_path):
    b1, b2 = _batches()
    _, st_with = curate_incremental(
        _df(spark, b1), "doc_id", "text", paragraph_dedup=True
    )
    _, st_without = curate_incremental(_df(spark, b1), "doc_id", "text")
    # the r9 parameter fingerprint catches the flag flip up front, naming
    # the differing parameter; pre-fingerprint states (params=None) still
    # trip the index-presence checks
    with pytest.raises(ValueError, match="paragraph_dedup"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=st_without, paragraph_dedup=True
        )
    with pytest.raises(ValueError, match="paragraph_dedup"):
        curate_incremental(_df(spark, b2), "doc_id", "text", state=st_with)
    st_without.params = None
    with pytest.raises(ValueError, match="no paragraph index"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=st_without, paragraph_dedup=True
        )
    st_with.params = None
    with pytest.raises(ValueError, match="must match"):
        curate_incremental(_df(spark, b2), "doc_id", "text", state=st_with)


def test_legacy_state_loads_without_paras(spark, tmp_path):
    b1, _ = _batches()
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text")
    st.save(str(tmp_path / "legacy"))
    loaded = CurationState.load(spark, str(tmp_path / "legacy"))
    assert loaded.paras is None
