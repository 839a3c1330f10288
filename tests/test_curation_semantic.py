"""Semantic dedup composed into the curation chain (r10):

- curate(semantic_vec_col=...) — SemDeDup over the near-dup survivors
  with min-id keepers, drop_reason 'semantic_duplicate', the exact->
  near->semantic pointer chain closed, and the over-cap audit flag;
- curate_incremental — append-mode equivalence with the full-union run
  under a shared FROZEN quantizer (explicit centroids both sides: the
  caller-owned-model contract), including a cross-batch fold, a bridge
  doc retroactively merging two stored semantic groups, an exact dup of
  a semantically-folded stored doc, and the monotone cap-crossing
  divergence;
- state persistence of the centroids/semvecs frames + parameter
  enforcement.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
    CurationState,
    curate_incremental,
)

DIM = 16
THRESHOLD = 0.97

_dirs = np.random.default_rng(7).standard_normal((4, DIM))
_dirs = _dirs / np.linalg.norm(_dirs, axis=1, keepdims=True)
CENTROIDS = _dirs  # the shared frozen quantizer: one cell per direction


def _emb(g: int, seed: int, noise: float = 0.15) -> list[float]:
    r = np.random.default_rng(seed)
    v = _dirs[g] + noise * r.standard_normal(DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def _dup_of(emb: list[float], seed: int) -> list[float]:
    r = np.random.default_rng(seed)
    v = np.asarray(emb) + 0.004 * r.standard_normal(DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


def _text(i: int) -> str:
    # per-doc word soup: ~zero shingle overlap, passes every text gate
    r = np.random.default_rng(10_000 + i)
    return " ".join(f"w{w}" for w in r.choice(2000, 15, replace=False))


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, emb array<float>"
    )


def _sorted(df):
    return sorted(map(tuple, df.collect()))


SEM = dict(
    semantic_vec_col="emb",
    semantic_threshold=THRESHOLD,
    semantic_centroids=CENTROIDS,
)


def test_semantic_gate_batch(spark):
    g0 = [_emb(0, 100 + i) for i in range(6)]
    g1 = [_emb(1, 200 + i) for i in range(6)]
    g2 = [_emb(2, 300 + i) for i in range(8)]
    rows = (
        [(i, _text(i), g0[i]) for i in range(6)]
        + [(6 + i, _text(6 + i), g1[i]) for i in range(6)]
        + [(12 + i, _text(12 + i), g2[i]) for i in range(8)]
    )
    # semantic dup sets (distinct TEXTS — only the semantic stage sees
    # them): 3 ~ 1; 9, 10 ~ 6; in the over-cap cluster, 13 ~ 12
    rows[3] = (3, _text(3), _dup_of(g0[1], 31))
    rows[9] = (9, _text(9), _dup_of(g1[0], 91))
    rows[10] = (10, _text(10), _dup_of(g1[0], 101))
    rows[13] = (13, _text(13), _dup_of(g2[0], 131))
    rows += [
        (20, _text(20), _dup_of(g0[1], 201)),  # sem dup of 1, and...
        (21, _text(20), _emb(3, 990)),  # ...exact dup of 20 (same text)
        (22, "tiny doc", _emb(3, 991)),  # quality drop
    ]
    audit = curate(_df(spark, rows), "doc_id", "text",
                   semantic_max_cluster_size=7, **SEM)
    got = {r["doc_id"]: r for r in audit.collect()}

    # min-id keepers, distinct texts: only the semantic stage folds these
    for d, k in ((3, 1), (9, 6), (10, 6), (20, 1)):
        assert got[d]["keep"] is False and got[d]["drop_reason"] == "semantic_duplicate"
        assert got[d]["duplicate_of"] == k
    # the exact dup of a semantically-folded doc chains one hop further
    assert got[21]["drop_reason"] == "exact_duplicate"
    assert got[21]["duplicate_of"] == 1
    # over-cap cluster (8 > 7): everyone kept + flagged, even the planted
    # near-identical pair (12, 13) — under-compared, never silently so
    for i in range(12, 20):
        assert got[i]["keep"] is True
        assert got[i]["semantic_audit_incomplete"] is True
    assert got[13]["drop_reason"] is None
    # no flags outside the over-cap cluster
    assert not any(
        got[i]["semantic_audit_incomplete"] for i in list(range(12)) + [20, 21, 22]
    )
    # centroid_sim recorded for every examined doc; NULL for docs that
    # never reached the stage (exact-dropped 21, quality-dropped 22)
    assert all(got[i]["semantic_centroid_sim"] is not None for i in range(20))
    assert got[21]["semantic_centroid_sim"] is None
    assert got[22]["semantic_centroid_sim"] is None
    assert got[22]["drop_reason"] == "low_quality"
    # keepers stay kept
    for i in (0, 1, 2, 4, 5, 6, 7, 8, 11):
        assert got[i]["keep"] is True

    # stage off: the two columns are typed NULLs (schema contract)
    off = curate(_df(spark, rows[:4]), "doc_id", "text")
    r0 = off.collect()[0]
    assert r0["semantic_centroid_sim"] is None
    assert r0["semantic_audit_incomplete"] is None


def test_semantic_gate_requires_integral_ids(spark):
    df = spark.createDataFrame(
        [("a", "some text here alpha beta", [1.0] * DIM)],
        "doc_id string, text string, emb array<float>",
    )
    with pytest.raises(ValueError, match="integral id"):
        curate(df, "doc_id", "text", **SEM)


def _run_both(spark, b1, b2, **params):
    full = curate(_df(spark, b1 + b2), "doc_id", "text", **params)
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **params)
    inc, st2 = curate_incremental(_df(spark, b2), "doc_id", "text", state=st, **params)
    return _sorted(full), _sorted(inc), st2


def test_semantic_incremental_equivalence(spark):
    e1 = _emb(0, 100)
    e11 = _emb(1, 300, noise=0.09)  # bridge pair: cos(11,12) ~ 0.916...
    e12 = _emb(1, 301, noise=0.09)  # ...no direct fold at 0.97
    mid = np.asarray(e11) + np.asarray(e12)
    mid = [float(x) for x in mid / np.linalg.norm(mid)]  # ~0.979 to both
    b1 = [
        (1, _text(1), e1),
        (2, _text(2), _emb(0, 101)),
        (3, _text(3), _dup_of(e1, 32)),  # sem-folds -> 1 at bootstrap
        (10, _text(10), _emb(1, 200)),
        (11, _text(11), e11),  # keeper at bootstrap...
        (12, _text(12), e12),  # keeper at bootstrap, RETRO-folds -> 11
        (13, _text(13), _emb(2, 400)),
    ]
    b2 = [
        (101, _text(101), mid),  # bridges 11 and 12 -> merge under 11
        (102, _text(102), _dup_of(e1, 52)),  # cross-batch fold -> 1
        (103, _text(3), _emb(3, 992)),  # exact dup of SEM-FOLDED stored 3
        (104, _text(104), _emb(2, 401)),  # fresh keeper
    ]
    full, inc, st2 = _run_both(spark, b1, b2, **SEM)
    assert inc == full
    got = {t[0]: t for t in inc}
    # (id, keep, reason, dup_of, near_flag, eval, frac, substr, sim, sem_flag)
    assert got[3][1:4] == (False, "semantic_duplicate", 1)
    assert got[102][1:4] == (False, "semantic_duplicate", 1)
    # the bridge merged two stored groups: 12 retro-folds under 11
    assert got[12][1:4] == (False, "semantic_duplicate", 11)
    assert got[101][1:4] == (False, "semantic_duplicate", 11)
    assert got[11][1] is True
    # exact dup of a semantically-folded stored doc: one hop to its root
    assert got[103][1:4] == (False, "exact_duplicate", 1)
    assert got[104][1] is True and got[13][1] is True
    # the semvecs index covers every examined doc (kept and folded)
    assert sorted(r["doc_id"] for r in st2.semvecs.collect()) == [
        1, 2, 3, 10, 11, 12, 13, 101, 102, 104,
    ]


def test_semantic_cap_crossing_is_monotone(spark):
    e30 = _emb(2, 500)
    b1 = [
        (30, _text(30), e30),
        (31, _text(31), _dup_of(e30, 61)),  # folds -> 30 under the cap
        (32, _text(32), _emb(2, 502)),
        (33, _text(33), _emb(2, 503)),
    ]
    b2 = [(110 + i, _text(110 + i), _emb(2, 600 + i)) for i in range(3)]
    params = dict(SEM, semantic_max_cluster_size=5)
    full, inc, _ = _run_both(spark, b1, b2, **params)
    fgot = {t[0]: t for t in full}
    igot = {t[0]: t for t in inc}
    # full run: 7 > 5 -> nobody compared, everyone kept + flagged
    # (column 9 = semantic_audit_incomplete; r11 appended the two
    # semantic-decontam audit columns after it)
    assert all(fgot[i][1] for i in fgot) and all(fgot[i][9] for i in fgot)
    # incremental: the bootstrap fold is never retracted (monotone) —
    # 31 stays folded; every member is flagged like the full run
    assert igot[31][1:4] == (False, "semantic_duplicate", 30)
    assert all(igot[i][9] for i in igot)
    assert all(igot[i][1] for i in igot if i != 31)
    # formally: incremental keeps are a subset of full-run keeps
    assert {i for i in igot if igot[i][1]} <= {i for i in fgot if fgot[i][1]}


def test_semantic_state_roundtrip_and_guards(spark, tmp_path):
    e1 = _emb(0, 100)
    b1 = [(1, _text(1), e1), (2, _text(2), _emb(1, 201)), (3, _text(3), _emb(2, 302))]
    b2 = [(11, _text(11), _dup_of(e1, 111)), (12, _text(12), _emb(3, 312))]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **SEM)
    st.save(str(tmp_path / "state"))
    loaded = CurationState.load(spark, str(tmp_path / "state"))
    assert loaded.centroids is not None and loaded.semvecs is not None
    assert loaded.nearmap is not None  # empty at this fixture, but present
    inc, _ = curate_incremental(
        _df(spark, b2), "doc_id", "text", state=loaded, **SEM
    )
    full = curate(_df(spark, b1 + b2), "doc_id", "text", **SEM)
    assert _sorted(inc) == _sorted(full)
    got = {r["doc_id"]: r for r in inc.collect()}
    assert got[11]["drop_reason"] == "semantic_duplicate"
    assert got[11]["duplicate_of"] == 1

    # parameter guards: the fingerprint catches a changed threshold or a
    # silently-disabled stage; a different quantizer fails its own check
    with pytest.raises(ValueError, match="parameters differ"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=loaded,
            **{**SEM, "semantic_threshold": 0.9},
        )
    with pytest.raises(ValueError, match="parameters differ"):
        curate_incremental(_df(spark, b2), "doc_id", "text", state=loaded)
    other = np.roll(CENTROIDS, 1, axis=0)
    with pytest.raises(ValueError, match="frozen at bootstrap"):
        curate_incremental(
            _df(spark, b2), "doc_id", "text", state=loaded,
            **{**SEM, "semantic_centroids": other},
        )


def test_near_anchor_uses_near_roots_not_hopped_pointers(spark):
    """r10 regression (found by the scaling measurement, fixed via the
    nearmap state frame): when a near-dup cluster's ROOT is semantically
    folded, the folded members' audit pointers hop to the semantic keeper
    — a later append anchoring near components from those pointers would
    drag the semantic keeper into the NEAR component and retro-near-fold
    the cluster's own root, overwriting its semantic verdict."""
    from tests.test_curation_incremental import A_TXT, PARAMS

    e0 = _emb(0, 100)
    b1 = [
        (0, _text(0), e0),  # semantic keeper
        (1, A_TXT, _dup_of(e0, 11)),  # near root; SEM-folds -> 0
        (2, A_TXT.replace("bravo", "brave1"), _emb(1, 22)),  # near-dup -> 1
    ]
    b2 = [(101, A_TXT.replace("kilo", "kite2"), _emb(1, 33))]  # near-dup of 1/2
    params = dict(SEM, **PARAMS)
    full, inc, st2 = _run_both(spark, b1, b2, **params)
    assert inc == full
    got = {t[0]: t for t in inc}
    # the semantic verdict on the near root survives the append
    assert got[1][1:4] == (False, "semantic_duplicate", 0)
    # near-folded members point at the FINAL root (through the hop)
    assert got[2][1:4] == (False, "near_duplicate", 0)
    assert got[101][1:4] == (False, "near_duplicate", 0)
    assert got[0][1] is True
    # the near-root index records the true near topology
    nm = {r["doc_id"]: r["near_root"] for r in st2.nearmap.collect()}
    assert nm[2] == 1 and nm[101] == 1


def test_semantic_durable_mode_identical(spark, tmp_path):
    """durable=True swaps every lineage cut in the semantic append path
    (assignment, member union, sem components, nearmap) for reliable
    checkpoint() — identical output."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    e1 = _emb(0, 100)
    b1 = [(1, _text(1), e1), (2, _text(2), _emb(1, 201))]
    b2 = [(11, _text(11), _dup_of(e1, 111)), (12, _text(12), _emb(2, 302))]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **SEM)
    base, _ = curate_incremental(_df(spark, b2), "doc_id", "text", state=st, **SEM)
    dur, _ = curate_incremental(
        _df(spark, b2), "doc_id", "text", state=st, durable=True, **SEM
    )
    assert _sorted(dur) == _sorted(base)
    got = {t[0]: t for t in _sorted(dur)}
    assert got[11][1:4] == (False, "semantic_duplicate", 1)


def test_semantic_three_appends_chain(spark):
    """Equivalence composes across THREE appends with semantic folds in
    every batch — including a third-batch doc folding into a group formed
    by the SECOND batch's merge."""
    e1 = _emb(0, 100)
    e11 = _emb(1, 300, noise=0.09)
    e12 = _emb(1, 301, noise=0.09)
    mid = np.asarray(e11) + np.asarray(e12)
    mid = [float(x) for x in mid / np.linalg.norm(mid)]
    b1 = [(1, _text(1), e1), (11, _text(11), e11), (12, _text(12), e12)]
    b2 = [(101, _text(101), mid), (102, _text(102), _emb(2, 500))]
    b3 = [
        (201, _text(201), _dup_of(e12, 9)),  # joins the merged group -> 11
        (202, _text(202), _dup_of(e1, 8)),  # folds to 1
    ]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **SEM)
    _, st = curate_incremental(_df(spark, b2), "doc_id", "text", state=st, **SEM)
    inc, _ = curate_incremental(_df(spark, b3), "doc_id", "text", state=st, **SEM)
    full = curate(_df(spark, b1 + b2 + b3), "doc_id", "text", **SEM)
    assert _sorted(inc) == _sorted(full)
    got = {t[0]: t for t in _sorted(inc)}
    assert got[12][1:4] == (False, "semantic_duplicate", 11)
    assert got[201][1:4] == (False, "semantic_duplicate", 11)
    assert got[202][1:4] == (False, "semantic_duplicate", 1)


def test_orphaned_semantic_group_divergence_is_pinned(spark):
    """The doubly-adversarial corner, pinned as DOCUMENTED behavior: a
    stored semantic keeper (1) near-retro-folds in the same append that
    semantically touches its orphaned member (2). The full run reforms
    the group without the keeper (keeps 2, folds the new doc 102 into
    it); the incremental run never resurrects — 2 stays folded with its
    pointer following the keeper's relabel to a KEPT doc, 102 (compared
    only against alive members) stays kept. Deliberate monotone
    divergence, in BOTH directions here: 2 is an inc-only drop, 102 an
    inc-only keep; every pointer still ends at a kept doc on both sides.
    """
    from tests.test_curation_incremental import A_TXT, B_TXT, C_TXT, PARAMS

    e1 = _emb(0, 100)
    b1 = [
        (0, B_TXT, _emb(1, 10)),
        (1, A_TXT, e1),
        (2, _text(2), _dup_of(e1, 21)),
    ]
    b2 = [
        (101, C_TXT, _emb(2, 30)),  # bridges 0 and 1 -> near merge, root 0
        (102, _text(102), _dup_of(e1, 22)),
    ]
    params = dict(SEM, **PARAMS)
    full, inc, _ = _run_both(spark, b1, b2, **params)
    fgot = {t[0]: t for t in full}
    igot = {t[0]: t for t in inc}
    # verdict agreement everywhere except the orphaned group (doc 1's
    # semantic_centroid_sim stays recorded from its bootstrap-time
    # examination — the full run never examines it — so provenance
    # columns differ, verdicts don't)
    for i in (0, 1, 101):
        assert igot[i][:4] == fgot[i][:4]
    assert igot[0] == fgot[0] and igot[101] == fgot[101]
    assert igot[1][1:4] == (False, "near_duplicate", 0)
    # full run: group reformed without the keeper
    assert fgot[2][1] is True
    assert fgot[102][1:4] == (False, "semantic_duplicate", 2)
    # incremental: monotone — no resurrection; orphan pointer follows the
    # keeper's relabel to a KEPT doc; the new doc keeps
    assert igot[2][1:4] == (False, "semantic_duplicate", 0)
    assert igot[102][1] is True
    for got in (igot, fgot):  # pointer closure on both sides
        for t in got.values():
            if t[3] is not None:
                assert got[t[3]][1] is True


def test_semantic_decontam_gate_batch(spark):
    """r11: the embedding-space decontamination tier inside curate() —
    drop_reason 'semantic_contaminated', audit columns for every examined
    doc (the review tier), and decontam-ONLY composition via
    semantic_decontam_vec_col (SemDeDup stays off)."""
    ev_vec = [float(x) for x in _dirs[3]]  # direction 3: nobody else near
    rows = [
        (1, _text(1), _emb(0, 101)),
        (2, _text(2), _emb(1, 102)),
        (3, _text(3), _dup_of(ev_vec, 5)),  # planted paraphrase of the eval doc
        (4, "x", _emb(2, 104)),  # gate drop BEFORE decontam -> NULL audit cols
    ]
    ev = spark.createDataFrame([(900, ev_vec)], "doc_id long, emb array<float>")
    out = {
        r["doc_id"]: r
        for r in curate(
            _df(spark, rows),
            "doc_id",
            "text",
            semantic_eval_df=ev,
            semantic_decontam_vec_col="emb",
        ).collect()
    }
    assert out[3]["keep"] is False
    assert out[3]["drop_reason"] == "semantic_contaminated"
    assert out[3]["max_eval_cosine"] >= 0.9
    assert out[3]["semantic_matched_eval_id"] == 900
    # SemDeDup did NOT run: its audit columns stay typed NULLs
    assert out[1]["semantic_centroid_sim"] is None
    # review tier: survivors carry their best-match cosine + pointer
    assert out[1]["keep"] is True and out[1]["max_eval_cosine"] is not None
    assert out[1]["semantic_matched_eval_id"] == 900
    # docs dropped before the gate were never scored
    assert out[4]["drop_reason"] == "low_quality"
    assert out[4]["max_eval_cosine"] is None
    assert out[4]["semantic_matched_eval_id"] is None


def test_semantic_decontam_requires_vec_col(spark):
    ev = spark.createDataFrame(
        [(900, [float(x) for x in _dirs[3]])], "doc_id long, emb array<float>"
    )
    with pytest.raises(ValueError, match="vector column"):
        curate(
            _df(spark, [(1, _text(1), _emb(0, 1))]),
            "doc_id",
            "text",
            semantic_eval_df=ev,
        )


def test_semantic_decontam_incremental_equivalence(spark):
    """Both embedding gates on (SemDeDup + semantic decontam):
    bootstrap+append == full-union, and the state fingerprint rejects a
    changed decontam threshold."""
    ev_vec = [float(x) for x in _dirs[3]]
    ev = spark.createDataFrame([(900, ev_vec)], "doc_id long, emb array<float>")
    e1 = _emb(0, 401)
    corpus = [(i, _text(i), _emb(i % 3, 400 + i)) for i in range(1, 6)]
    corpus[0] = (1, _text(1), e1)
    batch = [
        (11, _text(11), _emb(1, 411)),
        (12, _text(12), _dup_of(ev_vec, 6)),  # contaminated in the append
        (13, _text(13), _dup_of(e1, 7)),  # semantic dup of stored doc 1
    ]
    params = dict(SEM, semantic_eval_df=ev)
    full = _sorted(curate(_df(spark, corpus + batch), "doc_id", "text", **params))
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **params)
    inc, st2 = curate_incremental(
        _df(spark, batch), "doc_id", "text", state=st, **params
    )
    assert _sorted(inc) == full
    got = {t[0]: t for t in _sorted(inc)}
    assert got[12][1:3] == (False, "semantic_contaminated")
    assert got[13][1:4] == (False, "semantic_duplicate", 1)
    # fingerprint: changing the decontam threshold on append fails loudly
    with pytest.raises(ValueError, match="parameters differ"):
        curate_incremental(
            _df(spark, [(21, _text(21), _emb(0, 421))]),
            "doc_id",
            "text",
            state=st2,
            **dict(params, semantic_decontam_threshold=0.8),
        )


def test_semantic_refine_scale_in_curate(spark):
    """r11: a planted over-cap cluster is kept-but-flagged with the
    refine knob OFF and fully deduped (flags cleared) with it ON."""
    # Geometry matters in this toy regime: 120 docs at cap 30 give the
    # refine quantizer (auto_n_cells(120, 30) = 16 cells) ~7.5 docs per
    # second-pass cell — comfortably under the cap even with Lloyd
    # concentration (measured max 19), so the flags actually clear. The
    # planted pair ids sit >= 16 so neither anchors its own init
    # centroid (which would split the pair across cells).
    cap = 30
    rows = [(i, _text(i), _emb(0, 1000 + i)) for i in range(120)]
    rows[17] = (17, _text(17), _dup_of(rows[16][2], 70))
    rows[45] = (45, _text(45), _dup_of(rows[40][2], 71))
    rows += [(200, _text(200), _emb(1, 500)), (201, _text(201), _emb(2, 510))]
    base = dict(
        semantic_vec_col="emb",
        semantic_threshold=THRESHOLD,
        semantic_centroids=CENTROIDS,
        semantic_max_cluster_size=cap,
    )
    off = {
        r["doc_id"]: r
        for r in curate(_df(spark, rows), "doc_id", "text", **base).collect()
    }
    assert off[17]["keep"] is True and off[17]["semantic_audit_incomplete"] is True
    assert off[45]["keep"] is True and off[45]["semantic_audit_incomplete"] is True
    on = {
        r["doc_id"]: r
        for r in curate(
            _df(spark, rows), "doc_id", "text", semantic_refine_scale=1, **base
        ).collect()
    }
    assert on[17]["keep"] is False and on[17]["drop_reason"] == "semantic_duplicate"
    assert on[17]["duplicate_of"] == 16
    assert on[45]["keep"] is False and on[45]["duplicate_of"] == 40
    # the refined population is no longer under-compared
    assert not any(r["semantic_audit_incomplete"] for r in on.values())
    assert on[16]["keep"] is True and on[40]["keep"] is True
    assert on[200]["keep"] is True and on[201]["keep"] is True


def test_refine_parameter_mismatch_raises(spark):
    """r10 verdict #3: the first pass stamps its parameters as column
    metadata; a mismatched refine fails loudly."""
    from youtube_analytics_lakehouse_databricks_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_refine,
    )

    df = spark.createDataFrame(
        [(i, _emb(0, 600 + i)) for i in range(10)], "vid long, emb array<float>"
    )
    res = semantic_dedup(df, "vid", "emb", threshold=0.9, n_cells=2, max_cluster_size=4)
    with pytest.raises(ValueError, match="refine parameters differ"):
        semantic_dedup_refine(
            df, res, "vid", "emb", threshold=0.8, max_cluster_size=4
        )
    with pytest.raises(ValueError, match="refine parameters differ"):
        semantic_dedup_refine(
            df, res, "vid", "emb", threshold=0.9, max_cluster_size=4, keeper="min_id"
        )


def test_decontam_only_curate_never_shuffles_vectors(spark):
    """r11 shuffle shape: the semantic decontam gate scores EVERY input
    row through the broadcast-eval Arrow pass (zero exchange) and selects
    the gate population by semi-joining the (id, score) VERDICTS — the
    vector column itself must appear in NO Exchange of the composed
    decontam-only curate plan (at 100 TB a vector shuffle is dim*4
    bytes/row; the verdict semi-join is tens of bytes/row)."""
    import contextlib
    import re
    from io import StringIO

    rows = [(i, _text(i), _emb(i % 4, 600 + i)) for i in range(1, 40)]
    ev = spark.createDataFrame(
        [(900, [float(x) for x in _dirs[3]])], "doc_id long, emb array<float>"
    )
    out = curate(
        _df(spark, rows),
        "doc_id",
        "text",
        semantic_eval_df=ev,
        semantic_decontam_vec_col="emb",
    )
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    blocks = re.split(r"\n(?=\(\d+\) )", buf.getvalue())
    exchanges = [
        b for b in blocks
        if b.startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert exchanges  # the chain itself does shuffle (dedup stages)
    leaking = [b.splitlines()[0] for b in exchanges if re.search(r"\bemb#", b)]
    assert not leaking, leaking


def test_decontam_gate_survives_null_vector_on_dropped_doc(spark):
    """The r11 verdict-semi-join shape scores EVERY input row — including
    gate-dropped docs — so a doc with a NULL embedding must score as a
    NULL/False audit row instead of killing the Arrow shard."""
    rows = [
        (1, _text(1), _emb(0, 101)),
        (2, "x", None),  # quality-gate drop AND no embedding
        (3, _text(3), None),  # survivor with no embedding: audit NULLs
    ]
    ev = spark.createDataFrame(
        [(900, [float(x) for x in _dirs[3]])], "doc_id long, emb array<float>"
    )
    out = {
        r["doc_id"]: r
        for r in curate(
            _df(spark, rows),
            "doc_id",
            "text",
            semantic_eval_df=ev,
            semantic_decontam_vec_col="emb",
        ).collect()
    }
    assert out[2]["drop_reason"] == "low_quality"
    assert out[3]["keep"] is True
    assert out[3]["max_eval_cosine"] is None
    assert out[3]["semantic_matched_eval_id"] is None
    assert out[1]["keep"] is True and out[1]["max_eval_cosine"] is not None


def test_semantic_stage_skips_null_vector_docs(spark):
    """A doc WITHOUT an embedding cannot be semantically compared: it
    skips stage 4 and stays kept with NULL semantic audit columns (it
    must not kill the Arrow shard). Batch and incremental agree."""
    rows = [
        (1, _text(1), _emb(0, 201)),
        (2, _text(2), _dup_of(_emb(0, 201), 7)),  # semantic dup of 1
        (3, _text(3), None),  # no embedding: skips the stage, kept
    ]
    out = {
        r["doc_id"]: r
        for r in curate(_df(spark, rows), "doc_id", "text", **SEM).collect()
    }
    assert out[3]["keep"] is True
    assert out[3]["semantic_centroid_sim"] is None
    assert out[3]["drop_reason"] is None
    # the embedded pair still folds
    folded = [i for i in (1, 2) if not out[i]["keep"]]
    assert len(folded) == 1
    inc_audit, _ = curate_incremental(
        _df(spark, rows), "doc_id", "text",
        semantic_centroids=CENTROIDS,
        semantic_vec_col="emb", semantic_threshold=THRESHOLD,
    )
    inc = {r["doc_id"]: r for r in inc_audit.collect()}
    for i in (1, 2, 3):
        assert inc[i]["keep"] == out[i]["keep"], i
