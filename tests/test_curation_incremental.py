"""Incremental curation: append-mode equivalence with the batch operator.

The contract under test: for append-only ids,

    curate_incremental(b2, state=curate_incremental(b1)[1])
        == curate(b1 ∪ b2)

row for row — including the adversarial cases (exact dup of a stored
doc, near-dup of a stored keeper, a bridge doc retroactively merging two
stored clusters and repointing the losing cluster's members, exact dup
of a near-DROPPED stored doc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
    CurationState,
    curate_incremental,
)

W = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]
BASE = " ".join(W)  # 20 distinct tokens, 18 3-shingles

OTHER = (
    "completely different subject matter entirely about spacecraft "
    "propulsion systems and orbital mechanics calculations for deep "
    "space missions beyond the outer planets of this solar system"
)

# A and B: one word changed in DIFFERENT spots -> J(A,B) ~ 12/24 = 0.5;
# C changes nothing -> J(A,C) = J(B,C) ~ 15/21 = 0.714. With threshold
# 0.6, A and B both keep on their own, and C (arriving later) bridges
# them into one cluster — the retroactive-merge case.
A_TXT = BASE.replace("charlie", "changed1")
B_TXT = BASE.replace("romeo", "changed2")
C_TXT = BASE

PARAMS = dict(
    jaccard_threshold=0.6,
    rows_per_band=1,  # 8 bands of 1 row: candidate recall ~1 for J>=0.5
    n_hashes=8,
)


def _df(spark, rows):
    schema = "doc_id long, text string"
    if len(rows[0]) == 3:  # the maximal test carries embeddings
        schema += ", emb array<float>"
    return spark.createDataFrame(rows, schema)


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def _run_both(spark, corpus_rows, batch_rows, **params):
    """(full, incremental) audit tuples for corpus -> +batch."""
    full = curate(
        _df(spark, corpus_rows + batch_rows), "doc_id", "text", **params
    )
    _, st = curate_incremental(_df(spark, corpus_rows), "doc_id", "text", **params)
    inc, _ = curate_incremental(
        _df(spark, batch_rows), "doc_id", "text", state=st, **params
    )
    return _sorted(full), _sorted(inc)


def test_bootstrap_equals_batch_curate(spark):
    rows = [(1, A_TXT), (2, B_TXT), (3, OTHER), (4, "tiny doc"), (5, A_TXT)]
    full = _sorted(curate(_df(spark, rows), "doc_id", "text", **PARAMS))
    inc, state = curate_incremental(_df(spark, rows), "doc_id", "text", **PARAMS)
    assert _sorted(inc) == full
    # the rep index covers exact representatives (1, 2, 3 — not the gate
    # drop 4 or the exact dup 5)
    assert sorted(r["doc_id"] for r in state.hashes.collect()) == [1, 2, 3]


def test_incremental_append_adversarial_cases(spark):
    corpus = [
        (1, A_TXT),        # keeper, later merged under itself
        (2, OTHER),        # keeper, untouched
        (3, B_TXT),        # keeper, RETROACTIVELY folds when C bridges
        (4, B_TXT.replace("alpha", "alpine")),  # near-dup of 3 -> repointed to 1
        (5, OTHER),        # exact dup of 2
    ]
    batch = [
        (11, C_TXT),       # bridge: verifies vs 1 AND 3 -> merge under 1
        (12, OTHER),       # exact dup of stored keeper 2
        (13, B_TXT.replace("alpha", "alpine")),  # exact dup of near-DROPPED 4
        (14, "a completely fresh unique document about gardening with "
             "tomatoes herbs and patient watering schedules"),
        (15, "tiny doc"),  # gate drop
        (16, "a completely fresh unique document about gardening with "
             "tomatoes herbs and patient watering schedules also"),  # near-dup of 14
    ]
    full, inc = _run_both(spark, corpus, batch, **PARAMS)
    assert inc == full

    got = {t[0]: t for t in inc}
    # (id, keep, drop_reason, duplicate_of, audit_flag, eval_id, frac)
    assert got[3][1:4] == (False, "near_duplicate", 1)   # retro fold
    assert got[4][1:4] == (False, "near_duplicate", 1)   # repointed 3 -> 1
    assert got[11][1:4] == (False, "near_duplicate", 1)  # bridge folds too
    assert got[12][1:4] == (False, "exact_duplicate", 2)
    # dup of the near-DROPPED rep 4: resolves THROUGH 4 to the final
    # cluster root 1 (the exact->near one-hop chain, round-6 VERDICT #1)
    assert got[13][1:4] == (False, "exact_duplicate", 1)
    assert got[14][1] and got[16][1:4] == (False, "near_duplicate", 14)
    assert got[1][1] and got[2][1]


def test_incremental_state_roundtrip(spark, tmp_path):
    corpus = [(1, A_TXT), (2, OTHER), (3, B_TXT)]
    batch = [(11, C_TXT), (12, OTHER)]
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **PARAMS)
    st.save(str(tmp_path / "state"))
    loaded = CurationState.load(spark, str(tmp_path / "state"))
    inc, _ = curate_incremental(
        _df(spark, batch), "doc_id", "text", state=loaded, **PARAMS
    )
    full = curate(_df(spark, corpus + batch), "doc_id", "text", **PARAMS)
    assert _sorted(inc) == _sorted(full)


def test_incremental_state_roundtrip_on_file_uri(spark, tmp_path):
    """The state save/load swap is scheme-native since r14: a state
    addressed by a ``file:`` URI (a real non-os-path scheme) saves
    through the Hadoop FS (staged write -> delete -> rename per frame,
    params.json via the committed write), loads with Hadoop-FS
    optional-frame probes, and appends identically to the os-path
    state — an os.path fallback would silently see no optional frames
    at the URI."""
    import os

    corpus = [(1, A_TXT), (2, OTHER), (3, B_TXT)]
    batch = [(11, C_TXT), (12, OTHER)]
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **PARAMS)
    uri = f"file:{tmp_path}/state_uri"
    st.save(uri)
    # the swap really landed: final frames present, no staged residue
    names = os.listdir(f"{tmp_path}/state_uri")
    assert "audit" in names and "params.json" in names
    assert not [n for n in names if n.endswith(".staged")]
    loaded = CurationState.load(spark, uri)
    inc, _ = curate_incremental(
        _df(spark, batch), "doc_id", "text", state=loaded, **PARAMS
    )
    full = curate(_df(spark, corpus + batch), "doc_id", "text", **PARAMS)
    assert _sorted(inc) == _sorted(full)
    # a second save over the SAME uri really replaces frames in place
    # (staged write -> delete -> rename per frame) and leaves no residue
    before_ids = _sorted(loaded.audit.select("doc_id"))
    CurationState.load(spark, uri).save(uri)
    after = os.listdir(f"{tmp_path}/state_uri")
    assert sorted(after) == sorted(names)
    assert not [n for n in after if n.endswith(".staged")]
    assert _sorted(CurationState.load(spark, uri).audit.select("doc_id")) == before_ids


def test_state_remote_route_roundtrip_and_manifest_guard(spark, tmp_path, monkeypatch):
    """The save/load REMOTE branches' success paths, forced onto the
    reachable default file:/// filesystem (the file:-URI test above
    takes the local fast path by design): Hadoop-FS staged swap,
    committed params.json, frame manifest, Hadoop-FS optional-frame
    probes — append over the reloaded state matches the local-route
    result. Then the manifest guard: deleting an optional frame the
    manifest lists makes load raise (a crashed swap must not silently
    build a state without the frame)."""
    import os
    import shutil

    import pytest

    import youtube_analytics_lakehouse_databricks_spark.fsops as fsops

    corpus = [(1, A_TXT), (2, OTHER), (3, B_TXT)]
    batch = [(11, C_TXT), (12, OTHER)]
    # paragraph_dedup=True gives the state OPTIONAL frames (paras), so
    # the manifest guard below is non-vacuous
    params = dict(PARAMS, paragraph_dedup=True, paragraph_min_chars=10)
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **params)
    path = f"{tmp_path}/state_remote"
    with monkeypatch.context() as m:
        m.setattr(fsops, "is_local_path", lambda p: False)
        st.save(path)
        loaded = CurationState.load(spark, path)
        inc, _ = curate_incremental(
            _df(spark, batch), "doc_id", "text", state=loaded, **params
        )
        inc_rows = _sorted(inc)
    assert os.path.exists(f"{path}/_frames.json")
    assert os.path.exists(f"{path}/params.json")
    assert not [n for n in os.listdir(path) if n.endswith(".staged")]
    full = curate(_df(spark, corpus + batch), "doc_id", "text", **params)
    assert inc_rows == _sorted(full)

    # manifest guard: an optional frame the manifest lists goes missing
    import json as json_mod

    manifest = json_mod.loads(open(f"{path}/_frames.json").read())
    optional_saved = [
        n for n in manifest
        if n in ("paras", "windows", "centroids", "semvecs", "nearmap")
    ]
    if optional_saved:
        shutil.rmtree(f"{path}/{optional_saved[0]}")
        with pytest.raises(ValueError, match="manifest says were saved"):
            CurationState.load(spark, path)


def test_incremental_durable_mode_identical(spark, tmp_path):
    """durable=True swaps every lineage cut in the append path (incl. the
    anchor-edge components) for reliable checkpoint() — identical output."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    corpus = [(1, A_TXT), (2, OTHER), (3, B_TXT)]
    batch = [(11, C_TXT), (12, OTHER)]
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **PARAMS)
    base, _ = curate_incremental(_df(spark, batch), "doc_id", "text", state=st, **PARAMS)
    dur, _ = curate_incremental(
        _df(spark, batch), "doc_id", "text", state=st, durable=True, **PARAMS
    )
    assert _sorted(dur) == _sorted(base)


def test_incremental_three_appends_chain(spark):
    """Equivalence composes: three successive appends == one full run."""
    b1 = [(1, A_TXT), (2, OTHER)]
    b2 = [(11, B_TXT), (12, "tiny doc")]
    b3 = [(21, C_TXT), (22, OTHER)]
    _, st = curate_incremental(_df(spark, b1), "doc_id", "text", **PARAMS)
    _, st = curate_incremental(_df(spark, b2), "doc_id", "text", state=st, **PARAMS)
    inc, _ = curate_incremental(_df(spark, b3), "doc_id", "text", state=st, **PARAMS)
    full = curate(_df(spark, b1 + b2 + b3), "doc_id", "text", **PARAMS)
    assert _sorted(inc) == _sorted(full)


def test_incremental_on_driver_corpus(spark):
    """Real-data equivalence: split the sf0.001 documents table at the
    80th id percentile and append the tail — verdicts must match the
    full run exactly, with default chain parameters."""
    from youtube_analytics_lakehouse_databricks_spark.queries import read

    docs = read(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    cutoff = docs.approxQuantile("doc_id", [0.8], 0.0)[0]
    corpus = docs.filter(F.col("doc_id") <= cutoff)
    batch = docs.filter(F.col("doc_id") > cutoff)

    full = _sorted(curate(docs, "doc_id", "text"))
    _, st = curate_incremental(corpus, "doc_id", "text")
    inc, _ = curate_incremental(batch, "doc_id", "text", state=st)
    assert _sorted(inc) == full


def test_incremental_optional_gates_parity(spark):
    """repetition_rules / redact / eval_df (binary AND graded) compose
    into the append path exactly like the batch operator: per-row gates
    give gate-for-gate equivalence with curate() over the union."""
    boiler = " ".join(["click here to subscribe for daily updates"] * 6)
    pii_a = BASE + " contact me at alice@example.com for details"
    pii_b = BASE + " contact me at bob@elsewhere.org for details"
    ev = spark.createDataFrame(
        [(900, "propulsion systems and orbital mechanics calculations for deep space")],
        "doc_id long, text string",
    )
    corpus = [(1, pii_a), (2, OTHER), (3, boiler)]
    batch = [(11, pii_b), (12, boiler + " now"), (13, OTHER[:90] + " tail words here")]

    gates = dict(
        repetition_rules=True,
        redact=True,
        eval_df=ev,
        decontam_k=5,
        **PARAMS,
    )
    full, inc = _run_both(spark, corpus, batch, **gates)
    assert inc == full
    got = {t[0]: t for t in inc}
    assert got[3][2] == "repetition"
    # PII-differing twins collide after the scrub, across the state line
    assert got[11][1:4] == (False, "exact_duplicate", 1)
    assert not got[2][1] and got[2][2] == "contaminated"

    # graded tier: the eval overlap of doc 2 (~29% of its 5-grams) stays
    # kept-but-flagged under a 0.5 cap, in both modes identically
    graded = dict(gates, decontam_max_frac=0.5)
    full_g, inc_g = _run_both(spark, corpus, batch, **graded)
    assert inc_g == full_g
    gg = {t[0]: t for t in inc_g}
    assert gg[2][1] and gg[2][5] == 900 and 0.2 < gg[2][6] < 0.5


def test_incremental_hot_bucket_cap_on_merged_buckets(spark):
    """The cap sees MERGED bucket sizes, and verdicts are MONOTONE: when
    the append pushes a previously-under-cap bucket over the cap, the
    full re-run resurrects docs it folded earlier (its verdict depends on
    arrival time); the incremental run keeps every drop already made,
    flags the whole over-cap bucket as under-compared exactly like the
    full run, and never keeps a doc the full run drops."""
    shared = (
        "the standard footer text appears verbatim on every single page of "
        "this site including contact information legal disclaimers copyright "
        "notices cookie policies and newsletter subscription prompts that "
        "editors never remove from any article"
    )
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(50)]

    def boiler(i):
        return (i, shared + " " + " ".join(rng.choice(vocab) for _ in range(2)))

    corpus = [boiler(i) for i in range(6)] + [(100, OTHER)]
    batch = [boiler(200 + i) for i in range(6)] + [(300, OTHER + " extra")]
    full, inc = _run_both(spark, corpus, batch, max_bucket_size=8)

    f = {t[0]: t for t in full}
    g = {t[0]: t for t in inc}
    assert set(f) == set(g)
    # audit flags identical: the merged bucket crossed the cap, so every
    # boilerplate member (stored and new) is flagged in both runs
    assert all(f[i][4] == g[i][4] for i in f)
    flagged = {i for i in g if g[i][4]}
    assert flagged and all(i < 100 or 200 <= i < 300 for i in flagged)
    # monotone: incremental keeps a subset of the full run's keeps, and
    # agrees on the drop reason wherever the full run also drops
    for i in f:
        if not f[i][1]:
            assert not g[i][1] and g[i][2] == f[i][2], (i, f[i], g[i])
    # the divergence is real in this fixture: the full run resurrects at
    # least one doc the corpus run had already folded
    resurrected = [i for i in f if f[i][1] and not g[i][1]]
    assert resurrected
    # and the untouched singleton pair still resolves identically
    assert f[300] == g[300]

    # with the cap disabled the same fixture is exactly equivalent
    full_nc, inc_nc = _run_both(spark, corpus, batch, max_bucket_size=None)
    assert inc_nc == full_nc


def test_all_gates_on_maximal_parity(spark):
    """The maximal composition: EVERY optional stage enabled at once —
    redact -> paragraph dedup -> substring dedup -> quality heuristics ->
    repetition rules -> learned classifier -> LM perplexity ->
    decontamination -> exact -> near-dup — and the incremental run must
    still equal the full-union run row for row, with each gate family's
    drop_reason observed at least once across the union."""
    from youtube_analytics_lakehouse_databricks_spark.operators.classifier import (
        train_quality_classifier,
    )
    from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import train_ngram_lm

    banner = "accept all cookies to keep browsing this site with features enabled"
    # 18 tokens: one more than the longest token run the near-dup trio
    # A/B/C shares (17 after their single changed word), so the substring
    # stage claims THE SPAN but cannot drain the near-dup fixture
    span = " ".join(f"s{i}" for i in range(18))
    gibberish = "zq wq jj kk pp zz xx yy vv bb nn mm qq ww ee rr tt uu"
    # 4-token period with a UNIQUE counter each repeat: fails the Gopher
    # top-token rule (click = 25% > 20%) but plants no repeated 6-token
    # window (every window crosses a distinct counter) and keeps a
    # distinct-token ratio well above the quality gate
    rep_doc = " ".join(f"click here subscribe c{i}" for i in range(10))
    # the exact-dup pair must evade BOTH text rewrites (each acts as
    # doc-level dedup for texts it can claim): two sub-20-char paragraphs
    # (exempt from paragraph dedup) totalling < W tokens (no substring
    # windows), in-LM-vocab, above the (lowered) length gate
    pair = "alpha bravo \n\n echo golf"
    eval_doc = "propulsion systems and orbital mechanics calculations for deep space"

    ref = spark.createDataFrame(
        [(t,) for t in (BASE, OTHER, A_TXT, B_TXT)], "text string"
    )
    lm = train_ngram_lm(ref, "text", n=2)
    clf = train_quality_classifier(
        spark.createDataFrame([(i, BASE + f" v{i}") for i in range(8)], "doc_id long, text string"),
        spark.createDataFrame([(i, gibberish + f" v{i}") for i in range(8)], "doc_id long, text string"),
        "doc_id",
        "text",
        sample_per_class=8,
    )
    ev = spark.createDataFrame([(900, eval_doc)], "doc_id long, text string")

    # r10: the semantic stage joins the maximal composition — every doc
    # carries an embedding; doc 18's is near-identical to stored doc 2's
    # (whose TEXT survives every lexical gate), so the only stage that
    # can fold 18 is the semantic one. The quantizer is explicit and
    # shared (the caller-owned-model contract, like clf and lm).
    import numpy as np

    dim = 12
    sem_dirs = np.random.default_rng(3).standard_normal((3, dim))
    sem_dirs = sem_dirs / np.linalg.norm(sem_dirs, axis=1, keepdims=True)

    def emb(g, seed, noise=0.15):
        r = np.random.default_rng(seed)
        v = sem_dirs[g] + noise * r.standard_normal(dim)
        return [float(x) for x in v / np.linalg.norm(v)]

    e2 = emb(0, 20)
    near_e2 = np.asarray(e2) + 0.004 * np.random.default_rng(8).standard_normal(dim)
    near_e2 = [float(x) for x in near_e2 / np.linalg.norm(near_e2)]

    # r11: the SEMANTIC decontam tier joins too — a FOURTH direction
    # (far from every corpus group, so nobody else crosses 0.9) hosts
    # one eval embedding and doc 19, its planted paraphrase: doc 19's
    # text passes every lexical gate and its embedding duplicates
    # nothing in the corpus, so only the embedding-vs-eval cosine can
    # drop it.
    d4 = np.random.default_rng(77).standard_normal(dim)
    d4 = d4 / np.linalg.norm(d4)
    sem_eval_vec = [float(x) for x in d4]
    near_d4 = d4 + 0.004 * np.random.default_rng(9).standard_normal(dim)
    near_d4 = [float(x) for x in near_d4 / np.linalg.norm(near_d4)]
    sem_ev = spark.createDataFrame(
        [(950, sem_eval_vec)], "doc_id long, emb array<float>"
    )

    corpus = [
        (1, f"{banner}\n\n{A_TXT} {span}", emb(0, 10)),  # claims banner + span
        (2, f"{banner}\n\n{B_TXT}", e2),
        (3, OTHER + " contact me at alice@example.com for details", emb(1, 30)),
        (4, rep_doc, emb(1, 40)),
        (5, pair, emb(2, 50)),
    ]
    batch = [
        (11, f"{banner}\n\n{C_TXT}", emb(0, 110)),  # near-dup of 2
        (12, f"fresh vocabulary document about gardens rivers {span}", emb(1, 120)),
        (14, gibberish, emb(2, 140)),  # the classifier's negative class
        (17, pair, emb(2, 170)),  # exact duplicate of stored doc 5
        # SEMANTIC dup of 2: lexically novel (reordered 3-word spans of
        # BASE -> ~0.19 shingle-jaccard vs the near-dup trio, in-vocab
        # bigrams inside each span -> low perplexity, in-LM vocabulary
        # for the classifier) — only the embedding betrays it
        (18, "alpha bravo charlie golf hotel india mike november oscar "
             "romeo sierra tango delta echo foxtrot", near_e2),
        # SEMANTIC CONTAMINATION: doc-18's construction (reordered
        # in-vocab 3-word spans of BASE -> passes perplexity/classifier/
        # quality, ~0.08 shingle-jaccard vs 18 and the trio, 15 tokens ->
        # no substring window, no 5-gram shared with the eval doc) with
        # DIFFERENT spans — only its embedding betrays the eval leak
        (19, "kilo lima mike quebec romeo sierra alpha bravo charlie "
             "november oscar papa golf hotel india", near_d4),
    ]
    gates = dict(
        semantic_vec_col="emb",
        semantic_threshold=0.97,
        semantic_centroids=sem_dirs,
        min_tokens=4,  # the exact-dup pair is 4 quality-gate tokens
        redact=True,
        paragraph_dedup=True,
        paragraph_min_chars=20,
        substring_dedup=True,
        substring_min_tokens=18,
        repetition_rules=True,
        quality_model=clf,
        # the tiny fixture classifier is weak but DETERMINISTIC (no RNG
        # anywhere): gibberish scores 0.4536, every other doc >= 0.5019
        quality_min_prob=0.48,
        perplexity_model=lm,
        # deterministic fixture perplexities: doc 12 (mostly-OOV) = 323.7,
        # doc 1 (span amortized by its in-vocab body) = 32.9, the exact
        # pair = 17.1, in-vocab docs ~1 — 100 separates cleanly
        max_perplexity=100.0,
        eval_df=ev,
        decontam_k=5,
        semantic_eval_df=sem_ev,  # r11: BOTH decontam tiers enabled
        **PARAMS,
    )
    full, inc = _run_both(spark, corpus, batch, **gates)
    assert inc == full
    got = {t[0]: t for t in inc}
    reasons = {t[2] for t in inc if t[2] is not None}
    assert got[17][1:4] == (False, "exact_duplicate", 5)
    # the semantic stage catches what every lexical gate missed: doc 18's
    # text is original, its MEANING (embedding) duplicates stored doc 2
    assert got[18][1:4] == (False, "semantic_duplicate", 2)
    # the semantic decontam tier catches what the k-gram tier missed:
    # doc 19 shares no 5-gram with any eval doc, only its embedding
    assert got[19][1:3] == (False, "semantic_contaminated")
    assert got[19][10] is not None and got[19][10] >= 0.9  # max_eval_cosine
    assert got[19][11] == 950  # semantic_matched_eval_id
    assert got[11][2] == "near_duplicate" and got[11][3] == 2
    assert got[4][2] == "repetition"
    assert got[3][2] == "contaminated"
    assert got[14][2] == "classifier"
    assert "perplexity" in reasons  # the OOV-heavy span/banner docs
    # substring provenance recorded for doc 12 whatever its final verdict
    assert got[12][7] == 18
    assert got[5][1] is True  # the exact keeper survives every gate


def test_watermark_footer_fast_path_and_observable_fallback(spark, tmp_path):
    """watermark_of: the footer-stats fast path must return the true max
    id with no Spark job; a corrupt/stats-less footer must WARN once
    (observable health signal, r11 VERDICT #4) and still return the
    correct value via the Spark aggregation; a non-integral id column
    must skip the footer path entirely (string min-max may be truncated
    to a bounding prefix by parquet writers — only integral stats are
    exact)."""
    import glob
    import warnings

    import pyarrow.parquet as pq
    import pytest

    corpus = [(1, A_TXT), (2, OTHER), (3, B_TXT), (41, C_TXT)]
    _, st = curate_incremental(_df(spark, corpus), "doc_id", "text", **PARAMS)
    st.save(str(tmp_path / "state"))
    loaded = CurationState.load(spark, str(tmp_path / "state"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the healthy fast path never warns
        assert loaded.watermark_of("doc_id") == 41

    # strip the column statistics from every stored audit file (same
    # rows, no stats) -> fast path fails, warns once, falls back correctly
    import os

    for fn in glob.glob(str(tmp_path / "state" / "audit" / "*.parquet")):
        tbl = pq.read_table(fn)
        pq.write_table(tbl, fn, write_statistics=False)
    # the in-place rewrite invalidates Hadoop's sibling .crc sidecars
    for crc in glob.glob(str(tmp_path / "state" / "audit" / ".*.crc")):
        os.remove(crc)
    reloaded = CurationState.load(spark, str(tmp_path / "state"))
    with pytest.warns(RuntimeWarning, match="footer-stats fast path failed"):
        assert reloaded.watermark_of("doc_id") == 41
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # warned ONCE, not per call
        assert reloaded.watermark_of("doc_id") == 41

    # non-integral id: the footer path is skipped by design (no warning),
    # the Spark aggregation answers
    again = CurationState.load(spark, str(tmp_path / "state"))
    again.audit = again.audit.withColumn(
        "doc_id", F.format_string("id-%02d", "doc_id")
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert again.watermark_of("doc_id") == "id-41"
