"""End-to-end curation composition: quality gate -> exact dedup ->
near-dup dedup, with a full per-doc audit trail."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a bright autumn moon near the river"
)
VARIANT = BASE.replace("autumn", "winter")  # near-dup of BASE
OTHER = (
    "completely different subject matter entirely about spacecraft "
    "propulsion systems and orbital mechanics calculations for deep "
    "space missions beyond the outer planets of this solar system"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # byte-exact duplicate of 1
        (3, "The quick  brown fox jumps over the lazy dog while seven "
            "wizards brew strong potions under a bright autumn moon near "
            "the river!"),  # cosmetic variant of 1 (case/punct/ws)
        (4, VARIANT),  # near-duplicate of 1 (one word changed)
        (5, OTHER),  # unique keeper
        (6, "tiny doc"),  # low quality: too few tokens
        (7, "the the the the the the the the the the the the"),  # stopword spam
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_full_chain(spark):
    out = {r["doc_id"]: r for r in curate(_docs(spark), "doc_id", "text").collect()}
    assert len(out) == 7  # every input doc has an audit row

    # no hot buckets on this corpus: every audit flag is False
    assert not any(r["near_dup_audit_incomplete"] for r in out.values())

    # keepers
    for i in (1, 5):
        assert out[i]["keep"] and out[i]["drop_reason"] is None
        assert out[i]["duplicate_of"] is None

    # quality drops (gate runs FIRST, so they never reach dedup)
    assert out[6]["drop_reason"] == "low_quality"
    assert out[7]["drop_reason"] == "low_quality"
    assert out[6]["duplicate_of"] is None

    # exact dups fold into the min-id keeper (canonical text collides 2 and 3)
    assert out[2]["drop_reason"] == "exact_duplicate" and out[2]["duplicate_of"] == 1
    assert out[3]["drop_reason"] == "exact_duplicate" and out[3]["duplicate_of"] == 1

    # the one-word variant survives exact dedup but falls to near-dup
    assert out[4]["drop_reason"] == "near_duplicate" and out[4]["duplicate_of"] == 1

    kept = [i for i, r in out.items() if r["keep"]]
    assert sorted(kept) == [1, 5]


def test_curate_matches_registered_chain(spark):
    """On the driver corpus, curate's near-dup verdicts agree with the
    registered dedup_keepers query (same thresholds) for every doc that
    passes the quality gate and exact dedup."""
    from youtube_analytics_lakehouse_databricks_spark.queries import read, registry

    sf = "/root/testdata/sf0.001"
    docs = read(spark, sf, "documents")
    out = curate(docs, "doc_id", "text").collect()
    keepers = {
        r["doc_id"]: r for r in registry()["dedup_keepers"].builder(spark, sf).collect()
    }
    for r in out:
        if r["drop_reason"] == "near_duplicate":
            k = keepers[r["doc_id"]]
            assert not k["keep"] and k["component"] == r["duplicate_of"], r


def test_curate_canonical_near_dup(spark):
    """A doc that differs from another by one word PLUS case/punctuation
    still folds as a near-duplicate: shingling runs over the canonical
    text, inheriting exact dedup's normalization (round-5 ADVICE fix)."""
    noisy_variant = VARIANT.replace("quick brown", "Quick, BROWN").replace(
        "lazy dog", "lazy dog!!"
    )
    rows = [(1, BASE), (2, noisy_variant), (3, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in curate(docs, "doc_id", "text").collect()}
    assert out[2]["drop_reason"] == "near_duplicate" and out[2]["duplicate_of"] == 1

    # with canonicalization off, the cosmetic noise splits the shingles
    # enough that the variant can survive — the flag is honored
    raw = {
        r["doc_id"]: r
        for r in curate(docs, "doc_id", "text", canonical_near_dup=False).collect()
    }
    assert raw[3]["keep"]  # sanity: unrelated doc never folds either way


def test_curate_repetition_gate(spark):
    """repetition_rules=True adds the Gopher/C4 gate: a non-short but
    degenerate doc (one token repeated) drops with reason 'repetition'
    BEFORE any dedup hashing; defaults-off keeps the old behavior."""
    # a doc that PASSES the base gate (distinct_ratio 7/42 ≈ 0.17, low
    # stopword share, plenty of tokens) but fails the repetition rules:
    # a 7-word phrase repeated 6 times has dup_bigram_frac ≈ 0.83
    boiler = " ".join(["click here to subscribe for daily updates"] * 6)
    rows = [(1, BASE), (2, boiler), (3, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    off = {r["doc_id"]: r for r in curate(docs, "doc_id", "text").collect()}
    on = {
        r["doc_id"]: r
        for r in curate(docs, "doc_id", "text", repetition_rules=True).collect()
    }
    assert off[2]["keep"]  # base gate alone lets boilerplate through
    assert on[2]["drop_reason"] == "repetition" and not on[2]["keep"]
    assert on[1]["keep"] and on[3]["keep"]


def test_curate_redact_before_hashing(spark):
    """redact=True scrubs PII before hashing, so two docs identical except
    for (different) PII collide as exact duplicates."""
    a = BASE + " contact me at alice@example.com for details"
    b = BASE + " contact me at bob@elsewhere.org for details"
    rows = [(1, a), (2, b), (3, OTHER)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {r["doc_id"]: r for r in curate(docs, "doc_id", "text").collect()}
    scrubbed = {
        r["doc_id"]: r for r in curate(docs, "doc_id", "text", redact=True).collect()
    }
    assert plain[2]["drop_reason"] != "exact_duplicate"  # different emails
    assert scrubbed[2]["drop_reason"] == "exact_duplicate"
    assert scrubbed[2]["duplicate_of"] == 1


def test_curate_hot_bucket_audit_surfaced(spark):
    """An adversarial boilerplate cluster that overflows max_bucket_size
    surfaces per-doc: every member of a dropped bucket is flagged
    near_dup_audit_incomplete (kept, but under-compared) — the one-call
    API honors its 'nothing silently discarded' contract."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    shared = (
        "the standard footer text appears verbatim on every single page of "
        "this site including contact information legal disclaimers copyright "
        "notices cookie policies and newsletter subscription prompts that "
        "editors never remove from any article"
    )
    rows = []
    # 40 docs dominated by the same long boilerplate prefix (short unique
    # tails) -> their minhash minima come from the shared shingles and
    # they land in the same band buckets; cap at 8 so those are dropped
    for i in range(40):
        tail = " ".join(rng.choice(vocab) for _ in range(2))
        rows.append((i, shared + " " + tail))
    # plus a clean near-dup pair far from the boilerplate cluster
    rows.append((100, OTHER))
    rows.append((101, OTHER.replace("orbital", "planetary")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: r
        for r in curate(docs, "doc_id", "text", max_bucket_size=8).collect()
    }
    flagged = [i for i, r in out.items() if r["near_dup_audit_incomplete"]]
    assert len(flagged) >= 9  # at least one over-cap bucket's members
    assert all(i < 100 for i in flagged)  # only the boilerplate cluster
    # the clean pair still resolves normally
    assert out[101]["drop_reason"] == "near_duplicate"
    assert out[101]["duplicate_of"] == 100
    # uncapped run flags nothing
    unflagged = curate(docs, "doc_id", "text", max_bucket_size=None)
    assert not any(
        r["near_dup_audit_incomplete"] for r in unflagged.collect()
    )


def test_curate_exact_dup_of_near_folded_keeper_gets_final_root(spark):
    """The two-hop chain (round-6 VERDICT #1): an exact duplicate whose
    keeper is ITSELF near-folded must point at the keeper's component
    root, not the keeper — every member of a duplicate cluster carries
    the SAME final root, or leakage_safe_split(include_dropped=True)
    can put cluster members on opposite split sides."""
    rows = [
        (2, VARIANT),  # near-dup of BASE; min id -> the component root
        (5, BASE),     # exact keeper of {5, 6, 7}; near-folds into 2
        (6, BASE),     # byte-exact dup of 5
        (7, BASE.replace("quick", "Quick,")),  # cosmetic exact dup of 5
        (9, OTHER),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curate(docs, "doc_id", "text").collect()}

    assert out[2]["keep"] and out[9]["keep"]
    assert out[5]["drop_reason"] == "near_duplicate" and out[5]["duplicate_of"] == 2
    # the fix: 6 and 7 resolve THROUGH 5 to the final root 2
    for i in (6, 7):
        assert out[i]["drop_reason"] == "exact_duplicate"
        assert out[i]["duplicate_of"] == 2, out[i]
    # whole cluster shares one root
    roots = {out[i]["duplicate_of"] for i in (5, 6, 7)}
    assert roots == {2}


def test_curate_durable_mode_identical(spark, tmp_path):
    """durable=True swaps every localCheckpoint lineage cut (curate's own
    plus the connected-components rounds) for reliable checkpoint() —
    executor-loss-safe on a cluster — and must change NOTHING about the
    result. Without a configured checkpoint dir it fails loudly instead
    of silently degrading to the non-durable path."""
    from youtube_analytics_lakehouse_databricks_spark.operators.graph import connected_components

    docs = _docs(spark)
    if spark.sparkContext.getCheckpointDir() is None:
        # must raise BEFORE any work runs (setCheckpointDir is global and
        # irreversible per context, so this arm only fires when no other
        # test has set it yet)
        try:
            curate(docs, "doc_id", "text", durable=True).collect()
            raise AssertionError("durable=True without a checkpoint dir must raise")
        except ValueError as e:
            assert "setCheckpointDir" in str(e)

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    base = sorted(map(tuple, curate(docs, "doc_id", "text").collect()))
    dur = sorted(map(tuple, curate(docs, "doc_id", "text", durable=True).collect()))
    assert dur == base

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9)], "a long, b long"
    )
    cc_base = sorted(map(tuple, connected_components(edges, "a", "b").collect()))
    cc_dur = sorted(
        map(tuple, connected_components(edges, "a", "b", durable=True).collect())
    )
    assert cc_dur == cc_base


def test_curate_decontamination_stage(spark):
    # doc 5 (OTHER) leaks into the benchmark; with eval_df given it must
    # drop as 'contaminated' BEFORE dedup, and everything else is
    # unaffected
    ev = spark.createDataFrame(
        [(900, "propulsion systems and orbital mechanics calculations for deep space")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curate(
            _docs(spark), "doc_id", "text", eval_df=ev, decontam_k=5
        ).collect()
    }
    assert len(out) == 7
    assert not out[5]["keep"] and out[5]["drop_reason"] == "contaminated"
    assert out[5]["duplicate_of"] is None
    # the audit pointer names the leaking eval doc even for a drop
    assert out[5]["matched_eval_id"] == 900
    assert 0.0 < out[5]["contamination_frac"] <= 1.0
    # the dedup verdicts of the rest are untouched by the new stage
    base = {r["doc_id"]: r for r in curate(_docs(spark), "doc_id", "text").collect()}
    for d in (1, 2, 3, 4, 6, 7):
        assert (out[d]["keep"], out[d]["drop_reason"]) == (
            base[d]["keep"],
            base[d]["drop_reason"],
        )
        assert out[d]["matched_eval_id"] is None
    # without an eval set the audit columns exist and are all NULL
    assert all(
        r["matched_eval_id"] is None and r["contamination_frac"] is None
        for r in base.values()
    )


def test_curate_graded_decontamination(spark):
    """decontam_max_frac tiers the verdict: the eval doc overlaps ~29% of
    OTHER's 5-grams (a 9-token contiguous leak), so a 0.5 cap keeps doc 5
    flagged for review while a 0.2 cap drops it — and the binary default
    (any hit) always drops it."""
    ev = spark.createDataFrame(
        [(900, "propulsion systems and orbital mechanics calculations for deep space")],
        "doc_id long, text string",
    )

    def run(**kw):
        return {
            r["doc_id"]: r
            for r in curate(
                _docs(spark), "doc_id", "text", eval_df=ev, decontam_k=5, **kw
            ).collect()
        }

    lenient = run(decontam_max_frac=0.5)
    # kept-but-flagged: the review tier of a graded policy
    assert lenient[5]["keep"] and lenient[5]["drop_reason"] is None
    assert lenient[5]["matched_eval_id"] == 900
    assert 0.2 < lenient[5]["contamination_frac"] < 0.5
    # every non-overlapping doc is unflagged
    assert all(lenient[d]["matched_eval_id"] is None for d in (1, 2, 3, 4, 6, 7))

    strict = run(decontam_max_frac=0.2)
    assert not strict[5]["keep"] and strict[5]["drop_reason"] == "contaminated"
    assert strict[5]["matched_eval_id"] == 900
