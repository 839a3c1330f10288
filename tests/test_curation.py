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
