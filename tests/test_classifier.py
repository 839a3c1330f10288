"""Hashed linear quality classifier (operators/classifier.py).

Separable synthetic corpora: "quality" docs draw from an encyclopedic
vocabulary, "crawl" docs from a spam vocabulary, both sharing common
filler. The model must separate a held-out set, score deterministically
and partition-invariantly, round-trip through save/load, and run
inference with zero Python in the plan and exactly one aggregation
exchange over a broadcast weight join.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.classifier import (
    QualityClassifier,
    train_quality_classifier,
    score_quality,
)

GOOD = "study history species century theory evidence region language population government".split()
SPAM = "click win free casino pills cheap viagra prize offer subscribe".split()
FILL = "the of and to in a is that for with".split()


def _mk(rng, vocab, n_words):
    return " ".join(
        rng.choice(vocab) if rng.random() < 0.6 else rng.choice(FILL)
        for _ in range(n_words)
    )


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)
    pos = [(i, _mk(rng, GOOD, 30)) for i in range(300)]
    neg = [(i, _mk(rng, SPAM, 30)) for i in range(300)]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(pos[:200], schema),
        spark.createDataFrame(neg[:200], schema),
        spark.createDataFrame(
            [(i + 1000, t) for i, t in pos[200:]]
            + [(i + 2000, t) for i, t in neg[200:]],
            schema,
        ),
    )


@pytest.fixture(scope="module")
def model(corpora):
    pos, neg, _ = corpora
    return train_quality_classifier(pos, neg, "doc_id", "text", n_features=1 << 14)


def test_separates_holdout(spark, corpora, model):
    _, _, holdout = corpora
    scored = score_quality(holdout, "doc_id", "text", model)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    acc = sum(
        1
        for d, p in rows.items()
        if (p > 0.5) == (d < 2000)  # ids 1000-1099 positive, 2000+ negative
    ) / len(rows)
    assert acc >= 0.95, acc
    assert all(0.0 <= p <= 1.0 for p in rows.values())


def test_deterministic_training_and_scoring(spark, corpora, model):
    pos, neg, holdout = corpora
    again = train_quality_classifier(pos, neg, "doc_id", "text", n_features=1 << 14)
    assert again.weights == model.weights and again.bias == model.bias
    a = {r["doc_id"]: r["quality_logit"] for r in score_quality(holdout, "doc_id", "text", model).collect()}
    b = {
        r["doc_id"]: r["quality_logit"]
        for r in score_quality(holdout.repartition(13), "doc_id", "text", model).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], abs=1e-12)


def test_empty_and_unknown_docs(spark, model):
    import math

    df = spark.createDataFrame(
        [(1, ""), (2, "zzzz qqqq wwww")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["quality_logit"], r["quality_prob"]) for r in
            score_quality(df, "doc_id", "text", model).collect()}
    assert rows[1][0] == pytest.approx(model.bias)
    assert rows[1][1] == pytest.approx(1.0 / (1.0 + math.exp(-model.bias)))
    # unknown tokens hit unweighted buckets -> near-bias score
    assert abs(rows[2][0] - model.bias) < 1.0


def test_save_load_roundtrip(spark, corpora, model, tmp_path):
    _, _, holdout = corpora
    p = str(tmp_path / "model")
    model.save(spark, p)
    loaded = QualityClassifier.load(spark, p)
    assert loaded.weights == model.weights
    assert loaded.bias == model.bias
    assert (loaded.n_features, loaded.bigrams) == (model.n_features, model.bigrams)


def test_inference_plan_jvm_only(spark, corpora, model):
    _, _, holdout = corpora
    plan = (
        score_quality(holdout, "doc_id", "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # r16: zero-token docs ride the explode_outer sentinel row, not a
    # corpus-wide restore join — the per-doc aggregation is the plan's
    # ONLY exchange and no join may sort-merge
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_empty_doc_ignores_seed_bucket_weight(spark):
    """xxhash64(NULL) returns the seed (42): the sentinel row's feat must
    stay NULL, or every zero-token doc would silently pick up bucket 42's
    weight. Pin it with a model that carries an explicit weight there."""
    import math

    model = QualityClassifier(
        weights=[(42, 5.0)], bias=0.25, n_features=1 << 14, bigrams=False
    )
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in score_quality(df, "doc_id", "text", model).collect()}
    for r in rows.values():
        assert r["quality_logit"] == pytest.approx(0.25)
        assert r["quality_prob"] == pytest.approx(1.0 / (1.0 + math.exp(-0.25)))


def test_curate_classifier_gate(spark, corpora, model):
    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
    from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
        curate_incremental,
    )

    _, _, holdout = corpora
    audit = curate(
        holdout, "doc_id", "text", quality_model=model, quality_min_prob=0.5
    )
    rows = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in audit.collect()}
    dropped = {d for d, (k, _) in rows.items() if not k}
    # the spam half (ids >= 2000) is what the gate removes
    spam = {d for d in rows if d >= 2000}
    assert len(dropped & spam) / len(spam) >= 0.95
    assert all(rows[d][1] == "classifier" for d in dropped if d in spam)
    # kept quality docs survive with no reason
    kept_good = [d for d in rows if d < 2000 and rows[d][0]]
    assert len(kept_good) >= 0.9 * len(spam)

    # incremental with the same model matches the full run on the union
    half = sorted(d for d in rows)[: len(rows) // 2]
    b1 = holdout.filter(F.col("doc_id").isin(half))
    b2 = holdout.filter(~F.col("doc_id").isin(half))
    _, st = curate_incremental(
        b1, "doc_id", "text", quality_model=model, quality_min_prob=0.5
    )
    inc_audit, _ = curate_incremental(
        b2, "doc_id", "text", state=st, quality_model=model, quality_min_prob=0.5
    )
    inc = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in inc_audit.collect()}
    full = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in curate(
            holdout, "doc_id", "text", quality_model=model, quality_min_prob=0.5
        ).collect()
    }
    assert inc == full


def test_oracle_feature_space_is_collision_free(spark):
    """The classifier_training_scores registry row keys its DuckDB mirror
    on gram STRINGS, which is valid iff the 2^61-bucket hashing trick is
    injective on the fixture vocabulary. The BUCKET side comes from the
    REAL operator code (_feature_rows — so a change to its hashing or
    tokenization fails here, not silently under the oracle); the GRAM
    side is an independent inline derivation of the same token/bigram
    space. Injective <=> the two distinct counts agree."""
    from youtube_analytics_lakehouse_databricks_spark.operators.classifier import _feature_rows
    from youtube_analytics_lakehouse_databricks_spark.operators.text import norm_expr
    from youtube_analytics_lakehouse_databricks_spark.queries import read

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = read(spark, sf_dir, "documents").select(
            "doc_id", norm_expr("text").alias("text")
        )
        n_buckets = (
            _feature_rows(docs, "doc_id", "text", n_features=1 << 61, bigrams=True)
            .select("feat")
            .distinct()
            .count()
        )
        toks = docs.select(
            F.expr("filter(split(text, ' '), x -> x <> '')").alias("__t")
        )
        uni = toks.select(F.explode("__t").alias("__g"))
        bi = toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(__t) >= 2 THEN transform("
                    "sequence(0, size(__t) - 2), i -> concat(__t[i], ' ', __t[i + 1]))"
                    " ELSE CAST(array() AS array<string>) END"
                )
            ).alias("__g")
        )
        n_grams = uni.unionByName(bi).distinct().count()
        assert n_grams == n_buckets, (sf_dir, n_grams, n_buckets)


def test_registered_row_matches_operator_at_production_width(spark):
    """The registry row's 2^61 feature space is a test-only twist; pin
    that the SAME train+score path at the production 2^18 width yields
    scores within hashing-collision distance (identical here — the
    fixture vocab is ~950 grams, collisions merely possible, and any
    that occur shift only the colliding buckets' weights)."""
    from youtube_analytics_lakehouse_databricks_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from youtube_analytics_lakehouse_databricks_spark.queries import read
    from youtube_analytics_lakehouse_databricks_spark.queries.textops import (
        CLF_ORACLE_EPOCHS,
        CLF_ORACLE_SAMPLE,
    )

    docs = read(spark, "/root/testdata/sf0.001", "documents")
    outs = []
    for n_features in (1 << 61, 1 << 18):
        model = train_quality_classifier(
            docs.filter("lang = 'en'"),
            docs.filter("lang <> 'en'"),
            "doc_id",
            "text",
            n_features=n_features,
            sample_per_class=CLF_ORACLE_SAMPLE,
            epochs=CLF_ORACLE_EPOCHS,
        )
        outs.append(
            {
                r["doc_id"]: r["quality_logit"]
                for r in score_quality(docs, "doc_id", "text", model).collect()
            }
        )
    wide, prod = outs
    assert set(wide) == set(prod)
    # identical unless a 2^18 collision exists in the fixture vocab; keep
    # the tolerance loose enough to survive one (weights are ~1e-3 here)
    diffs = [abs(wide[k] - prod[k]) for k in wide]
    assert max(diffs) < 1e-2, max(diffs)
