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
