"""Temperature-weighted corpus mixing (operators/mixing.py).

Pins: rate computation against hand-computed targets, determinism and
partitioning-invariance of the sampled set, the nesting property of
threshold sampling (lower rate => subset), temperature endpoints
(alpha=1 natural proportions, alpha=0 equal shares), explicit-weight
mixes with dropped domains, upsampling copy semantics, and a UDF-free
single-broadcast plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.mixing import (
    domain_rates,
    mixture_sample,
)

COUNTS = {"web": 20000, "code": 4000, "books": 1000}


@pytest.fixture(scope="module")
def corpus(spark):
    parts = [
        spark.range(n).selectExpr(
            f"id + {off} AS doc_id", f"'{d}' AS domain", "concat('t', id) AS text"
        )
        for off, (d, n) in zip((0, 10**6, 2 * 10**6), sorted(COUNTS.items()))
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.cache()


def kept_ids(df):
    return {(r["doc_id"], r["copy"]) for r in df.select("doc_id", "copy").collect()}


def sizes_by_domain(df):
    return {
        r["domain"]: r["n"]
        for r in df.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_rates_alpha_endpoints(spark, corpus):
    # alpha=1: every rate is total_target/total = 1.0 (natural mix)
    for d, n, r in domain_rates(corpus, "domain", alpha=1.0):
        assert r == pytest.approx(1.0)
        assert n == COUNTS[d]
    # alpha=0: equal share of 12k => 4k per domain; web rate 4k/20k
    rates = dict(
        (d, r) for d, _, r in domain_rates(corpus, "domain", alpha=0.0, target_rows=12000)
    )
    assert rates["web"] == pytest.approx(0.2)
    assert rates["code"] == pytest.approx(1.0)  # capped: target 4000 = supply
    assert rates["books"] == pytest.approx(1.0)  # capped from 4.0


def test_rates_explicit_weights_and_drop(spark, corpus):
    rates = dict(
        (d, r)
        for d, _, r in domain_rates(
            corpus, "domain", weights={"web": 1.0, "code": 1.0}, target_rows=8000
        )
    )
    assert rates["books"] == 0.0  # absent from weights => dropped
    assert rates["web"] == pytest.approx(4000 / 20000)
    assert rates["code"] == pytest.approx(1.0)


def test_rates_validation(spark, corpus):
    with pytest.raises(ValueError):
        domain_rates(corpus, "domain")  # neither alpha nor weights
    with pytest.raises(ValueError):
        domain_rates(corpus, "domain", alpha=0.5, weights={"web": 1})  # both
    with pytest.raises(ValueError):
        domain_rates(corpus, "domain", weights={"web": -1.0})
    with pytest.raises(ValueError, match="not in the corpus"):
        domain_rates(corpus, "domain", weights={"nosuch": 1.0})
    with pytest.raises(ValueError, match="not in the corpus"):
        domain_rates(corpus, "domain", weights={"web": 1.0, "tyop": 2.0})


def test_sample_sizes_track_rates(spark, corpus):
    out = mixture_sample(corpus, "domain", "doc_id", alpha=0.0, target_rows=12000, seed=1)
    sizes = sizes_by_domain(out)
    assert sizes["books"] == COUNTS["books"]  # rate capped at 1: all kept
    assert sizes["code"] == COUNTS["code"]
    assert abs(sizes["web"] - 4000) < 4000 * 0.08  # rate 0.2 of 20k


def test_deterministic_and_partition_invariant(spark, corpus):
    a = kept_ids(mixture_sample(corpus, "domain", "doc_id", alpha=0.5, seed=7))
    b = kept_ids(
        mixture_sample(
            corpus.repartition(31), "domain", "doc_id", alpha=0.5, seed=7
        )
    )
    assert a == b
    c = kept_ids(mixture_sample(corpus, "domain", "doc_id", alpha=0.5, seed=8))
    assert a != c  # seed re-draws


def test_threshold_sampling_nests(spark, corpus):
    lo = kept_ids(
        mixture_sample(corpus, "domain", "doc_id", weights={"web": 1}, target_rows=2000, seed=3)
    )
    hi = kept_ids(
        mixture_sample(corpus, "domain", "doc_id", weights={"web": 1}, target_rows=8000, seed=3)
    )
    assert lo < hi  # strict subset: shrinking a mix never churns survivors


def test_upsampling_copies(spark, corpus):
    # books weight pushes its rate to 2.5: floor 2 copies + 0.5 chance of a 3rd
    out = mixture_sample(
        corpus,
        "domain",
        "doc_id",
        weights={"books": 1.0},
        target_rows=2500,
        seed=5,
        allow_upsample=True,
    ).cache()
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_doc.values()) <= {2, 3}
    total = sum(per_doc.values())
    assert abs(total - 2500) < 2500 * 0.08
    # copy indices are dense 0..n-1 per doc
    copies = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy")).alias("cs"), F.count(F.lit(1)).alias("n")
    )
    bad = copies.filter(F.expr("cs <> sequence(0, n - 1)")).count()
    assert bad == 0
    out.unpersist()


def test_null_domain_rows_are_sampled_not_dropped(spark):
    """domain_rates groups NULL domains and reports a rate for them, so
    mixture_sample must APPLY it — the join is null-safe (a plain inner
    join on the column would silently drop every NULL-domain row,
    contradicting the module's fail-loudly posture; round-6 ADVICE)."""
    rows = [(i, None if i % 4 == 0 else f"dom{i % 2}", f"t{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")

    rates = {d: r for d, _, r in domain_rates(df, "domain", alpha=1.0)}
    assert None in rates and rates[None] == pytest.approx(1.0)

    out = mixture_sample(df, "domain", "doc_id", alpha=1.0, seed=0)
    # alpha=1 is the natural mix: every row survives, NULL domains too
    assert out.count() == 2000
    assert out.filter(F.col("domain").isNull()).count() == 500

    # and a real downsample still draws from the NULL group
    half = mixture_sample(df, "domain", "doc_id", alpha=1.0, target_rows=1000, seed=0)
    n_null = half.filter(F.col("domain").isNull()).count()
    assert 150 < n_null < 350  # ~250 expected


def test_lehmer_draw_matches_python_reference(spark):
    """The ANSI-replayable ``draw='lehmer'`` mode must reproduce the
    exact Park-Miller decision an external engine would compute —
    pinned against a pure-Python replay of rates + draw, NULL domain
    included, and it must keep the threshold-nesting property."""
    rows = [(i, None if i % 5 == 0 else f"dom{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")

    rates = {d: r for d, _, r in domain_rates(df, "domain", alpha=0.5)}
    M, A = 2147483647, 48271
    want = {
        (i, d)
        for i, d in rows
        if ((i + 1) * A % M) / M < rates[d]
    }
    got = {
        (r["doc_id"], r["domain"])
        for r in mixture_sample(
            df, "domain", "doc_id", alpha=0.5, seed=0, draw="lehmer"
        ).collect()
    }
    assert got == want
    assert any(d is None for _, d in got)  # NULL domain drawn from

    # nesting under a shrunken target, same draw
    small = {
        (r["doc_id"], r["domain"])
        for r in mixture_sample(
            df, "domain", "doc_id", alpha=0.5, target_rows=1200, seed=0, draw="lehmer"
        ).collect()
    }
    assert small <= got

    with pytest.raises(ValueError):
        mixture_sample(df, "domain", "doc_id", alpha=0.5, draw="nope")


def test_plan_no_udfs_no_corpus_shuffle(spark, corpus):
    plan = (
        mixture_sample(corpus, "domain", "doc_id", alpha=0.5, seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # the only exchange is the broadcast of the tiny rate table
    assert "Exchange hashpartitioning" not in plan, plan


def test_lehmer_rejects_non_integral_id(spark):
    # string/UUID ids cast to NULL under the lehmer BIGINT draw, which
    # would silently drop every row from the mix — must raise instead
    # (r8 ADVICE); the xxhash64 default keeps accepting any id type
    df = spark.createDataFrame(
        [(f"doc-{i}", "web") for i in range(20)], "doc_id string, domain string"
    )
    with pytest.raises(ValueError, match="integral id"):
        mixture_sample(df, "domain", "doc_id", alpha=0.5, draw="lehmer")
    assert mixture_sample(df, "domain", "doc_id", alpha=1.0).count() == 20


def test_token_budget_mix(spark):
    """weight_col switches the budget unit to tokens: the realized
    per-domain TOKEN totals land on count*rate (linearity of the
    independent draw), temperature shares run over token mass, and the
    nesting property survives — shrinking the token budget only removes
    docs."""
    import random

    rng = random.Random(5)
    rows = []
    for i in range(3000):
        domain = ("web", "code", "books")[i % 3]
        # skewed doc lengths so tokens != rows: web docs short, books long
        n_tok = {"web": rng.randint(10, 50), "code": rng.randint(50, 150),
                 "books": rng.randint(200, 600)}[domain]
        rows.append((i, domain, n_tok))
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    tokens = {d: sum(n for _, dd, n in rows if dd == d) for d in ("web", "code", "books")}
    total_tokens = sum(tokens.values())

    budget = total_tokens // 4
    # weights sized WITHIN each domain's token supply (web is token-poor:
    # a 0.5 share of the budget would exceed it and hit the honest
    # rate<=1 cap — the separately-tested undershoot behavior)
    mix = {"web": 0.5, "code": 1.0, "books": 2.5}
    out = mixture_sample(
        df, "domain", "doc_id", weights=mix,
        target_rows=budget, weight_col="n_tokens", seed=3,
    )
    got = {
        r["domain"]: r["t"]
        for r in out.groupBy("domain").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for d, share in (("web", 0.125), ("code", 0.25), ("books", 0.625)):
        want = budget * share
        assert abs(got[d] - want) / want < 0.15, (d, got[d], want)

    # nesting: the half-budget mix is a subset of the full-budget mix
    small = mixture_sample(
        df, "domain", "doc_id", weights=mix,
        target_rows=budget // 2, weight_col="n_tokens", seed=3,
    )
    big_ids = {r["doc_id"] for r in out.collect()}
    small_ids = {r["doc_id"] for r in small.collect()}
    assert small_ids <= big_ids and len(small_ids) < len(big_ids)

    # temperature over token MASS: alpha=0 targets equal token shares
    # (budget small enough that a third fits inside web's token supply)
    eq_budget = total_tokens // 8
    eq = mixture_sample(
        df, "domain", "doc_id", alpha=0.0, target_rows=eq_budget,
        weight_col="n_tokens", seed=3,
    )
    got_eq = {
        r["domain"]: r["t"]
        for r in eq.groupBy("domain").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for d in ("web", "code", "books"):
        want = eq_budget / 3
        assert abs(got_eq[d] - want) / want < 0.15, (d, got_eq[d], want)

    # a NULL token column cannot be budgeted — loud
    withnull = df.withColumn(
        "n_tokens", F.when(F.col("domain") == "code", None).otherwise(F.col("n_tokens"))
    )
    with pytest.raises(ValueError, match="NULL/negative"):
        mixture_sample(
            withnull, "domain", "doc_id", alpha=0.5, weight_col="n_tokens"
        )
