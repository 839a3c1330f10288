"""N-gram LM perplexity scoring (operators/lm_quality.py).

Correctness is pinned against an independent pure-Python Stupid Backoff
implementation (same canonical tokenization, same backoff chain, same
OOV floor) on handcrafted and randomized corpora; behavioral tests
check the quality-filter story (reference-like text scores lower
perplexity than gibberish), short-doc surfacing, save/load, and the
no-Python-UDF plan contract.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import (
    NgramLM,
    score_perplexity,
    train_ngram_lm,
)


def _norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub("[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]


class PyStupidBackoff:
    def __init__(self, texts, n=3, alpha=0.4, min_count=1):
        from collections import Counter

        self.n, self.alpha = n, alpha
        self.counts = [Counter() for _ in range(n)]
        for t in texts:
            toks = _norm_tokens(t)
            for k in range(1, n + 1):
                for i in range(len(toks) - k + 1):
                    self.counts[k - 1][tuple(toks[i : i + k])] += 1
        # prune orders >= 2 below min_count (mirrors the operator)
        for k in range(2, n + 1):
            self.counts[k - 1] = {
                g: c for g, c in self.counts[k - 1].items() if c >= min_count
            }
        self.n_tokens = sum(self.counts[0].values())
        self.vocab = len(self.counts[0])
        self.oov = 1.0 / (self.n_tokens + self.vocab)

    def _s(self, gram: tuple) -> float:
        k = len(gram)
        c = self.counts[k - 1].get(gram, 0)
        if c > 0:
            if k == 1:
                return c / self.n_tokens
            ctx = self.counts[k - 2].get(gram[:-1], 0)
            if ctx > 0:
                return c / ctx
        if k == 1:
            return self.oov
        return self.alpha * self._s(gram[1:])

    def score_doc(self, text: str):
        toks = _norm_tokens(text)
        if len(toks) < self.n:
            return (0, None, None, False)
        lps = [
            math.log(self._s(tuple(toks[i : i + self.n])))
            for i in range(len(toks) - self.n + 1)
        ]
        avg = sum(lps) / len(lps)
        return (len(lps), avg, math.exp(-avg), True)


REF = [
    "the cat sat on the mat and the dog sat on the rug",
    "the cat ran to the mat while the dog slept on the rug",
    "a cat and a dog sat on the mat near the door",
    "the dog ran to the door and the cat slept near the mat",
]


def _run_spark(spark, train_texts, probe_rows, **kw):
    train_df = spark.createDataFrame([(t,) for t in train_texts], "text string")
    model = train_ngram_lm(train_df, "text", **kw)
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    rows = score_perplexity(probe, "doc_id", "text", model).collect()
    return model, {
        r["doc_id"]: (
            r["n_scored_grams"],
            r["avg_logprob"],
            r["perplexity"],
            r["scored"],
        )
        for r in rows
    }


def _check(spark, train_texts, probe_rows, **kw):
    _, got = _run_spark(spark, train_texts, probe_rows, **kw)
    ref = PyStupidBackoff(train_texts, **{k: v for k, v in kw.items()})
    for doc_id, text in probe_rows:
        n_g, avg, ppl, scored = ref.score_doc(text)
        gn, gavg, gppl, gscored = got[doc_id]
        assert gn == n_g and gscored == scored, doc_id
        if scored:
            assert gavg == pytest.approx(avg, rel=1e-12), doc_id
            assert gppl == pytest.approx(ppl, rel=1e-12), doc_id
        else:
            assert gavg is None and gppl is None
    return got


def test_matches_python_reference_in_domain(spark):
    probes = [(i, t) for i, t in enumerate(REF)]
    _check(spark, REF, probes)


def test_matches_python_reference_backoff_and_oov(spark):
    probes = [
        (1, "the cat sat on the rug"),  # seen trigrams + backoff mixes
        (2, "dog mat cat the on ran"),  # word salad: bigram/unigram floors
        (3, "the zebra sat on the qwerty"),  # OOV tokens hit the epsilon
        (4, "zz yy xx ww vv"),  # fully OOV
    ]
    _check(spark, REF, probes)


def test_normalization_is_canonical(spark):
    # cosmetic variants score identically to their canonical form
    probes = [(1, "The CAT sat, on the mat!"), (2, "the cat sat on the mat")]
    got = _check(spark, REF, probes)
    assert got[1] == got[2]


def test_short_docs_surfaced_not_dropped(spark):
    probes = [(1, "the cat"), (2, ""), (3, "the cat sat")]
    got = _check(spark, REF, probes)
    assert got[1][3] is False and got[2][3] is False and got[3][3] is True


def test_perplexity_separates_reference_from_gibberish(spark):
    probes = [(1, REF[0]), (2, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff")]
    got = _check(spark, REF, probes)
    assert got[1][2] < got[2][2] / 100  # orders of magnitude apart


def test_min_count_pruning_backs_off(spark):
    probes = [(i, t) for i, t in enumerate(REF)] + [
        (100, "the cat sat on the rug near a door")
    ]
    _check(spark, REF, probes, min_count=2)


@pytest.mark.parametrize("n", [1, 2, 4])
def test_other_orders(spark, n):
    probes = [(1, REF[0]), (2, "the zebra sat near a qwerty door")]
    _check(spark, REF, probes, n=n)


def test_save_load_roundtrip(spark, tmp_path):
    model, got = _run_spark(spark, REF, [(1, REF[1])])
    model.save(str(tmp_path / "lm"))
    loaded = NgramLM.load(spark, str(tmp_path / "lm"))
    assert (loaded.n, loaded.alpha, loaded.n_tokens, loaded.vocab_size) == (
        model.n,
        model.alpha,
        model.n_tokens,
        model.vocab_size,
    )
    probe = spark.createDataFrame([(1, REF[1])], "doc_id long, text string")
    r2 = {
        r["doc_id"]: (r["n_scored_grams"], r["avg_logprob"], r["perplexity"], r["scored"])
        for r in score_perplexity(probe, "doc_id", "text", loaded).collect()
    }
    assert r2 == got


def test_partition_invariance(spark):
    train_df = spark.createDataFrame([(t,) for t in REF * 5], "text string")
    probe_rows = [(i, REF[i % 4]) for i in range(40)]
    a_model = train_ngram_lm(train_df, "text")
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    a = sorted(map(tuple, score_perplexity(probe, "doc_id", "text", a_model).collect()))
    b_model = train_ngram_lm(train_df.repartition(13), "text")
    b = sorted(
        map(
            tuple,
            score_perplexity(
                probe.repartition(7, "doc_id"), "doc_id", "text", b_model
            ).collect(),
        )
    )
    assert a == b


def test_composes_into_curate_with_own_drop_reason(spark):
    """curate(perplexity_model=..., max_perplexity=...) drops
    high-perplexity docs with drop_reason='perplexity' — distinct from
    the heuristic and classifier reasons — while short unscorable docs
    stay owned by the length gate."""
    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    gibberish = "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj"
    rows = [
        (1, REF[0]),
        (2, REF[1]),
        (3, gibberish),
        (4, "tiny"),  # length gate, NOT perplexity
    ]
    probe = spark.createDataFrame(rows, "doc_id long, text string")
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in score_perplexity(probe, "doc_id", "text", model).collect()
        if r["scored"]
    }
    thresh = (max(ppl[1], ppl[2]) + ppl[3]) / 2
    audit = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in curate(
            probe,
            "doc_id",
            "text",
            perplexity_model=model,
            max_perplexity=thresh,
        ).collect()
    }
    assert audit[1] == (True, None) and audit[2] == (True, None)
    assert audit[3] == (False, "perplexity")
    assert audit[4] == (False, "low_quality")

    with pytest.raises(ValueError):
        curate(probe, "doc_id", "text", perplexity_model=model)


def test_incremental_curate_equivalence_with_gate(spark):
    """curate_incremental with the perplexity gate stays row-for-row
    equivalent to the batch operator over the union (same fixed model on
    every append — the caller-owned-state contract)."""
    from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
    from youtube_analytics_lakehouse_databricks_spark.operators.curation_incremental import (
        curate_incremental,
    )

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    gib = "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj"
    corpus = [(1, REF[0]), (2, gib), (3, REF[2])]
    batch = [(10, REF[1]), (11, gib + " kk ll"), (12, REF[0])]  # 12: exact dup of 1
    params = dict(perplexity_model=model, max_perplexity=100.0)

    def _df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    full = sorted(map(tuple, curate(_df(corpus + batch), "doc_id", "text", **params).collect()))
    _, st = curate_incremental(_df(corpus), "doc_id", "text", **params)
    inc, _ = curate_incremental(_df(batch), "doc_id", "text", state=st, **params)
    assert sorted(map(tuple, inc.collect())) == full
    reasons = {t[0]: t[2] for t in full}
    assert reasons[2] == "perplexity" and reasons[11] == "perplexity"
    assert reasons[12] == "exact_duplicate"


def test_no_python_udfs_in_plans(spark):
    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    probe = spark.createDataFrame([(1, REF[0])], "doc_id long, text string")
    for df in [*model.orders, score_perplexity(probe, "doc_id", "text", model)]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_score_joins_key_on_hashes_not_strings(spark):
    """The n per-order left joins must key on the 128-bit double-xxhash64
    of (ctx, w) — longs on the wire — never on gram strings: with a model
    too big to broadcast, string keys would shuffle up-to-(n-1)-token
    contexts per probe gram (r8 VERDICT #3; the substring_dedup key
    scheme applied here)."""
    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    probe = spark.createDataFrame([(1, REF[0])], "doc_id long, text string")
    plan = (
        score_perplexity(probe, "doc_id", "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # physical format: SortMergeJoin [keys...], [keys...], LeftOuter
    # (or BroadcastHashJoin ... LeftOuter when AQE broadcasts the model)
    conds = re.findall(r"Join \[([^\]]*)\], \[([^\]]*)\], LeftOuter", plan)
    # exactly the n order joins: the former (n+1)-th doc re-attach join
    # was replaced by the explode_outer sentinel row in r16 (the restore
    # join was the plan's only SortMergeJoin at production sizes)
    assert len(conds) == model.n, plan
    hash_joins = 0
    for left, right in conds:
        if "doc_id" in left:
            continue  # the final per-doc metric re-attach
        assert "__h1_" in left and "__h2_" in left, (left, right)
        assert "__b1_" in right and "__b2_" in right, (left, right)
        # every key is a long attribute (#<id>L), never a gram string
        assert all(k.strip().split("#")[-1].endswith("L") for k in left.split(",")), left
        hash_joins += 1
    assert hash_joins == model.n, plan


def test_perplexity_buckets_head_middle_tail(spark):
    from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import perplexity_buckets

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    probe = spark.createDataFrame(
        [
            (1, REF[0]),  # in-domain: lowest perplexity
            (2, "the cat sat on the rug while a dog ran to the door"),
            (3, "zx qv wq jj kk pp zz xx yy vv bb nn mm"),  # gibberish
            (4, "too short"),  # unscorable -> NULL bucket
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(probe, "doc_id", "text", model).collect()
    }
    assert rows[1] == "head" and rows[3] == "tail" and rows[4] is None
    assert rows[2] in ("head", "middle")  # in-domain-ish, never the tail
    order = {"head": 0, "middle": 1, "tail": 2}
    assert order[rows[1]] <= order[rows[2]] < order[rows[3]]


def test_mixture_by_perplexity_closes_the_loop(spark):
    """CCNet end-state: the quality buckets feed mixture_sample as
    domains — weighting only the head keeps exactly the head docs."""
    from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import (
        mixture_by_perplexity,
        perplexity_buckets,
    )

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    # 30 docs: 10 in-domain clones (head-ish), 10 shuffled-vocab, 10 gibberish
    rows = []
    for i in range(10):
        rows.append((i, REF[i % 4]))
        rows.append((100 + i, "cat dog mat rug door the a sat ran slept near on to while and"))
        rows.append((200 + i, f"zx{i} qv wq jj kk pp zz xx yy vv bb nn mm"))
    probe = spark.createDataFrame(rows, "doc_id long, text string")
    buckets = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(probe, "doc_id", "text", model).collect()
    }
    head_ids = {i for i, b in buckets.items() if b == "head"}
    assert head_ids  # terciles over 30 scored docs: head is non-empty
    got = {
        r["doc_id"]
        for r in mixture_by_perplexity(
            probe, "doc_id", "text", model, weights={"head": 1.0}, seed=0
        ).collect()
    }
    assert got == head_ids


def test_perplexity_buckets_partition_invariant(spark):
    """Bucket cutoffs come from one percentile_approx sketch; at test
    sizes (below the sketch's compression threshold) the quantiles are
    exact, so bucket assignment must not depend on input partitioning.
    (At corpus scale the sketch may wobble docs sitting exactly on a
    cutoff between adjacent buckets — inherent to any sketched quantile,
    and harmless to the mixture downstream.)"""
    from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import perplexity_buckets

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    rows = []
    for i in range(20):
        rows.append((i, REF[i % 4]))
        rows.append((100 + i, f"the cat dog ran sat mat v{i} rug door slept near"))
        rows.append((200 + i, f"zz{i} qq ww ee rr tt yy uu ii oo pp"))
    probe = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(probe, "doc_id", "text", model).collect()
    }
    b = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(
            probe.repartition(17, "doc_id"), "doc_id", "text", model
        ).collect()
    }
    assert a == b


def test_tercile_path_scores_once(spark):
    """The scoring subtree (corpus explode + n hash joins + per-doc agg)
    must execute ONCE in the tercile path: `scored` has two consumers
    (cutoff collect + output join) and, composed with mixture_sample,
    `bucketed` has two more — without the lazy lineage cuts the corpus
    would be re-scored up to four times (r9 VERDICT hygiene item). The
    cuts truncate lineage, so the RETURNED plan must read checkpoint
    blocks (ExistingRDD) and contain NONE of the scoring lineage."""
    from youtube_analytics_lakehouse_databricks_spark.operators.lm_quality import (
        mixture_by_perplexity,
        perplexity_buckets,
    )

    train_df = spark.createDataFrame([(t,) for t in REF], "text string")
    model = train_ngram_lm(train_df, "text")
    rows = [(i, REF[i % 4]) for i in range(12)]
    probe = spark.createDataFrame(rows, "doc_id long, text string")

    def optimized(df) -> str:
        return df._jdf.queryExecution().optimizedPlan().toString()

    plan = optimized(perplexity_buckets(probe, "doc_id", "text", model))
    # one join only (doc re-attach against the checkpointed scored frame)
    assert plan.count("Join") == 1, plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
    # no scoring lineage below the cut: no gram explode, no hash keys
    assert "xxhash64" not in plan and "explode" not in plan.lower(), plan

    plan = optimized(
        mixture_by_perplexity(
            probe, "doc_id", "text", model, weights={"head": 1.0}, seed=0
        )
    )
    # everything upstream of the bucketed cut is blocks; the only
    # remaining corpus work is mixture_sample's own Lehmer draw (its
    # xxhash64(doc_id, seed) is the sampler, not scoring lineage)
    assert "LeftOuter" not in plan, plan  # the n scoring joins are gone
    assert "percentile" not in plan and "explode" not in plan.lower(), plan
    assert "__h1_" not in plan and "__b1_" not in plan, plan  # no gram keys
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
