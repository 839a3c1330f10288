"""BPE tokenizer (operators/tokenizer.py).

Training is pinned against an independent naive reference (pair-count
loop re-implemented here from the published algorithm), encoding against
the classic Sennrich merge behavior, and the distributed apply against
driver-side encoding of every doc. Round-trip: concatenating a word's
tokens (minus the end marker) reconstructs the word.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.tokenizer import (
    EOW,
    BPEModel,
    bpe_tokenize,
    train_bpe,
    word_counts,
)


def naive_train(counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab = {w: list(w) + [EOW] for w in counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + counts[w]
                )
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        for syms in vocab.values():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _df_from_counts(spark, counts):
    rows = []
    i = 0
    for w, n in counts.items():
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts_exact(spark):
    df = spark.createDataFrame(
        [(1, "Low, low LOW!"), (2, "newest low")], "doc_id long, text string"
    )
    got = {r["word"]: r["n"] for r in word_counts(df, "doc_id", "text").collect()}
    assert got == {"low": 4, "newest": 1}


def test_training_matches_naive_reference(spark):
    df = _df_from_counts(spark, SENNRICH)
    model = train_bpe(df, "doc_id", "text", n_merges=10)
    assert model.merges == naive_train(SENNRICH, 10)
    # the classic example learns 'est</w>' early from newest+widest
    joined = ["".join(p) for p in model.merges]
    assert any(m == f"est{EOW}" or m == "est" for m in joined)


def test_training_matches_naive_on_random_corpus(spark):
    rng = random.Random(3)
    words = ["".join(rng.choice("abcdef") for _ in range(rng.randint(2, 7))) for _ in range(60)]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + rng.randint(1, 9)
    df = _df_from_counts(spark, counts)
    model = train_bpe(df, "doc_id", "text", n_merges=40)
    assert model.merges == naive_train(counts, 40)


def test_encode_roundtrip_and_determinism(spark):
    df = _df_from_counts(spark, SENNRICH)
    model = train_bpe(df, "doc_id", "text", n_merges=10)
    for w in list(SENNRICH) + ["lowest", "wider", "newlow", "zzz"]:
        toks = model.encode_word(w)
        assert "".join(toks).replace(EOW, "") == w
        assert toks == model.encode_word(w)


def test_distributed_apply_matches_driver(spark):
    rng = random.Random(5)
    vocab = ["low", "lower", "newest", "widest", "wide", "new", "est", "lowest"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    model = train_bpe(df, "doc_id", "text", n_merges=25)
    out = bpe_tokenize(df, "doc_id", "text", model, with_tokens=True)
    got = {r["doc_id"]: (r["n_tokens"], r["tokens"]) for r in out.collect()}
    assert set(got) == {d for d, _ in docs}
    for doc_id, text in docs:
        want = model.encode(text)
        assert got[doc_id] == (len(want), want), doc_id
    # partition invariance
    out2 = bpe_tokenize(df.repartition(13), "doc_id", "text", model)
    got2 = {r["doc_id"]: r["n_tokens"] for r in out2.collect()}
    assert got2 == {d: n for d, (n, _) in got.items()}


def test_save_load_roundtrip(spark, tmp_path):
    df = _df_from_counts(spark, SENNRICH)
    model = train_bpe(df, "doc_id", "text", n_merges=10)
    p = str(tmp_path / "bpe")
    model.save(spark, p)
    loaded = BPEModel.load(spark, p)
    assert loaded.merges == model.merges
    assert loaded.known == model.known
    # the training vocab table round-trips in order (r12 — consumers
    # like bpe_training_tables must not re-scan the corpus after a load)
    assert loaded.vocab == model.vocab and model.vocab is not None


def test_counts_feed_packing(spark):
    from youtube_analytics_lakehouse_databricks_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "newest widest low " * (i % 5 + 1)) for i in range(50)],
        "doc_id long, text string",
    )
    model = train_bpe(df, "doc_id", "text", n_merges=20)
    counted = bpe_tokenize(df, "doc_id", "text", model)
    packed = pack_sequences(counted, "doc_id", "n_tokens", capacity=64)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == set(range(50))
    by_seq: dict[str, int] = {}
    for r in rows:
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["n_tokens"]
    assert all(v <= 64 for v in by_seq.values())


def test_known_table_matches_greedy_reencoding(spark):
    """The precomputed train-time encodings (model.known) must equal what
    the greedy merge loop produces for the same words — the dict-hit fast
    path may never change a single token."""
    from youtube_analytics_lakehouse_databricks_spark.operators.tokenizer import _encode_word

    rng = random.Random(9)
    words = ["".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 9))) for _ in range(80)]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + rng.randint(1, 6)
    df = _df_from_counts(spark, counts)
    model = train_bpe(df, "doc_id", "text", n_merges=60)
    assert model.known is not None and set(model.known) == set(counts)
    ranks = model.ranks
    for w, toks in model.known.items():
        assert list(toks) == _encode_word(w, ranks), w
