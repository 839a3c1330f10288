"""End-to-end training-data assembly (operators/training_export.py)."""

from __future__ import annotations

import glob
import os
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.training_export import (
    prepare_training_data,
)

BOILER = "Cookie banner text repeated on every page of the site verbatim, accept to continue."
PII = "Contact me at john.doe@example.com for details."


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    words = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(400):
        body = " ".join(rng.choice(words) for _ in range(40))
        text = f"{BOILER}\n\n{body}"
        if i % 7 == 0:
            text += f"\n\n{PII}"
        if i % 13 == 0 and i > 0:
            text = rows[i - 1][1]  # exact duplicate
        rows.append((i, text, f"dom{i % 3}"))
    return spark.createDataFrame(rows, "doc_id long, text string, domain string")


def _shard_rows(path, shard):
    files = sorted(glob.glob(os.path.join(path, f"shard={shard}", "*.parquet")))
    out = []
    for f in files:
        t = pq.read_table(f)
        out.extend(zip(t["doc_id"].to_pylist(), t["copy"].to_pylist(), t["text"].to_pylist()))
    return out


def test_end_to_end(spark, corpus, tmp_path):
    out = str(tmp_path / "export")
    stats = prepare_training_data(
        corpus,
        "doc_id",
        "text",
        out,
        n_shards=4,
        seed=1,
        redact=True,
        paragraph_dedup=True,
        domain_col="domain",
        alpha=0.0,
        capacity=256,
    )
    assert stats["input_docs"] == 400
    assert 0 < stats["kept_docs"] < 400  # dups and drained docs dropped
    assert stats["exported_rows"] > 0
    assert stats["n_shards"] == 4
    assert stats["n_sequences"] > 0 and 0 < stats["mean_seq_fill"] <= 1.5

    df = spark.read.parquet(out)
    # exported text is the AUDITED text: PII scrubbed, boilerplate deduped
    assert df.filter(F.col("text").contains("example.com")).count() == 0
    assert df.filter(F.col("text").contains("Cookie banner")).count() == 1
    # packing bounds hold inside every shard
    over = (
        df.filter(~F.col("is_oversize"))
        .groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    # audit rides along and explains every non-exported doc
    audit = spark.read.parquet(f"{out}/_audit")
    assert audit.count() == 400
    kept_ids = {r["doc_id"] for r in audit.filter("keep").collect()}
    exported_ids = {r["doc_id"] for r in df.select("doc_id").distinct().collect()}
    assert exported_ids <= kept_ids


def test_sequences_never_span_shards(spark, corpus, tmp_path):
    """repartition(n, shard) hash-partitions the shard VALUE, so one
    task can hold two shards; packing must still build per-shard
    sequences (group_col) or the partitionBy write splits a sequence
    across shard directories (round-6 ADVICE, medium)."""
    out = str(tmp_path / "span")
    prepare_training_data(
        corpus, "doc_id", "text", out, n_shards=4, seed=3, capacity=256
    )
    df = spark.read.parquet(out)
    # every sequence lives in exactly one shard directory
    spans = (
        df.groupBy("seq_id")
        .agg(F.countDistinct("shard").alias("n_shards"))
        .filter(F.col("n_shards") > 1)
        .count()
    )
    assert spans == 0
    # the fixture actually exercises the collision: some task packed two
    # shards (seq_id embeds the packing partition as p<pid>g<shard>)
    pid_shards = {}
    for r in df.select("seq_id", "shard").distinct().collect():
        pid = r["seq_id"].split("g")[0]
        pid_shards.setdefault(pid, set()).add(r["shard"])
    assert any(len(s) > 1 for s in pid_shards.values()), pid_shards
    # and per-(shard, seq) packing bounds still hold
    over = (
        df.filter(~F.col("is_oversize"))
        .groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") > 256)
        .count()
    )
    assert over == 0


def test_split_threaded_through_export(spark, corpus, tmp_path):
    """val_frac= stamps every exported row with its cluster-rooted
    train/validation side: the assignment matches leakage_safe_split
    over the audit exactly, and re-seeding the EPOCH permutation never
    moves a doc across the split."""
    from youtube_analytics_lakehouse_databricks_spark.operators.splitting import leakage_safe_split

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    common = dict(n_shards=4, capacity=None, val_frac=0.3, split_seed=9)
    prepare_training_data(corpus, "doc_id", "text", a, seed=1, **common)
    prepare_training_data(corpus, "doc_id", "text", b, seed=2, **common)

    df = spark.read.parquet(a)
    assert set(df.select("split").distinct().toPandas()["split"]) <= {
        "train", "validation"
    }
    audit = spark.read.parquet(f"{a}/_audit")
    want = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(audit, "doc_id", val_frac=0.3, seed=9).collect()
    }
    got = {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}
    assert got == {i: want[i] for i in got}
    frac = sum(1 for s in got.values() if s == "validation") / len(got)
    assert 0.15 < frac < 0.45
    # epoch seed changed, split identical
    got_b = {
        r["doc_id"]: r["split"]
        for r in spark.read.parquet(b).select("doc_id", "split").collect()
    }
    assert got_b == got


def test_multi_epoch_curates_once(spark, corpus, tmp_path):
    """epochs=N writes N distinct deterministic permutations of ONE
    curated+mixed corpus: identical doc sets per epoch, different
    orders, and the curation chain materializes exactly once (counted
    through an accumulator spliced between curate() and its lineage
    cut)."""
    import youtube_analytics_lakehouse_databricks_spark.operators.training_export as te

    acc = spark.sparkContext.accumulator(0)
    real_curate = te.curate

    def counting_curate(docs, id_col, text_col, **kw):
        audit = real_curate(docs, id_col, text_col, **kw)

        def tick(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return audit.mapInPandas(tick, schema=audit.schema)

    te.curate = counting_curate
    try:
        out = str(tmp_path / "epochs")
        stats = prepare_training_data(
            corpus, "doc_id", "text", out, n_shards=4, seed=5, epochs=3,
            capacity=256,
        )
    finally:
        te.curate = real_curate

    assert stats["epochs"] == 3
    # the audit pass ran exactly once for 400 docs — NOT once per epoch
    assert acc.value == 400

    epoch_rows = {
        e: sorted(
            (r["doc_id"], r["copy"])
            for r in spark.read.parquet(f"{out}/epoch={e}").collect()
        )
        for e in range(3)
    }
    epoch_order = {
        e: [
            (r["doc_id"], r["copy"])
            for r in spark.read.parquet(f"{out}/epoch={e}")
            .orderBy("shard", "shuffle_key", "doc_id")
            .collect()
        ]
        for e in range(3)
    }
    # same corpus every epoch, different permutation per epoch
    assert epoch_rows[0] == epoch_rows[1] == epoch_rows[2]
    assert epoch_order[0] != epoch_order[1] != epoch_order[2]
    # epoch seeds nest into the single-epoch layout: epoch=1 here equals
    # a one-epoch export at seed+1
    solo = str(tmp_path / "solo")
    te_stats = prepare_training_data(
        corpus, "doc_id", "text", solo, n_shards=4, seed=6, capacity=256
    )
    assert te_stats["epochs"] == 1
    for s in range(4):
        assert _shard_rows(solo, s) == _shard_rows(f"{out}/epoch=1", s)


def test_deterministic_and_epoch_seeded(spark, corpus, tmp_path):
    a, b, c = (str(tmp_path / n) for n in ("a", "b", "c"))
    common = dict(n_shards=4, paragraph_dedup=True, capacity=256)
    prepare_training_data(corpus, "doc_id", "text", a, seed=5, **common)
    prepare_training_data(
        corpus.repartition(17), "doc_id", "text", b, seed=5, **common
    )
    prepare_training_data(corpus, "doc_id", "text", c, seed=6, **common)
    same = all(_shard_rows(a, s) == _shard_rows(b, s) for s in range(4))
    assert same  # byte-order deterministic across input layouts
    assert any(_shard_rows(a, s) != _shard_rows(c, s) for s in range(4))  # epoch knob


def test_semantic_gate_threaded_through_export(spark, tmp_path):
    """curate_kwargs' semantic gate rides the export: the embedding
    column is carried through the text rewrites into curate()'s audit
    (which re-joins it by id), semantically-folded docs leave the
    exported corpus, and the embedding itself is NEVER exported."""
    import numpy as np

    dim = 12
    dirs = np.random.default_rng(3).standard_normal((2, dim))
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)

    def emb(g, seed, eps=0.15):
        r = np.random.default_rng(seed)
        v = dirs[g] + eps * r.standard_normal(dim)
        return [float(x) for x in v / np.linalg.norm(v)]

    rng = random.Random(5)
    words = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(24):
        body = " ".join(rng.choice(words) for _ in range(30))
        rows.append((i, f"{BOILER}\n\n{body}", emb(i % 2, 70 + i)))
    # doc 20's text is original; its embedding duplicates doc 4's
    rows[20] = (
        20,
        rows[20][1],
        [float(x) for x in np.asarray(rows[4][2]) * 0.999 + 0.0005],
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, emb array<float>")
    out = str(tmp_path / "exp")
    stats = prepare_training_data(
        docs,
        "doc_id",
        "text",
        out,
        n_shards=2,
        paragraph_dedup=True,
        capacity=None,
        curate_kwargs=dict(
            semantic_vec_col="emb",
            semantic_threshold=0.97,
            semantic_centroids=dirs,
        ),
    )
    audit = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/_audit").collect()}
    assert audit[20]["drop_reason"] == "semantic_duplicate"
    assert audit[20]["duplicate_of"] == 4
    exported = spark.read.parquet(out)
    assert "emb" not in exported.columns
    ids = {r["doc_id"] for r in exported.collect()}
    assert 20 not in ids and 4 in ids
    assert stats["kept_docs"] == stats["input_docs"] - 1


def test_chunking_threaded_through_export(spark, tmp_path):
    """chunk_max_tokens splits every kept doc into fixed windows BEFORE
    packing — with chunk_max_tokens <= capacity the export carries no
    oversize singletons, chunks scatter independently across shards, and
    reassembling each doc's chunks in chunk_idx order (dropping the
    overlap) reproduces its token stream."""
    rng = random.Random(9)
    words = [f"w{i}" for i in range(300)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(30, 200))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "exp")
    prepare_training_data(
        docs,
        "doc_id",
        "text",
        out,
        n_shards=4,
        chunk_max_tokens=32,
        chunk_overlap=4,
        capacity=32,
    )
    exported = spark.read.parquet(out)
    assert "chunk_idx" in exported.columns
    got = exported.select("doc_id", "chunk_idx", "text").collect()
    assert not any(
        r["is_oversize"] for r in spark.read.parquet(out).collect()
    )  # every chunk fits the capacity
    by_doc: dict[int, dict[int, str]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["text"]
    audit = {r["doc_id"]: r["keep"] for r in spark.read.parquet(f"{out}/_audit").collect()}
    orig = dict(rows)
    for i, chunks in by_doc.items():
        assert audit[i] is True
        toks = orig[i].split(" ")
        rebuilt = []
        for k in range(len(chunks)):
            ctoks = chunks[k].split(" ")
            assert len(ctoks) <= 32
            rebuilt.extend(ctoks if k == 0 else ctoks[4:])
        assert rebuilt == toks
    # kept docs that were chunked all appear
    assert set(by_doc) == {i for i, keep in audit.items() if keep}
