"""Streaming ANN index ingestion (streaming/ann_stream.py).

Contracts: streamed ingestion equals a one-write encode against the same
frozen state (both flat and compressed layouts); a replayed micro-batch
replaces exactly its own partitions (no double-count); cell-pruned
search works unchanged over the streamed layout (plan-asserted); a real
readStream run lands every row exactly once.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
    ivf_search,
    ivfpq_search,
)
from youtube_analytics_lakehouse_databricks_spark.streaming.ann_stream import (
    ann_index_stream,
    bootstrap_ann_stream_index,
    ingest_ann_batch,
)

N, D = 300, 16


def _planted(n=N, d=D, seed=13):
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.standard_normal((d, d)))
    scales = np.array([8.0, 5.0, 3.0, 2.0] + [0.4] * (d - 4))
    return r.standard_normal((n, d)) @ (q * scales).T


def _df(spark, X, start=0):
    return spark.createDataFrame(
        [(start + i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def _res(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("compressed", [False, True])
def test_streamed_equals_one_write_and_replay_is_exactly_once(
    spark, tmp_path, compressed
):
    X = _planted()
    df = _df(spark, X)
    path = str(tmp_path / ("pq" if compressed else "flat"))
    bootstrap_ann_stream_index(
        df, "vec_id", "embedding", path,
        compressed=compressed, n_cells=8, kmeans_iters=3,
        m=8, n_codes=64, pq_iters=5,
    )
    # three micro-batches cover the corpus
    chunks = [(0, 100), (100, 200), (200, N)]
    for bid, (lo, hi) in enumerate(chunks):
        ingest_ann_batch(
            df.filter(f"vec_id >= {lo} AND vec_id < {hi}"),
            bid, "vec_id", "embedding", path,
        )

    search = ivfpq_search if compressed else ivf_search
    got = _res(
        search(spark, path, df, "vec_id", "embedding",
               n_probe=2, k=5, exclude_self=True)
    )

    # reference: the same frozen state, corpus encoded in ONE write
    ref = str(tmp_path / "ref")
    bootstrap_ann_stream_index(
        df, "vec_id", "embedding", ref,
        compressed=compressed, n_cells=8, kmeans_iters=3,
        m=8, n_codes=64, pq_iters=5,
    )
    ingest_ann_batch(df, 0, "vec_id", "embedding", ref)
    want = _res(
        search(spark, ref, df, "vec_id", "embedding",
               n_probe=2, k=5, exclude_self=True)
    )
    assert got == want and len(got) == N * 5

    # crash replay: re-ingesting batch 1 replaces exactly its own
    # partitions — row multiset unchanged, search unchanged
    corpus_dir = f"{path}/{'corpus_pq' if compressed else 'corpus'}"
    before = _res(spark.read.parquet(corpus_dir).select("vec_id", "cell", "batch_id"))
    ingest_ann_batch(
        df.filter("vec_id >= 100 AND vec_id < 200"), 1, "vec_id", "embedding", path
    )
    after = _res(spark.read.parquet(corpus_dir).select("vec_id", "cell", "batch_id"))
    assert before == after
    assert got == _res(
        search(spark, path, df, "vec_id", "embedding",
               n_probe=2, k=5, exclude_self=True)
    )


def test_streamed_layout_keeps_cell_pruning(spark, tmp_path):
    """batch_id leads the directory layout but cell is still a partition
    column — the search scan's PartitionFilters prune by probed cell
    across every batch directory."""
    X = _planted()
    df = _df(spark, X)
    path = str(tmp_path / "pruned")
    bootstrap_ann_stream_index(
        df, "vec_id", "embedding", path, n_cells=8, kmeans_iters=3
    )
    for bid in range(3):
        ingest_ann_batch(
            df.filter(f"vec_id % 3 = {bid}"), bid, "vec_id", "embedding", path
        )
    out = ivf_search(
        spark, path, df.filter("vec_id < 2"), "vec_id", "embedding",
        n_probe=2, k=3,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cell#" in line and " IN (" in line, line
    assert len(out.collect()) > 0


def test_real_readstream_ingestion(spark, tmp_path):
    """End to end through Structured Streaming: a file-source stream of
    embedding batches lands every vector exactly once and the index
    serves them."""
    X = _planted(n=120)
    df = _df(spark, X)
    path = str(tmp_path / "stream")
    bootstrap_ann_stream_index(
        df, "vec_id", "embedding", path, n_cells=4, kmeans_iters=2
    )
    src = str(tmp_path / "src")
    for bid, (lo, hi) in enumerate([(0, 60), (60, 120)]):
        df.filter(f"vec_id >= {lo} AND vec_id < {hi}").write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = ann_index_stream(
        stream, "vec_id", "embedding", path, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stored = spark.read.parquet(f"{path}/corpus")
    assert stored.count() == 120
    assert stored.select("vec_id").distinct().count() == 120
    hits = ivf_search(
        spark, path, df.filter("vec_id < 3"), "vec_id", "embedding",
        n_probe=2, k=5, exclude_self=True,
    )
    assert len(hits.collect()) == 15


def test_batch_append_into_streamed_layout_raises(spark, tmp_path):
    """Batch appends write cell=J at the top level; mixing that into a
    streamed batch_id=K/cell=J corpus would break parquet partition
    discovery on the next read — the append guard names the right tool
    instead."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import append_ivf_index

    X = _planted(n=60)
    df = _df(spark, X)
    path = str(tmp_path / "guarded")
    bootstrap_ann_stream_index(df, "vec_id", "embedding", path,
                               n_cells=4, kmeans_iters=2)
    ingest_ann_batch(df, 0, "vec_id", "embedding", path)
    with pytest.raises(ValueError, match="STREAMED index layout"):
        append_ivf_index(df, "vec_id", "embedding", path)


def test_compaction_folds_old_batches_value_stable(spark, tmp_path):
    """compact_ann_stream folds batches older than the replay horizon
    into one consolidated partition: the corpus row multiset (ignoring
    batch_id) and every search result are unchanged, directory count
    drops, a second call is a no-op, an interrupted GC (crash after the
    completion marker, folded dirs still present) is finished by the
    next call, and ingest continues against the compacted layout."""
    import json
    import os
    import shutil

    from youtube_analytics_lakehouse_databricks_spark.streaming.ann_stream import compact_ann_stream

    X = _planted(n=240)
    df = _df(spark, X)
    path = str(tmp_path / "compact")
    bootstrap_ann_stream_index(df, "vec_id", "embedding", path,
                               n_cells=4, kmeans_iters=2)
    for bid in range(6):
        ingest_ann_batch(df.filter(f"vec_id % 6 = {bid}"), bid,
                         "vec_id", "embedding", path)
    corpus_dir = f"{path}/corpus"

    def rows():
        return _res(spark.read.parquet(corpus_dir).select("vec_id", "cell"))

    def batch_dirs():
        return sorted(e for e in os.listdir(corpus_dir) if e.startswith("batch_id="))

    def search():
        return _res(ivf_search(spark, path, df, "vec_id", "embedding",
                               n_probe=2, k=5, exclude_self=True))

    before_rows, before_search = rows(), search()
    assert len(batch_dirs()) == 6
    assert compact_ann_stream(spark, path, keep_last=2) == 4
    assert batch_dirs() == ["batch_id=0", "batch_id=4", "batch_id=5"]
    assert rows() == before_rows
    assert search() == before_search
    # idempotent at the horizon
    assert compact_ann_stream(spark, path, keep_last=2) == 0
    assert not os.path.exists(f"{corpus_dir}/.compact_lock")  # released

    # fold-vs-fold lock: a held lock refuses (named) — a concurrent
    # fold's recovery re-applying the committed manifest mid-swap would
    # delete the consolidated partition (the fold list contains target)
    with open(f"{corpus_dir}/.compact_lock", "w") as f:
        f.write("compact_ann_stream")
    with pytest.raises(ValueError, match="another fold holds the lock"):
        compact_ann_stream(spark, path, keep_last=2)
    os.remove(f"{corpus_dir}/.compact_lock")

    # interrupted GC: recreate the committed-fold crash state (marker +
    # manifest + staged partition present, folded dirs NOT yet deleted)
    tmp = f"{corpus_dir}/.compact_tmp"
    staged_src = f"{corpus_dir}/batch_id=0"
    os.makedirs(tmp)
    shutil.copytree(staged_src, f"{tmp}/batch_id=0")
    with open(f"{tmp}/_MANIFEST", "w") as f:
        json.dump({"fold": [0], "target": 0}, f)
    with open(f"{tmp}/_COMPLETE", "w") as f:
        f.write("ok")
    assert compact_ann_stream(spark, path, keep_last=2) == 1  # recovery pass
    assert not os.path.isdir(tmp)
    assert rows() == before_rows and search() == before_search

    # the OTHER crash window: marker + manifest present but the staged
    # partition already RENAMED into place (crash between the rename and
    # the tmp cleanup) — recovery must only clean up, never delete the
    # consolidated partition it has nothing to restore from
    os.makedirs(tmp)
    with open(f"{tmp}/_MANIFEST", "w") as f:
        json.dump({"fold": [0], "target": 0}, f)
    with open(f"{tmp}/_COMPLETE", "w") as f:
        f.write("ok")
    assert compact_ann_stream(spark, path, keep_last=2) == 1
    assert not os.path.isdir(tmp)
    assert os.path.isdir(f"{corpus_dir}/batch_id=0")  # survived
    assert rows() == before_rows and search() == before_search

    # replay-horizon guard + continued ingest
    with pytest.raises(ValueError, match="keep_last must be >= 2"):
        compact_ann_stream(spark, path, keep_last=1)
    ingest_ann_batch(_df(spark, _planted(n=10, seed=91), start=900), 6,
                     "vec_id", "embedding", path)
    assert spark.read.parquet(corpus_dir).count() == 250


def test_streamed_ingest_into_batch_built_index_raises(spark, tmp_path):
    """The inverse of the batch-append guard: streaming micro-batches
    into a batch-built index (top-level cell=J dirs) would leave
    conflicting directory structures — refused before any data lands."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import build_ivf_index

    X = _planted(n=60)
    df = _df(spark, X)
    path = str(tmp_path / "batchbuilt")
    build_ivf_index(df, "vec_id", "embedding", path, n_cells=4, kmeans_iters=2)
    with pytest.raises(ValueError, match="BATCH-BUILT index layout"):
        ingest_ann_batch(df, 0, "vec_id", "embedding", path)


def test_compaction_during_live_stream_with_replay_across_fold(spark, tmp_path):
    """The docstring's concurrency contract, pinned live: compaction runs
    against a RUNNING ann_index_stream (new batch ids are never touched),
    ingest continues into the compacted layout, and a FORCED replay
    across the fold boundary (checkpoint commit marker deleted, stream
    restarted — Structured Streaming reprocesses its frontier batch)
    stays exactly-once because keep_last >= 2 keeps every replayable
    batch out of the fold. Search parity against a one-write encode of
    the same frozen state holds at every step."""
    import os

    from youtube_analytics_lakehouse_databricks_spark.streaming.ann_stream import compact_ann_stream

    X = _planted(n=320, seed=29)
    df = _df(spark, X)
    path = str(tmp_path / "live")
    bootstrap_ann_stream_index(df, "vec_id", "embedding", path,
                               n_cells=4, kmeans_iters=2)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    corpus_dir = f"{path}/corpus"

    def feed(lo, hi):
        df.filter(f"vec_id >= {lo} AND vec_id < {hi}").write.mode(
            "append"
        ).parquet(src)

    def batch_dirs():
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(corpus_dir)
            if e.startswith("batch_id=")
        )

    def rows():
        return _res(spark.read.parquet(corpus_dir).select("vec_id", "cell"))

    def search():
        return _res(ivf_search(spark, path, df.filter("vec_id < 5"),
                               "vec_id", "embedding", n_probe=2, k=5,
                               exclude_self=True))

    feed(0, 240)  # first epoch drains everything available at start
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = ann_index_stream(stream, "vec_id", "embedding", path, ckpt)
    try:
        q.processAllAvailable()
        for lo in range(240, 280, 10):  # four more single-file feeds
            feed(lo, lo + 10)
            q.processAllAvailable()
        # five non-empty feeds = five batch dirs. Epoch NUMBERS are the
        # stream's business, not this test's: Structured Streaming may
        # interleave an empty epoch (it commits but writes no dir), so
        # dirs can be non-contiguous — assert structure, not ids.
        dirs5 = batch_dirs()
        assert len(dirs5) == 5, dirs5

        # compact WHILE the query is live: all but the last 2 fold into
        # the oldest folded id
        assert compact_ann_stream(spark, path, keep_last=2) == 3
        after_fold = [dirs5[0]] + dirs5[3:]
        assert batch_dirs() == after_fold
        mid_rows, mid_search = rows(), search()

        # ingest continues against the compacted layout: exactly one
        # NEW batch dir, strictly beyond the old tail
        feed(280, 320)
        q.processAllAvailable()
        new_ids = sorted(set(batch_dirs()) - set(after_fold))
        assert len(new_ids) == 1 and new_ids[0] > after_fold[-1], batch_dirs()
        tail = new_ids[0]
        assert batch_dirs() == after_fold + [tail]
    finally:
        q.stop()

    # one-write reference over the same frozen state
    ref = str(tmp_path / "ref")
    bootstrap_ann_stream_index(df, "vec_id", "embedding", ref,
                               n_cells=4, kmeans_iters=2)
    ingest_ann_batch(df, 0, "vec_id", "embedding", ref)
    want = _res(ivf_search(spark, ref, df.filter("vec_id < 5"),
                           "vec_id", "embedding", n_probe=2, k=5,
                           exclude_self=True))
    full_rows, full_search = rows(), search()
    assert full_search == want
    assert len(mid_rows) == 280 and len(full_rows) == 320

    # forced replay ACROSS the fold boundary: mark the frontier epoch
    # uncommitted and restart — Structured Streaming reprocesses it; the
    # dynamic partition overwrite replaces exactly the frontier batch,
    # and the folded batches (protected by keep_last >= 2) are never
    # re-entered
    frontier = max(int(f) for f in os.listdir(f"{ckpt}/commits") if f.isdigit())
    os.remove(f"{ckpt}/commits/{frontier}")
    if os.path.exists(f"{ckpt}/commits/.{frontier}.crc"):
        os.remove(f"{ckpt}/commits/.{frontier}.crc")  # checksum sidecar
    q2 = ann_index_stream(
        spark.readStream.schema(df.schema).parquet(src),
        "vec_id", "embedding", path, ckpt,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert batch_dirs() == after_fold + [tail]
    assert rows() == full_rows and search() == full_search

    # and the horizon advances: a later compaction folds up to the new
    # tail (the replayed frontier stays out of the fold)
    assert compact_ann_stream(spark, path, keep_last=2) == 2
    assert batch_dirs() == [after_fold[0]] + [after_fold[-1], tail]
    assert rows() == full_rows and search() == full_search


def test_distributed_search_and_cell_stats_over_streamed_layout(spark, tmp_path):
    """The corpus-sized serving paths work unchanged over the streamed
    batch_id=K/cell=J layout: ivf_search_distributed (salted and not)
    matches ivf_search on the same streamed index, and ivf_cell_stats
    sniffs the layout and accounts for every streamed row."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        ivf_cell_stats,
        ivf_search_distributed,
    )

    X = _planted(n=180, seed=43)
    df = _df(spark, X)
    path = str(tmp_path / "sdist")
    bootstrap_ann_stream_index(df, "vec_id", "embedding", path,
                               n_cells=4, kmeans_iters=2)
    for bid in range(3):
        ingest_ann_batch(df.filter(f"vec_id % 3 = {bid}"), bid,
                         "vec_id", "embedding", path)
    queries = _df(spark, _planted(n=30, seed=44))
    want = _res(ivf_search(spark, path, queries, "vec_id", "embedding",
                           n_probe=2, k=5))
    for ns in (1, 3):
        got = _res(
            ivf_search_distributed(
                spark, path, queries, "vec_id", "embedding",
                n_probe=2, k=5, n_salt=ns,
            )
        )
        assert got == want, ns
    stats = ivf_cell_stats(spark, path).collect()
    assert sum(r["n_rows"] for r in stats) == 180
    assert abs(sum(r["frac"] for r in stats) - 1.0) < 1e-9


def test_compaction_on_compressed_streamed_layout(spark, tmp_path):
    """compact_ann_stream sniffs the corpus_pq layout: folding a
    compressed streamed index keeps the code-row multiset and every
    ivfpq_search result value-stable."""
    import os

    from youtube_analytics_lakehouse_databricks_spark.streaming.ann_stream import compact_ann_stream

    X = _planted(n=200, seed=59)
    df = _df(spark, X)
    path = str(tmp_path / "pqcompact")
    bootstrap_ann_stream_index(
        df, "vec_id", "embedding", path,
        compressed=True, n_cells=4, kmeans_iters=2, m=8, n_codes=32, pq_iters=3,
    )
    for bid in range(5):
        ingest_ann_batch(df.filter(f"vec_id % 5 = {bid}"), bid,
                         "vec_id", "embedding", path)
    corpus_dir = f"{path}/corpus_pq"

    def rows():
        return _res(
            spark.read.parquet(corpus_dir).select("vec_id", "cell", "codes")
        )

    def search():
        return _res(ivfpq_search(spark, path, df.filter("vec_id < 5"),
                                 "vec_id", "embedding", n_probe=2, k=5,
                                 exclude_self=True))

    before_rows, before_search = rows(), search()
    assert compact_ann_stream(spark, path, keep_last=2) == 3
    dirs = sorted(e for e in os.listdir(corpus_dir) if e.startswith("batch_id="))
    assert dirs == ["batch_id=0", "batch_id=3", "batch_id=4"]
    assert rows() == before_rows
    assert search() == before_search
