"""stream_index_health + clear_stale_markers (r16; r15 VERDICT asks
#3 and #5).

The streamed sibling of test_ivf_index.py::test_index_health_matrix:
one call returns the ``(check, ok, observed, remediation)`` matrix for
a ``batch_id=K/cell=J`` layout — fragmentation measured against the
replay horizon, age-aware fold locks, pending folds, and the companion
pca_stream moments artifact — and the named remediations drive a sick
fixture back to green. clear_stale_markers is the checked replacement
for the runbook's two manual ``rm`` steps: it deletes only markers
older than the threshold, refuses outright while any marker is fresh,
and reports what it removed.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import clear_stale_markers
from youtube_analytics_lakehouse_databricks_spark.streaming.ann_stream import (
    bootstrap_ann_stream_index,
    compact_ann_stream,
    ingest_ann_batch,
    stream_index_health,
)

N, D = 120, 8


def _df(spark, n=N, d=D, start=0, seed=3):
    r = np.random.default_rng(seed)
    x = r.standard_normal((n, d))
    return spark.createDataFrame(
        [(start + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def _streamed_index(spark, tmp_path, n_batches=3, batch_rows=30):
    path = str(tmp_path / "sidx")
    bootstrap_ann_stream_index(
        _df(spark), "vec_id", "embedding", path, n_cells=4, kmeans_iters=2
    )
    for b in range(n_batches):
        ingest_ann_batch(
            _df(spark, n=batch_rows, start=10_000 + b * batch_rows, seed=50 + b),
            b, "vec_id", "embedding", path,
        )
    return path


def _rows(df):
    return {r["check"]: r for r in df.collect()}


def _backdate(p, seconds=7200):
    t = time.time() - seconds
    os.utime(p, (t, t))


def test_stream_health_green_then_sick_then_remediated(spark, tmp_path):
    path = _streamed_index(spark, tmp_path, n_batches=3)
    healthy = _rows(stream_index_health(spark, path))
    assert set(healthy) == {
        "pending_fold", "fold_lock", "batch_fragmentation",
        "replay_horizon", "moments_artifact",
    }
    assert all(r["ok"] for r in healthy.values()), healthy
    assert "not audited" in healthy["moments_artifact"]["observed"]

    # sick: 9 more batches (11 foldable vs budget 4), a PRESENT stage
    # dir, and a STALE fold lock
    for b in range(3, 12):
        ingest_ann_batch(
            _df(spark, n=10, start=20_000 + b * 10, seed=80 + b),
            b, "vec_id", "embedding", path,
        )
    os.makedirs(f"{path}/corpus/.compact_tmp", exist_ok=True)
    lock = f"{path}/corpus/.compact_lock"
    with open(lock, "w") as fh:
        fh.write("soak:dead")
    _backdate(lock)

    sick = _rows(stream_index_health(spark, path, max_foldable_batches=4))
    assert not sick["pending_fold"]["ok"]
    assert "compact_ann_stream" in sick["pending_fold"]["remediation"]
    assert not sick["fold_lock"]["ok"]
    assert "clear_stale_markers" in sick["fold_lock"]["remediation"]
    assert not sick["batch_fragmentation"]["ok"]
    assert "compact_ann_stream" in sick["batch_fragmentation"]["remediation"]
    assert sick["replay_horizon"]["ok"]  # batches exist: informational

    # a FRESH lock is a legitimately-running fold, not a finding
    os.utime(lock)
    assert _rows(stream_index_health(spark, path, max_foldable_batches=4))[
        "fold_lock"
    ]["ok"]
    _backdate(lock)

    # remediate exactly as the rows say: clear the stale lock, discard
    # the stage litter via the fold itself, fold the old batches
    cleared = clear_stale_markers(spark, path).collect()
    assert [(r["marker"], r["kind"]) for r in cleared] == [
        (lock, "fold_lock")
    ]
    assert not os.path.exists(lock)
    assert compact_ann_stream(spark, path, keep_last=2) > 0
    after = _rows(stream_index_health(spark, path, max_foldable_batches=4))
    assert all(r["ok"] for r in after.values()), after


def test_stream_health_named_refusals(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import build_ivf_index

    with pytest.raises(ValueError, match="no corpus"):
        stream_index_health(spark, str(tmp_path / "nope"))
    batch = str(tmp_path / "batchidx")
    build_ivf_index(
        _df(spark), "vec_id", "embedding", batch, n_cells=4, kmeans_iters=2
    )
    with pytest.raises(ValueError, match="BATCH-BUILT.*index_health"):
        stream_index_health(spark, batch)


def test_stream_health_empty_corpus_flags_replay_horizon(spark, tmp_path):
    path = _streamed_index(spark, tmp_path, n_batches=1)
    # an existing corpus whose only batch dir is removed: ingested once,
    # then manually wiped — searches would serve empty
    import shutil

    shutil.rmtree(f"{path}/corpus/batch_id=0")
    rows = _rows(stream_index_health(spark, path))
    assert not rows["replay_horizon"]["ok"]
    assert "never ingested" in rows["replay_horizon"]["observed"]


def test_stream_health_moments_artifact(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.streaming.pca_stream import (
        compact_streamed_moments,
        ingest_moments_batch,
    )

    path = _streamed_index(spark, tmp_path, n_batches=2)
    mdir = str(tmp_path / "moments")
    for bid in range(8):
        ingest_moments_batch(
            _df(spark, n=12, start=bid * 12, seed=60 + bid),
            bid, "embedding", mdir,
        )
    rows = _rows(stream_index_health(spark, path, moments_dir=mdir))
    assert rows["moments_artifact"]["ok"]
    assert rows["moments_fold_lock"]["ok"]

    # fold, then recreate a folded partition: the detector reads it as
    # GC-pending (ok, informational — loads already skip it)
    assert compact_streamed_moments(spark, mdir, keep_latest=3) == 5
    ingest_moments_batch(_df(spark, n=12, start=12, seed=61), 1, "embedding", mdir)
    rows = _rows(stream_index_health(spark, path, moments_dir=mdir))
    assert rows["moments_artifact"]["ok"]
    assert "1 folded partition(s) awaiting GC" in rows["moments_artifact"]["observed"]
    assert "compact_streamed_moments" in rows["moments_artifact"]["remediation"]

    # a SECOND covers marker at a non-oldest id is the double-count
    # corruption the fold lock exists to prevent — ok goes false
    (
        spark.createDataFrame(
            [("covers", 0, [4.0])], "kind string, idx int, vals array<double>"
        )
        .withColumn("batch_id", F.lit(5).cast("long"))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(mdir)
    )
    rows = _rows(stream_index_health(spark, path, moments_dir=mdir))
    assert not rows["moments_artifact"]["ok"]
    assert "covers markers" in rows["moments_artifact"]["observed"]

    # a stale lock under the MOMENTS dir flags on its own row and
    # clears through clear_stale_markers pointed AT the moments dir
    lock = f"{mdir}/.compact_lock"
    with open(lock, "w") as fh:
        fh.write("dead")
    _backdate(lock)
    rows = _rows(stream_index_health(spark, path, moments_dir=mdir))
    assert not rows["moments_fold_lock"]["ok"]
    cleared = clear_stale_markers(spark, mdir).collect()
    assert [r["kind"] for r in cleared] == ["fold_lock"]
    assert not os.path.exists(lock)


def test_clear_stale_markers_contract(spark, tmp_path):
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        build_ivf_index,
        index_health,
    )

    with pytest.raises(ValueError, match="does not exist"):
        clear_stale_markers(spark, str(tmp_path / "missing"))

    path = str(tmp_path / "bidx")
    build_ivf_index(
        _df(spark), "vec_id", "embedding", path, n_cells=4, kmeans_iters=2
    )
    # nothing to clear: empty report
    assert clear_stale_markers(spark, path).collect() == []

    sentinel = f"{path}/corpus/.append_inprogress_deadbeef"
    lock = f"{path}/corpus/.compact_lock"
    for p in (sentinel, lock):
        with open(p, "w") as fh:
            fh.write("crashed")

    # FRESH markers: refuse the whole call, delete nothing
    with pytest.raises(ValueError, match="younger than.*LIVE"):
        clear_stale_markers(spark, path)
    assert os.path.exists(sentinel) and os.path.exists(lock)

    # one stale + one fresh still refuses (live concurrency in flight)
    _backdate(sentinel)
    with pytest.raises(ValueError, match="younger than"):
        clear_stale_markers(spark, path)
    assert os.path.exists(sentinel)

    # both stale: cleared, reported with kinds and ages, and the
    # index_health rows the markers were blocking go green
    _backdate(lock)
    report = sorted(
        (r["marker"], r["kind"], r["age_sec"])
        for r in clear_stale_markers(spark, path).collect()
    )
    assert [(m, k) for m, k, _ in report] == [
        (sentinel, "append_sentinel"), (lock, "fold_lock"),
    ]
    assert all(a > 3600 for _m, _k, a in report)
    assert not os.path.exists(sentinel) and not os.path.exists(lock)
    health = {r["check"]: r for r in index_health(spark, path).collect()}
    assert health["append_sentinels"]["ok"] and health["fold_lock"]["ok"]
    # and index_health's stale remediation names this helper
    with open(sentinel, "w") as fh:
        fh.write("crashed")
    _backdate(sentinel)
    health = {r["check"]: r for r in index_health(spark, path).collect()}
    assert "clear_stale_markers" in health["append_sentinels"]["remediation"]
    clear_stale_markers(spark, path)


def test_compactions_take_over_stranded_lock(spark, tmp_path):
    """r16: lock_takeover_after= automates the stale-lock remediation
    for scheduled maintenance — a fold blocked by a stranded (backdated)
    lock succeeds when the threshold passes, refuses while fresh."""
    path = _streamed_index(spark, tmp_path, n_batches=6)
    lock = f"{path}/corpus/.compact_lock"
    with open(lock, "w") as fh:
        fh.write("dead:process")
    _backdate(lock)
    with pytest.raises(ValueError, match="another fold holds the lock"):
        compact_ann_stream(spark, path, keep_last=2)
    assert compact_ann_stream(spark, path, keep_last=2, lock_takeover_after=3600) > 0
    assert not os.path.exists(lock)  # released after the fold

    # batch sibling: same knob on compact_ivf_index
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
    )

    bpath = str(tmp_path / "bidx2")
    build_ivf_index(
        _df(spark), "vec_id", "embedding", bpath, n_cells=4, kmeans_iters=2
    )
    append_ivf_index(
        _df(spark, n=20, start=5_000, seed=9), "vec_id", "embedding", bpath
    )
    block = f"{bpath}/corpus/.compact_lock"
    with open(block, "w") as fh:
        fh.write("dead:process")
    _backdate(block)
    with pytest.raises(ValueError, match="another fold holds the lock"):
        compact_ivf_index(spark, bpath)
    assert compact_ivf_index(spark, bpath, lock_takeover_after=3600) > 0
    assert not os.path.exists(block)
