"""Streaming PCA moments: readStream -> foreachBatch partial moments ->
merged model on demand.

The production shape for the embedding-compression pre-step when the
corpus ARRIVES as a stream: each micro-batch contributes its additive
``PCAMoments`` partial (one shuffle-free Arrow pass over the batch —
``operators.pca.compute_moments``), and the fitted model is solved on
demand from the merged partials. The stored corpus is never re-read;
model freshness costs one pass over the newest batch only.

Exactly-once under crash replay, the engine's audit-log pattern
(streaming/curation_stream.py): each micro-batch writes its OWN moment
partial under a ``batch_id=K/`` partition with dynamic partition
overwrite — a replayed batch recomputes the same rows and replaces
exactly its own partition, so the merged total never double-counts and
partitions other batches wrote are never touched. There is NO running
total on disk to corrupt: the merge happens at read time over the
per-batch partials (tiny — one (d + d^2 + 1)-double row set per batch),
summed in batch_id order so the float summation order is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from youtube_analytics_lakehouse_databricks_spark.operators.pca import (
    PCAMoments,
    _arrays_from_kinded,
    _kinded_rows,
    compute_moments,
)

__all__ = [
    "ingest_moments_batch",
    "pca_moments_stream",
    "load_streamed_moments",
    "compact_streamed_moments",
]


def ingest_moments_batch(
    batch: DataFrame, batch_id: int, vec_col: str, moments_dir: str
) -> None:
    """foreachBatch body: compute the batch's moment partial and write it
    under its own batch_id partition (dynamic overwrite = replay-safe).
    Empty micro-batches write nothing."""
    if batch.isEmpty():
        return
    m = compute_moments(batch, vec_col)
    rows = _kinded_rows({"meta": [float(m.n)], "s": m.s, "o": m.o})
    spark = batch.sparkSession
    (
        spark.createDataFrame(rows, "kind string, idx int, vals array<double>")
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(moments_dir)
    )


def pca_moments_stream(
    spark: SparkSession,
    landing_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    moments_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """File-source stream of (id, embedding) JSON-lines rows -> per-batch
    moment partials. ``available_now=True`` drains the landing dir and
    stops (deterministic for tests); otherwise runs continuously."""
    docs = spark.readStream.schema(f"{id_col} long, {vec_col} array<float>").json(
        landing_dir
    )
    writer = docs.writeStream.foreachBatch(
        lambda b, bid: ingest_moments_batch(b, bid, vec_col, moments_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_streamed_moments(
    spark: SparkSession,
    moments_dir: str,
    *,
    keep_latest: int = 16,
    lock_takeover_after: float | None = None,
) -> int:
    """Merge every batch partition OLDER than the newest ``keep_latest``
    into one consolidated partial; returns how many partitions were
    folded (0 = nothing to do).

    Without compaction a long-running stream accumulates one
    ~(d^2 + d + 1)-double partition per micro-batch forever (8 MB/batch
    at d=1024 — a week of 1-minute batches is ~80 GB), and
    ``load_streamed_moments`` collects every partition to the driver.
    The moments are ADDITIVE by design, so the old partials fold into
    one row set losslessly; it lands under the OLDEST compacted
    batch_id, so the batch_id-ordered reload keeps a deterministic float
    summation order across compactions of the same prefix.

    Replay safety: foreachBatch replays happen at the checkpoint
    FRONTIER (the newest, possibly-uncommitted batch) — never at ids a
    committed checkpoint already covers — so only recent partitions need
    to stay individually replaceable. ``keep_latest`` >= 1 suffices for
    structured streaming's replay contract; the default 16 is headroom
    for checkpoint rollbacks done by hand.

    Crash safety: fsops' ADD-FIRST GC discipline (the same protocol as
    compact_audit_log, with the in-data ``covers`` marker playing the
    dominance role latest-wins plays there) — the consolidated partial
    lands FIRST (under the oldest compacted batch_id, with a ``covers``
    marker naming the highest batch it folded), and only then are the
    folded partitions deleted — pure garbage collection, because
    ``load_streamed_moments`` skips any unmarked partition at or below
    the marker. A crash between the two steps therefore never
    double-counts; re-running compaction finishes the GC. Folds exclude
    EACH OTHER via ``fsops.maintenance_lock`` (r15): the moments are
    ADDITIVE, so this is the artifact where concurrent folds corrupt
    VALUES, not just layout — interleaved with each other's deletes,
    a surviving ``covers`` row can cover batches whose rows the other
    fold already folded in, double-counting them on the next load."""
    if keep_latest < 1:
        raise ValueError(f"keep_latest must be >= 1, got {keep_latest}")
    from youtube_analytics_lakehouse_databricks_spark.fsops import DriverFS, maintenance_lock

    # fold-vs-fold exclusion (fsops.maintenance_lock): the moments are
    # ADDITIVE, so this artifact is the one where concurrent folds can
    # corrupt VALUES, not just layout — both compute a merged partial
    # over the same old set and dynamic-overwrite the oldest partition
    # with their `covers` row; interleaved with the other's deletes,
    # the surviving marker can cover batches whose rows the other fold
    # already folded in, double-counting them on the next load
    fs = DriverFS(spark, moments_dir, "compact_streamed_moments")
    with maintenance_lock(
        fs, moments_dir, "compact_streamed_moments",
        takeover_stale_after=lock_takeover_after,
    ) as confirm:
        return _compact_streamed_moments_locked(
            spark, fs, moments_dir, keep_latest, confirm
        )


def _compact_streamed_moments_locked(
    spark: SparkSession, fs, moments_dir: str, keep_latest: int, lock_confirm
) -> int:
    rows = spark.read.parquet(moments_dir).collect()
    ids = sorted({int(r["batch_id"]) for r in rows})
    old = ids[:-keep_latest]
    if len(old) < 2:
        return 0
    oldset = set(old)
    by_batch: dict[int, list] = {}
    for r in rows:
        bid = int(r["batch_id"])
        if bid in oldset:
            by_batch.setdefault(bid, []).append(r)
    merged: PCAMoments | None = None
    already_covered = -1
    for bid in sorted(by_batch):
        by = _arrays_from_kinded(by_batch[bid])
        if "covers" in by:  # a prior consolidation (always the oldest id)
            already_covered = int(by["covers"][0])
        elif bid <= already_covered:
            continue  # folded by the prior consolidation; GC pending
        m = PCAMoments(n=int(by["meta"][0]), s=by["s"], o=by["o"])
        merged = m if merged is None else merged.merge(m)
    # the new horizon can never RETREAT below a prior consolidation's:
    # a shrunken marker would re-admit still-on-disk folded partitions
    # in (new, old] on the next load (double count)
    out = _kinded_rows(
        {
            "meta": [float(merged.n)],
            "s": merged.s,
            "o": merged.o,
            "covers": [float(max(old[-1], already_covered))],
        }
    )
    # re-verify lock ownership before each destructive step: the covers
    # overwrite (a racer's interleaved covers row is the double-count
    # hazard) and the GC deletes
    lock_confirm()
    (
        spark.createDataFrame(out, "kind string, idx int, vals array<double>")
        .withColumn("batch_id", F.lit(int(old[0])).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(moments_dir)
    )
    lock_confirm()
    for bid in old[1:]:
        fs.delete(f"{moments_dir}/batch_id={bid}")
    return len(old)


def load_streamed_moments(spark: SparkSession, moments_dir: str) -> PCAMoments:
    """Merge every batch's partial into one PCAMoments (batch_id order,
    so the float summation order is deterministic across reloads). Feed
    the result to ``operators.pca.solve_pca`` for the current model.

    Honors ``compact_streamed_moments``' consolidation marker: an
    unmarked partition at or below a consolidated partial's ``covers``
    batch is already folded into it (its deletion is garbage collection
    that may not have completed) and is skipped, never double-counted."""
    rows = spark.read.parquet(moments_dir).collect()
    if not rows:
        raise ValueError(f"no moment partials under {moments_dir}")
    by_batch: dict[int, list] = {}
    for r in rows:
        by_batch.setdefault(int(r["batch_id"]), []).append(r)
    arrays = {bid: _arrays_from_kinded(by_batch[bid]) for bid in by_batch}
    covered = max(
        (int(by["covers"][0]) for by in arrays.values() if "covers" in by),
        default=-1,
    )
    merged: PCAMoments | None = None
    for bid in sorted(arrays):
        by = arrays[bid]
        if "covers" not in by and bid <= covered:
            continue
        m = PCAMoments(n=int(by["meta"][0]), s=by["s"], o=by["o"])
        merged = m if merged is None else merged.merge(m)
    return merged
