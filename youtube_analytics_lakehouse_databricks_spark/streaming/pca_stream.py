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

__all__ = ["ingest_moments_batch", "pca_moments_stream", "load_streamed_moments"]


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


def load_streamed_moments(spark: SparkSession, moments_dir: str) -> PCAMoments:
    """Merge every batch's partial into one PCAMoments (batch_id order,
    so the float summation order is deterministic across reloads). Feed
    the result to ``operators.pca.solve_pca`` for the current model."""
    rows = spark.read.parquet(moments_dir).collect()
    if not rows:
        raise ValueError(f"no moment partials under {moments_dir}")
    by_batch: dict[int, list] = {}
    for r in rows:
        by_batch.setdefault(int(r["batch_id"]), []).append(r)
    merged: PCAMoments | None = None
    for bid in sorted(by_batch):
        by = _arrays_from_kinded(by_batch[bid])
        m = PCAMoments(n=int(by["meta"][0]), s=by["s"], o=by["o"])
        merged = m if merged is None else merged.merge(m)
    return merged
