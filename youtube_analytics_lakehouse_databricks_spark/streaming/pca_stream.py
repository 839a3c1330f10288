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

from youtube_analytics_lakehouse_databricks_spark.operators.pca import PCAMoments, compute_moments

__all__ = ["ingest_moments_batch", "pca_moments_stream", "load_streamed_moments"]


def ingest_moments_batch(
    batch: DataFrame, batch_id: int, vec_col: str, moments_dir: str
) -> None:
    """foreachBatch body: compute the batch's moment partial and write it
    under its own batch_id partition (dynamic overwrite = replay-safe).
    Empty micro-batches write nothing."""
    import numpy as np

    if batch.isEmpty():
        return
    m = compute_moments(batch, vec_col)
    o = np.asarray(m.o)
    rows = [("meta", 0, [float(m.n)]), ("s", 0, [float(x) for x in np.asarray(m.s)])]
    rows += [("o", i, [float(x) for x in o[i]]) for i in range(o.shape[0])]
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
    import numpy as np

    rows = spark.read.parquet(moments_dir).collect()
    if not rows:
        raise ValueError(f"no moment partials under {moments_dir}")
    by_batch: dict[int, dict] = {}
    for r in rows:
        b = by_batch.setdefault(int(r["batch_id"]), {"o": {}})
        if r["kind"] == "meta":
            b["n"] = int(r["vals"][0])
        elif r["kind"] == "s":
            b["s"] = np.asarray(r["vals"])
        else:
            b["o"][r["idx"]] = r["vals"]
    merged: PCAMoments | None = None
    for bid in sorted(by_batch):
        b = by_batch[bid]
        m = PCAMoments(
            n=b["n"],
            s=b["s"],
            o=np.asarray([b["o"][i] for i in sorted(b["o"])]),
        )
        merged = m if merged is None else merged.merge(m)
    return merged
