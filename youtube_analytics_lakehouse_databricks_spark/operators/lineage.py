"""Lineage cuts with an explicit durability choice.

Iterative and multi-consumer operators (``connected_components``,
``curate``) must truncate lineage: without a cut, every downstream
consumer re-executes the full upstream chain (narrow chains get no
exchange reuse), and iterative plans grow without bound. The fast cut is
``localCheckpoint`` — but its blocks live ONLY on executors. On a real
cluster with spot/preemptible nodes or dynamic allocation, losing an
executor after the cut loses blocks that, with lineage truncated,
CANNOT be recomputed — the job dies. That is fine on a single-node
local[] session (executor loss == driver loss anyway) and fatal on a
1000-executor fleet running for hours.

``cut(df, durable=True)`` swaps in reliable ``DataFrame.checkpoint()``
against the session's configured checkpoint directory (HDFS/S3/DBFS):
blocks are written to fault-tolerant storage and survive any executor
loss, at the cost of one write+read through the checkpoint store per
cut. Production guidance: local/dev and single-node runs use the
default (fast) path; long cluster jobs on preemptible capacity call
``setCheckpointDir`` once and pass ``durable=True``.

Both paths return a DataFrame with identical rows and schema — the
choice changes the failure domain, never the result (equivalence is
pinned by tests/test_curation.py::test_curate_durable_mode_identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut(df: DataFrame, *, durable: bool = False, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage.

    durable=False: ``localCheckpoint`` — executor-memory/disk blocks,
    fast, NOT executor-loss-safe.
    durable=True: reliable ``checkpoint`` — requires
    ``spark.sparkContext.setCheckpointDir(...)`` (raises ValueError with
    that instruction if unset), survives executor loss.
    """
    if durable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "durable lineage cut requires a reliable checkpoint "
                "directory: call spark.sparkContext.setCheckpointDir("
                "'<fault-tolerant path, e.g. hdfs://... or s3://...>') "
                "before running with durable=True"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
