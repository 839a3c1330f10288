"""Leakage-safe train/validation splitting.

Splitting a corpus doc-by-doc leaks: a near-duplicate pair lands with
one copy in train and one in validation, and the model is graded on
text it effectively saw. The correct unit of assignment is the
DUPLICATE CLUSTER — exactly what `curate()`'s audit frame already
carries (`duplicate_of` points every exact/near duplicate at its
cluster keeper; kept docs are their own keeper).

The split is a deterministic hash-threshold draw on the CLUSTER ROOT id
(xxhash64(root, seed) scaled to [0,1) < frac -> validation), so:

- every member of a cluster lands on the same side, by construction;
- the assignment is a pure function of (root id, seed) — stable across
  runs, partitionings, and corpus growth (a new duplicate of an old
  cluster inherits the old cluster's side, it cannot flip it);
- shrinking/growing ``val_frac`` nests (same threshold-sampling
  property as operators.mixing): a cluster in the 5% validation set is
  still there at 10%.

No closure pass is needed here: `duplicate_of` IS the final cluster
root in curate()'s audit for every dropped doc — near-dup components
resolve transitively, and curate() repoints exact duplicates whose
keeper was itself near-folded through the keeper's component (the
exact->near one-hop chain; pinned by the chained fixtures in
tests/test_curation.py and test_splitting.py). The split is therefore
one scan of the audit frame with a per-row hash draw — no corpus
shuffle.

``draw='lehmer'`` swaps the xxhash64 draw for the Park-Miller step
shared with operators.mixing/sharding — ANSI-SQL-replayable, so DuckDB
recomputes every cluster's side bit-for-bit (the registered
`shard_split_assignment` row). The split decides what the model never
sees; the verification mode puts that decision under cross-engine
evidence. Keep the xxhash64 default for production splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.mixing import (
    require_integral_id,
    unit_draw,
)


def leakage_safe_split(
    audit: DataFrame,
    id_col: str,
    *,
    val_frac: float,
    seed: int = 0,
    include_dropped: bool = False,
    draw: str = "xxhash64",
) -> DataFrame:
    """(id, cluster_root, split): 'train' | 'validation' per doc.

    ``audit`` is curate()'s output (needs ``keep``, ``drop_reason``,
    ``duplicate_of``). By default only kept docs are assigned (the
    dropped ones aren't part of any dataset); ``include_dropped=True``
    also labels duplicates with their cluster's side — useful for
    auditing what WOULD have leaked. ``draw='lehmer'`` is the
    ANSI-replayable verification mode (module docstring).
    """
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    if draw == "lehmer":
        # the draw is over the CLUSTER ROOT = coalesce(duplicate_of, id):
        # both legs must be integral or the BIGINT step nulls out
        require_integral_id(audit, id_col, "leakage_safe_split")
        require_integral_id(audit, "duplicate_of", "leakage_safe_split")
    pool = audit if include_dropped else audit.filter(F.col("keep"))
    root = F.coalesce("duplicate_of", F.col(id_col))
    u = unit_draw(root, seed, draw)
    return pool.select(
        id_col,
        root.alias("cluster_root"),
        F.when(u < F.lit(float(val_frac)), F.lit("validation"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
