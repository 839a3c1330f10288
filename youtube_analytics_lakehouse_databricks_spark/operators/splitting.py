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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO63 = float(1 << 63)


def leakage_safe_split(
    audit: DataFrame,
    id_col: str,
    *,
    val_frac: float,
    seed: int = 0,
    include_dropped: bool = False,
) -> DataFrame:
    """(id, cluster_root, split): 'train' | 'validation' per doc.

    ``audit`` is curate()'s output (needs ``keep``, ``drop_reason``,
    ``duplicate_of``). By default only kept docs are assigned (the
    dropped ones aren't part of any dataset); ``include_dropped=True``
    also labels duplicates with their cluster's side — useful for
    auditing what WOULD have leaked.
    """
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    pool = audit if include_dropped else audit.filter(F.col("keep"))
    root = F.coalesce("duplicate_of", F.col(id_col))
    u = (
        F.xxhash64(root, F.lit(int(seed))).cast("double") / F.lit(_TWO63) + F.lit(1.0)
    ) / F.lit(2.0)
    return pool.select(
        id_col,
        root.alias("cluster_root"),
        F.when(u < F.lit(float(val_frac)), F.lit("validation"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
