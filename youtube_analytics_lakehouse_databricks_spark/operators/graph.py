"""Graph operators over edge DataFrames.

connected_components: iterative deterministic min-label propagation —
the missing last step of a near-duplicate pipeline (candidate pairs ->
verified pairs -> CLUSTERS -> one canonical doc per cluster).

Scale design: each round is one join + one aggregation shuffled on the
node key; rounds needed = graph diameter (near-dup clusters are tiny and
dense, so 2-4 rounds in practice; the alternating large-star/small-star
scheme from the MapReduce CC literature bounds it at O(log n) for
adversarial chains). Lineage is truncated every round with an eager
localCheckpoint so the plan does not grow with iterations — the standard
Spark idiom for iterative algorithms (GraphX/Pregel does the same).
Convergence detection rides along in the label projection itself (an
``improved`` flag column), so the per-round existence check is a LIMIT 1
scan of the already-materialized checkpoint — no extra join or shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.lineage import cut


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25, *,
    durable: bool = False,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    MINIMUM node id reachable from the node (deterministic canonical
    label, engine-portable). Edges are treated as undirected.

    ``durable=True`` makes the per-round lineage cuts executor-loss-safe
    (reliable checkpoint against the session's checkpoint dir) — use it
    on clusters with preemptible nodes; see operators.lineage."""
    sym = cut(
        edges.select(F.col(src).alias("nbr"), F.col(dst).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("nbr"), F.col(src).alias("node")))
        .distinct(),
        durable=durable,
        eager=True,  # edge lineage (often an expensive
        # dedup pipeline) is materialized ONCE, not once per round
    )
    # node set comes off the CHECKPOINTED symmetric edges (identical set:
    # sym holds both directions), not off raw ``edges`` — deriving it from
    # edges would re-execute the full upstream lineage a second time
    nodes = sym.select("node").distinct()
    labels = nodes.select("node", F.col("node").alias("component"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("nbr"), "component"), "nbr")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        # the improved flag is computed in the SAME projection the
        # checkpoint materializes (new < old ⟺ nbr_min < old), so the
        # convergence probe below reads checkpointed rows with a pushed
        # LIMIT — no join against the previous labels, no extra shuffle
        new_labels = cut(
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nbr_min", "component")).alias(
                    "component"
                ),
                (F.coalesce("nbr_min", "component") < F.col("component")).alias(
                    "improved"
                ),
            ),
            durable=durable,
            eager=True,
        )
        improved = new_labels.filter("improved").limit(1).count()
        labels = new_labels.drop("improved")
        if improved == 0:
            break
    return labels
