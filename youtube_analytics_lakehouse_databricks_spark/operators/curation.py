"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, as ONE operator over any (id, text) DataFrame.

Stage order is the production order, cheapest-first so each stage shrinks
the corpus the next (more expensive) stage sees:

1. quality gate      — per-row array math, no shuffle; drops junk before
                       any hashing happens;
2. exact dedup       — canonical-text hash groupBy (cosmetic variants
                       collide via normalize_text); one narrow shuffle;
3. near-dup dedup    — MinHash signatures -> LSH band candidates (hot
                       buckets capped) -> candidate-restricted Jaccard
                       verify -> connected components -> min-id keeper
                       per cluster; runs on exact-dedup SURVIVORS only,
                       which also removes the identical-doc hot keys LSH
                       would otherwise bucket together.

Output: one row per INPUT doc — (id, keep, drop_reason, duplicate_of).
drop_reason ∈ {low_quality, exact_duplicate, near_duplicate}; and
duplicate_of names the canonical doc a duplicate folded into (NULL for
kept docs and quality drops). Nothing is silently discarded: the frame
IS the audit trail, and `df.filter("keep")` is the curated corpus.

Each stage is the already-tested building block from operators.text /
operators.dedup / operators.graph — this module only owns the
composition and the keep/drop bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators import dedup as dedup_ops
from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops
from youtube_analytics_lakehouse_databricks_spark.operators.graph import connected_components


def curate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.9,
    min_distinct_ratio: float = 0.1,
    shingle_k: int = 3,
    n_hashes: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = dedup_ops.DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """(id, keep, drop_reason, duplicate_of) for every input doc."""
    id_type = dict(docs.dtypes)[id_col]

    # 1. quality gate (cheap, per-row, runs on everything)
    q = text_ops.quality_scores(docs, id_col, text_col)
    low_quality = q.filter(
        (F.col("n_tokens") < min_tokens)
        | (F.col("stopword_ratio") > max_stopword_ratio)
        | (F.col("distinct_ratio") < min_distinct_ratio)
    ).select(id_col)
    good = docs.join(low_quality, id_col, "left_anti")

    # 2. exact dedup on canonical text (min id per hash is the keeper)
    hashed = good.select(
        id_col, F.sha2(text_ops.norm_expr(text_col), 256).alias("__h")
    )
    keepers = hashed.groupBy("__h").agg(F.min(id_col).alias("__keeper"))
    exact_map = hashed.join(keepers, "__h").select(id_col, "__keeper")
    exact_dropped = exact_map.filter(F.col(id_col) != F.col("__keeper"))
    reps = good.join(
        exact_map.filter(F.col(id_col) == F.col("__keeper")).select(id_col),
        id_col,
    )

    # 3. near-dup dedup on the exact representatives
    sets = dedup_ops.shingle_sets(reps, id_col, text_col, k=shingle_k)
    sig = dedup_ops.minhash_signatures(
        dedup_ops.shingles(reps, id_col, text_col, k=shingle_k), id_col, n_hashes
    )
    cand = dedup_ops.lsh_candidates(
        sig, id_col, n_hashes, rows_per_band=rows_per_band, max_bucket_size=max_bucket_size
    )
    pairs = dedup_ops.jaccard_verify_sets(sets, id_col, cand, jaccard_threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    near_dropped = comp.filter(F.col("node") != F.col("component"))

    # assemble the audit frame; stage precedence is the run order
    null_dup = F.lit(None).cast(id_type)
    dropped = (
        low_quality.select(
            id_col,
            F.lit("low_quality").alias("drop_reason"),
            null_dup.alias("duplicate_of"),
        )
        .unionByName(
            exact_dropped.select(
                id_col,
                F.lit("exact_duplicate").alias("drop_reason"),
                F.col("__keeper").alias("duplicate_of"),
            )
        )
        .unionByName(
            near_dropped.select(
                F.col("node").alias(id_col),
                F.lit("near_duplicate").alias("drop_reason"),
                F.col("component").alias("duplicate_of"),
            )
        )
    )
    return (
        docs.select(id_col)
        .join(dropped, id_col, "left")
        .select(
            id_col,
            F.col("drop_reason").isNull().alias("keep"),
            "drop_reason",
            "duplicate_of",
        )
    )
