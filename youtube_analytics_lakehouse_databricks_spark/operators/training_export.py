"""End-to-end training-data assembly: the composition a pretraining run
actually executes, wired so each stage feeds the next without a wasted
exchange.

    clean (redact / paragraph-dedup)        narrow rewrites, lineage-cut
      -> curate()                           audited keep/drop verdicts
      -> mixture_sample()                   domain reweighting, no shuffle
      -> shuffle_shards()                   ONE exchange: the epoch permutation
      -> pack_sequences()                   partition-local, rides the shard
                                            partitioning — zero extra shuffle
      -> parquet shard=K/ export            task row order = epoch order

The stage ORDER is the design: packing runs AFTER the shard shuffle, so
each shard packs exactly the docs a loader will stream from it, inside
the partitions the shard exchange already produced — shuffle-then-pack
costs no exchange beyond the permutation itself, which is the floor for
a global random order. Text transforms run BEFORE curate() (with the
corresponding curate flags off) so the exported text IS the text that
was audited — exporting raw text after a redacted audit would leak the
PII the audit claims was scrubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators import dedup as dedup_ops
from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops
from youtube_analytics_lakehouse_databricks_spark.operators.curation import curate
from youtube_analytics_lakehouse_databricks_spark.operators.lineage import cut
from youtube_analytics_lakehouse_databricks_spark.operators.mixing import mixture_sample
from youtube_analytics_lakehouse_databricks_spark.operators.packing import pack_sequences
from youtube_analytics_lakehouse_databricks_spark.operators.sharding import (
    KEY_COL,
    SHARD_COL,
    assign_shards,
)

N_TOKENS_EXPR = "size(filter(split({text}, ' '), x -> x <> ''))"


def prepare_training_data(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    out_path: str,
    *,
    n_shards: int,
    seed: int = 0,
    redact: bool = False,
    paragraph_dedup: bool = False,
    domain_col: str | None = None,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    target_rows: int | None = None,
    capacity: int | None = 2048,
    curate_kwargs: dict | None = None,
    durable: bool = False,
) -> dict:
    """Run the full assembly; write ``out_path``/shard=K/ parquet; return
    a stats dict (docs in/kept/exported, shards, sequences, mean fill).

    The audit frame is ALSO written (``out_path``/_audit) — the export
    is only trustworthy next to the record of what was dropped and why.
    Mixing applies when ``domain_col`` plus one of ``alpha``/``weights``
    is given; packing when ``capacity`` is not None.
    """
    # 1. text transforms FIRST, flags off in curate (see module doc)
    cleaned = docs.select(id_col, text_col, *([domain_col] if domain_col else []))
    if redact:
        red = text_ops.redact_pii(cleaned, id_col, text_col).select(
            id_col, F.col("redacted_text").alias(text_col)
        )
        cleaned = (
            red
            if domain_col is None
            else red.join(cleaned.select(id_col, domain_col), id_col)
        )
        cleaned = cut(cleaned, durable=durable)
    if paragraph_dedup:
        pd_df = dedup_ops.paragraph_dedup(cleaned, id_col, text_col).select(
            id_col, F.col("text_deduped").alias(text_col)
        )
        cleaned = (
            pd_df
            if domain_col is None
            else pd_df.join(cleaned.select(id_col, domain_col), id_col)
        )
        cleaned = cut(cleaned, durable=durable)

    # 2. audited curation over the EXACT text being exported
    audit = curate(
        cleaned,
        id_col,
        text_col,
        durable=durable,
        **(curate_kwargs or {}),
    )
    audit = cut(audit, durable=durable)
    kept = cleaned.join(
        audit.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )

    # 3. optional domain reweighting (adds `copy`; 0 when off)
    if domain_col is not None and (alpha is not None or weights is not None):
        mixed = mixture_sample(
            kept,
            domain_col,
            id_col,
            alpha=alpha,
            weights=weights,
            target_rows=target_rows,
            seed=seed,
            allow_upsample=True,
        )
    else:
        mixed = kept.withColumn("copy", F.lit(0))

    # 4. the epoch permutation: ONE exchange. The shard key hashes
    # (id, copy) so upsampled copies of a doc scatter independently.
    keyed = mixed.withColumn(
        "__export_id", F.concat_ws("#", F.col(id_col).cast("string"), "copy")
    )
    arranged = (
        assign_shards(keyed, "__export_id", n_shards=n_shards, seed=seed)
        .repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(SHARD_COL, KEY_COL, "__export_id")
    )

    # 5. partition-local packing INSIDE the shard partitions (no new
    # exchange); text and shard ride through as carry columns
    out_cols = [id_col, "copy", text_col, SHARD_COL]
    if capacity is not None:
        packed = pack_sequences(
            arranged.withColumn(
                "n_tokens_", F.expr(N_TOKENS_EXPR.format(text=text_col))
            ),
            "__export_id",
            "n_tokens_",
            capacity=capacity,
            carry=tuple([id_col, "copy", text_col, SHARD_COL, KEY_COL]),
        )
        export = packed.select(
            *out_cols, "n_tokens", "seq_id", "seq_fill", "is_oversize", KEY_COL
        )
    else:
        export = arranged.select(*out_cols, KEY_COL)

    # 6. export: partitionBy keeps each shard's rows in task order; the
    # sort key column is written too so a reader can re-derive the epoch
    # order after a file-level split
    export.write.mode("overwrite").partitionBy(SHARD_COL).parquet(out_path)
    audit.write.mode("overwrite").parquet(f"{out_path}/_audit")

    spark = docs.sparkSession
    written = spark.read.parquet(out_path)
    stats = {
        "input_docs": docs.count(),
        "kept_docs": kept.count(),
        "exported_rows": written.count(),
        "n_shards": written.select(SHARD_COL).distinct().count(),
    }
    if capacity is not None:
        seqs = written.groupBy(SHARD_COL, "seq_id").agg(
            F.first("seq_fill").alias("fill")
        )
        stats["n_sequences"] = seqs.count()
        stats["mean_seq_fill"] = round(
            seqs.agg(F.avg("fill")).collect()[0][0] or 0.0, 4
        )
    return stats
