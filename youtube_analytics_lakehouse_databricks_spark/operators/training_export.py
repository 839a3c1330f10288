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
    epochs: int = 1,
    redact: bool = False,
    paragraph_dedup: bool = False,
    substring_dedup: bool = False,
    substring_min_tokens: int = 50,
    domain_col: str | None = None,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    target_rows: int | None = None,
    chunk_max_tokens: int | None = None,
    chunk_overlap: int = 0,
    capacity: int | None = 2048,
    val_frac: float | None = None,
    split_seed: int = 0,
    curate_kwargs: dict | None = None,
    durable: bool = False,
) -> dict:
    """Run the full assembly; write ``out_path``/shard=K/ parquet; return
    a stats dict (docs in/kept/exported, shards, sequences, mean fill).

    The audit frame is ALSO written (``out_path``/_audit) — the export
    is only trustworthy next to the record of what was dropped and why.
    Mixing applies when ``domain_col`` plus one of ``alpha``/``weights``
    is given; packing when ``capacity`` is not None.

    ``val_frac``: thread a leakage-safe train/validation split through
    the export — every row carries a ``split`` column assigned at
    DUPLICATE-CLUSTER granularity (operators.splitting over the audit's
    final cluster roots), so no near-dup cluster ever straddles
    train/val in the exported shards. ``split_seed`` is independent of
    the epoch seed: re-shuffling epochs must never move a cluster
    across the split.

    ``epochs``: write N epoch trees (``out_path``/epoch=E/shard=K/),
    each a different deterministic permutation (epoch seed = ``seed`` +
    E) of the SAME curated+mixed corpus — the curation chain and the
    mixing draw run ONCE (the mixed frame is lineage-cut before the
    per-epoch loop), and each epoch pays only its own single
    permutation exchange + packing + write. With ``epochs=1`` the
    layout is ``out_path``/shard=K/ (no epoch directory), unchanged
    from earlier versions.

    Stats semantics with ``epochs`` > 1: ``exported_rows`` and
    ``n_sequences`` are TOTALS across all epoch trees (epochs x the
    per-epoch count — the row count of reading ``out_path``
    recursively); ``rows_per_epoch`` reports the per-epoch corpus size.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    # 1. text transforms FIRST, flags off in curate (see module doc).
    # Carry columns ride every rewrite: the mixing domain, and (when
    # curate_kwargs enables the semantic gate) the embedding column it
    # re-joins by id — embeddings are audit-side inputs and are NEVER
    # exported (out_cols below excludes them).
    sem_vec = (curate_kwargs or {}).get("semantic_vec_col")
    sdec_vec = (curate_kwargs or {}).get("semantic_decontam_vec_col")
    carry = [
        c for c in dict.fromkeys((domain_col, sem_vec, sdec_vec)) if c is not None
    ]
    cleaned = docs.select(id_col, text_col, *carry)

    def _recarry(rewritten: DataFrame, prev: DataFrame) -> DataFrame:
        return (
            rewritten
            if not carry
            else rewritten.join(prev.select(id_col, *carry), id_col)
        )

    if redact:
        cleaned = cut(
            _recarry(
                text_ops.redact_pii(cleaned, id_col, text_col).select(
                    id_col, F.col("redacted_text").alias(text_col)
                ),
                cleaned,
            ),
            durable=durable,
        )
    if paragraph_dedup:
        cleaned = cut(
            _recarry(
                dedup_ops.paragraph_dedup(cleaned, id_col, text_col).select(
                    id_col, F.col("text_deduped").alias(text_col)
                ),
                cleaned,
            ),
            durable=durable,
        )
    if substring_dedup:
        # ExactSubstr rewrite (Lee et al. 2021) after boilerplate removal:
        # duplicated >= substring_min_tokens-token runs survive only at
        # their first corpus occurrence. Same transform-first contract as
        # the paragraph stage — curate() then audits the exact text being
        # exported (drained docs drop as low_quality there).
        cleaned = cut(
            _recarry(
                dedup_ops.substring_dedup(
                    cleaned, id_col, text_col, min_tokens=substring_min_tokens
                ).select(id_col, F.col("text_deduped").alias(text_col)),
                cleaned,
            ),
            durable=durable,
        )

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

    # 3b. optional leakage-safe split: the side rides every exported row,
    # assigned on the audit's final cluster roots (cluster-granular, so
    # no duplicate cluster straddles train/val in the export). Keyed by
    # ``split_seed``, NOT the epoch seed: re-permuting epochs must never
    # move a cluster across the split.
    if val_frac is not None:
        from youtube_analytics_lakehouse_databricks_spark.operators.splitting import leakage_safe_split

        sides = leakage_safe_split(audit, id_col, val_frac=val_frac, seed=split_seed)
        mixed = mixed.join(sides.select(id_col, "split"), id_col)

    # 3c. optional fixed-window chunking (the complement of packing's
    # is_oversize contract): every kept doc splits into
    # <= chunk_max_tokens-token windows with chunk_overlap carry-over,
    # so with chunk_max_tokens <= capacity the packed export has NO
    # oversize singletons. Chunks are computed once per distinct doc
    # (upsampled copies inherit them through the join) and scatter
    # independently across shards (chunk_idx joins the export key).
    # The audit stays DOC-level — curation verdicts are about documents;
    # chunk provenance is (id, chunk_idx) on every exported row.
    if chunk_max_tokens is not None:
        from youtube_analytics_lakehouse_databricks_spark.operators.packing import chunk_documents

        ch = chunk_documents(
            mixed.select(id_col, text_col).dropDuplicates([id_col]),
            id_col,
            text_col,
            max_tokens=chunk_max_tokens,
            overlap=chunk_overlap,
        ).select(
            id_col, "chunk_idx", F.col("text_chunk").alias(text_col)
        )
        mixed = mixed.drop(text_col).join(ch, id_col)

    # curation + mixing run ONCE across epochs: this cut materializes the
    # mixed frame, so each epoch's tree pays only its own permutation
    # exchange + packing + write against the cached blocks, never a
    # re-execution of the curation chain (pinned by the N-epoch test).
    mixed = cut(mixed, durable=durable)

    split_cols = ["split"] if val_frac is not None else []
    chunk_cols = ["chunk_idx"] if chunk_max_tokens is not None else []

    def _write_epoch(epoch_seed: int, path: str) -> None:
        # 4. the epoch permutation: ONE exchange. The shard key hashes
        # (id, copy[, chunk_idx]) so upsampled copies — and chunks of
        # one doc — scatter independently.
        keyed = mixed.withColumn(
            "__export_id",
            F.concat_ws(
                "#", F.col(id_col).cast("string"), "copy", *chunk_cols
            ),
        )
        arranged = (
            assign_shards(keyed, "__export_id", n_shards=n_shards, seed=epoch_seed)
            .repartition(n_shards, SHARD_COL)
            .sortWithinPartitions(SHARD_COL, KEY_COL, "__export_id")
        )

        # 5. partition-local packing INSIDE the shard partitions (no new
        # exchange); text/shard/split ride through as carry columns.
        # group_col=SHARD_COL: repartition(n, shard) hash-partitions the
        # shard VALUE, so one task can hold two shards — packing must
        # never build a sequence spanning them (the partitionBy write
        # below would split it across shard directories).
        out_cols = [id_col, "copy", *chunk_cols, text_col, SHARD_COL, *split_cols]
        if capacity is not None:
            packed = pack_sequences(
                arranged.withColumn(
                    "n_tokens_", F.expr(N_TOKENS_EXPR.format(text=text_col))
                ),
                "__export_id",
                "n_tokens_",
                capacity=capacity,
                carry=tuple(
                    [id_col, "copy", *chunk_cols, text_col, SHARD_COL, KEY_COL, *split_cols]
                ),
                group_col=SHARD_COL,
            )
            export = packed.select(
                *out_cols, "n_tokens", "seq_id", "seq_fill", "is_oversize", KEY_COL
            )
        else:
            export = arranged.select(*out_cols, KEY_COL)

        # 6. export: partitionBy keeps each shard's rows in task order;
        # the sort key column is written too so a reader can re-derive
        # the epoch order after a file-level split
        export.write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)

    if epochs == 1:
        _write_epoch(seed, out_path)
    else:
        for e in range(epochs):
            _write_epoch(seed + e, f"{out_path}/epoch={e}")
    audit.write.mode("overwrite").parquet(f"{out_path}/_audit")

    spark = docs.sparkSession
    written = spark.read.parquet(out_path)
    stats = {
        "input_docs": docs.count(),
        "kept_docs": kept.count(),
        # total across ALL epoch trees (epochs x corpus); see docstring
        "exported_rows": written.count(),
        "n_shards": written.select(SHARD_COL).distinct().count(),
        "epochs": epochs,
    }
    stats["rows_per_epoch"] = stats["exported_rows"] // epochs
    seq_group = [SHARD_COL, "seq_id"] + (["epoch"] if epochs > 1 else [])
    if capacity is not None:
        seqs = written.groupBy(*seq_group).agg(
            F.first("seq_fill").alias("fill")
        )
        stats["n_sequences"] = seqs.count()
        stats["mean_seq_fill"] = round(
            seqs.agg(F.avg("fill")).collect()[0][0] or 0.0, 4
        )
    return stats
