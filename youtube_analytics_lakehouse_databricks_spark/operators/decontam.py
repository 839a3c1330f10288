"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard LLM training-data hygiene step (the GPT-3 appendix /
PaLM-style 13-gram rule): any training document sharing >= ``min_hits``
distinct k-grams with any eval document is contamination — leaving it in
the corpus inflates benchmark scores without improving the model.

Spark-first shape, designed for the real asymmetry of the problem: the
TRAINING side is the 100 TB corpus, the EVAL side is a handful of
benchmark suites (thousands to low millions of n-grams). So:

- the eval side is reduced to a DISTINCT (gram_hash, eval_id) frame and
  **broadcast** — the training scan never shuffles for the join;
- training-side grams are per-row array ops (tokenize -> k-gram ->
  array_distinct -> explode), no shuffle;
- the only exchange in the whole operator is the final per-training-doc
  aggregation, which is elided entirely when the input is already
  distributed by ``id_col`` (e.g. via queries.read_fanned);
- grams are compared by xxhash64 (JVM-codegen, 8 bytes each) rather than
  by string — the broadcast table stays small and equality is exact up
  to a 2^-64 collision, which only ever *over*-flags.

At a scale where the eval side outgrows a broadcast (it should not — a
benchmark suite that needs a terabyte of n-grams is a corpus, not a
benchmark), pass ``broadcast_eval=False`` to fall back to a shuffle
equi-join on the gram hash.

Both sides are canonicalized with text.norm_expr by default so cosmetic
differences (case, punctuation) do not hide contamination — same
canonicalization contract as operators.curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators import text as text_ops
from youtube_analytics_lakehouse_databricks_spark.operators.dedup import (
    _shingles_from_toks,
    _tokenized,
)

DEFAULT_NGRAM = 13  # the published decontamination n-gram size


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int, keep_empty: bool = False
) -> DataFrame:
    """(id, gram_hash) with per-doc DISTINCT k-grams, hashed JVM-side.
    One narrow projection chain + one explode — no shuffle. With
    ``keep_empty``, docs shorter than k tokens keep one NULL-gram row
    (explode_outer) so a downstream per-doc aggregation covers every
    input doc without a restore join."""
    sets = _tokenized(df, id_col, text_col).select(
        id_col, F.expr(f"array_distinct({_shingles_from_toks(k)})").alias("grams")
    )
    ex = F.explode_outer("grams") if keep_empty else F.explode("grams")
    # xxhash64(NULL) is NOT null (nulls are skipped, yielding the seed
    # hash), so gate it — the NULL row from explode_outer must stay NULL
    # or empty docs would count one phantom gram
    return sets.select(id_col, ex.alias("gram")).select(
        id_col,
        F.when(F.col("gram").isNotNull(), F.xxhash64("gram")).alias("gram_hash"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    k: int = DEFAULT_NGRAM,
    min_hits: int = 1,
    normalize: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """One row per TRAINING doc:

    (id, n_grams, n_hit_grams, contamination_frac, matched_eval_id,
    is_contaminated)

    - n_grams: distinct k-grams in the training doc (0 for docs shorter
      than k tokens — those cannot be flagged and report clean);
    - n_hit_grams: how many of them appear anywhere in the eval set;
    - contamination_frac: n_hit_grams / n_grams (NULL when n_grams = 0);
    - matched_eval_id: lexicographic-min eval doc sharing a gram (NULL
      when NO gram matched) — the audit pointer a removal run logs. Note
      this is populated whenever ANY gram matched, even for docs below
      ``min_hits`` that report is_contaminated=False: sub-threshold
      overlap is exactly what a graded/tiered policy wants to audit;
    - is_contaminated: n_hit_grams >= min_hits.

    Every input training row appears exactly once in the output, so
    ``.filter(~F.col("is_contaminated"))`` is the decontaminated corpus.
    """
    eval_id = eval_id_col or id_col
    eval_text = eval_text_col or text_col
    if normalize:
        train = train.select(id_col, text_ops.norm_expr(text_col).alias(text_col))
        eval_df = eval_df.select(
            eval_id, text_ops.norm_expr(eval_text).alias(eval_text)
        )

    # eval side: distinct (gram_hash -> min eval id), the broadcast dim.
    # The groupBy keeps one row per gram so the join can't fan out a
    # training gram into multiple hit rows per eval doc.
    eval_grams = (
        _gram_hashes(eval_df, eval_id, eval_text, k)
        .groupBy("gram_hash")
        .agg(F.min(eval_id).alias("__eval_id"))
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)

    # training side keeps one NULL-gram row for docs shorter than k
    # tokens (explode_outer), so the per-doc aggregation below covers
    # every input doc — no restore join, ONE exchange in the operator
    tg = _gram_hashes(train, id_col, text_col, k, keep_empty=True)
    hits = tg.join(eval_grams, "gram_hash", "left")

    agg = hits.groupBy(id_col).agg(
        F.count("gram_hash").alias("n_grams"),
        F.count("__eval_id").alias("n_hit_grams"),
        F.min("__eval_id").alias("matched_eval_id"),
    )
    n_grams, n_hits = F.col("n_grams"), F.col("n_hit_grams")
    return agg.select(
        id_col,
        "n_grams",
        "n_hit_grams",
        F.when(n_grams > 0, n_hits.cast("double") / n_grams).alias(
            "contamination_frac"
        ),
        "matched_eval_id",
        (n_hits >= F.lit(min_hits)).alias("is_contaminated"),
    )
