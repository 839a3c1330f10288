"""Linear quality classifier: fasttext-style hashed-n-gram scoring.

Real curation pipelines gate web text with a small linear classifier
(wiki-vs-crawl logistic regression over hashed token features — the
CCNet/GPT-3 quality filter). The engine splits it the same way it
splits IVF: TRAINING is driver-side numpy over a bounded sample (a
quality classifier trains on 10^4-10^5 labeled docs — sampling is the
algorithm, not a compromise), INFERENCE is fully distributed and stays
in the JVM.

Inference never runs Python per row. Features are hashed token (and
token-bigram) buckets computed by explode + ``xxhash64`` COLUMNS
(whole-stage codegen — not HOF lambdas, which run interpreted), weights
arrive as a broadcast join on the feature id (the weight table is
vocab-sized — only buckets seen in training carry weight), and the dot
product is one per-doc sum riding the same doc-id fan-out every other
text stage uses. One exchange total; the classic UDF implementation
would move every token through Python instead.

Train/serve skew is impossible by construction: training extracts its
feature counts through the SAME Spark expressions it later scores with,
then collects the (sample-sized) sparse matrix to fit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.text import norm_expr

DEFAULT_N_FEATURES = 1 << 18


def _feature_rows(
    df: DataFrame, id_col: str, text_col: str, *, n_features: int, bigrams: bool,
    keep_empty_docs: bool = False,
) -> DataFrame:
    """(id, feat): one row per token occurrence (+ one per bigram when
    enabled), feat = xxhash64 bucket. Narrow explode — the hash runs on
    a bound COLUMN, inside codegen.

    ``keep_empty_docs``: zero-token docs keep one NULL-feat row
    (explode_outer on the unigram leg) so a downstream per-doc
    aggregation covers every input doc without a restore join — the
    decontam._gram_hashes sentinel contract. Training leaves it off
    (its groupBy must see only real features)."""
    toks = df.select(
        id_col,
        F.expr(f"filter(split({text_col}, ' ')," " x -> x <> '')").alias("__t"),
    )
    uni_ex = F.explode_outer("__t") if keep_empty_docs else F.explode("__t")
    uni = toks.select(id_col, uni_ex.alias("__g"))
    feat = F.pmod(F.xxhash64("__g"), F.lit(n_features))
    if keep_empty_docs:
        # the sentinel row's feat must stay NULL: xxhash64(NULL) returns
        # the SEED (42), which would alias bucket 42 and pick up its
        # weight in the scoring join
        feat = F.when(F.col("__g").isNotNull(), feat)
    if bigrams:
        bi = toks.select(
            id_col,
            F.explode(
                F.expr(
                    "CASE WHEN size(__t) >= 2 THEN transform("
                    "sequence(0, size(__t) - 2), i -> concat(__t[i], ' ', __t[i + 1]))"
                    " ELSE CAST(array() AS array<string>) END"
                )
            ).alias("__g"),
        )
        uni = uni.unionByName(bi)
    return uni.select(id_col, feat.alias("feat"))


@dataclass
class QualityClassifier:
    """Fitted model: sparse weights over hashed feature buckets + bias.

    ``weights`` is a plain list of (feat, weight) — vocab-sized, always
    broadcastable; ``save``/``load`` round-trip through parquet next to
    the pipeline's other state."""

    weights: list[tuple[int, float]]
    bias: float
    n_features: int
    bigrams: bool

    def weights_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.weights, "feat long, w double")

    def save(self, spark: SparkSession, path: str) -> None:
        meta = [(int(-1), float(self.bias), int(self.n_features), bool(self.bigrams))]
        spark.createDataFrame(
            [(int(f), float(w), int(0), False) for f, w in self.weights] +
            [(m[0], m[1], m[2], m[3]) for m in meta],
            "feat long, w double, n_features long, bigrams boolean",
        ).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "QualityClassifier":
        rows = spark.read.parquet(path).collect()
        meta = next(r for r in rows if r["feat"] == -1)
        weights = [(r["feat"], r["w"]) for r in rows if r["feat"] != -1]
        return cls(
            weights=sorted(weights),
            bias=meta["w"],
            n_features=meta["n_features"],
            bigrams=meta["bigrams"],
        )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_features: int = DEFAULT_N_FEATURES,
    bigrams: bool = True,
    sample_per_class: int = 20_000,
    normalize: bool = True,
    l2: float = 1e-4,
    epochs: int = 60,
    lr: float = 0.5,
) -> QualityClassifier:
    """Fit logistic regression: positive (high-quality reference, e.g.
    wiki/books) vs negative (raw crawl). Deterministic: the sample is
    the lowest-id docs per class, init is zeros, full-batch gradient
    descent — same inputs, same model, no RNG anywhere."""
    import numpy as np

    def counts(df: DataFrame, label: int):
        d = df.select(id_col, text_col)
        if normalize:
            d = d.select(id_col, norm_expr(text_col).alias(text_col))
        d = d.orderBy(id_col).limit(sample_per_class)
        rows = (
            _feature_rows(d, id_col, text_col, n_features=n_features, bigrams=bigrams)
            .groupBy(id_col, "feat")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(
                F.collect_list("feat").alias("fs"),
                F.collect_list("c").alias("cs"),
            )
            .collect()
        )
        return [(r["fs"], r["cs"], label) for r in rows]

    data = counts(positive, 1) + counts(negative, 0)
    if not data:
        raise ValueError("no training documents")
    # compact the feature space to the buckets actually seen
    vocab = sorted({f for fs, _, _ in data for f in fs})
    col_of = {f: i for i, f in enumerate(vocab)}
    X = np.zeros((len(data), len(vocab)), dtype=np.float64)
    y = np.zeros(len(data), dtype=np.float64)
    for i, (fs, cs, label) in enumerate(data):
        tot = float(sum(cs)) or 1.0
        for f, c in zip(fs, cs):
            X[i, col_of[f]] = c / tot  # L1-normalized term frequencies
        y[i] = label
    w = np.zeros(len(vocab))
    b = 0.0
    n = len(data)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityClassifier(
        weights=[(int(f), float(w[col_of[f]])) for f in vocab if w[col_of[f]] != 0.0],
        bias=float(b),
        n_features=n_features,
        bigrams=bigrams,
    )


def score_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: QualityClassifier,
    *,
    normalize: bool = True,
) -> DataFrame:
    """(id, quality_logit, quality_prob): distributed inference, JVM
    only. Docs with zero tokens score the bare bias. One exchange (the
    per-doc aggregation); the weight table joins broadcast.

    Zero-token docs ride a NULL-feat sentinel row (explode_outer in
    _feature_rows) instead of the former corpus-wide restore join: the
    sentinel never matches a weight (NULL join key), so the doc
    aggregates __dot = 0 over __n = 1 and scores the bare bias through
    the SAME arithmetic as every other doc. r16 — the restore join was
    the plan's only SortMergeJoin, costing an extra Exchange + two
    Sorts over the whole corpus id set (guide §2.4/§3)."""
    spark = df.sparkSession
    d = df.select(id_col, text_col)
    if normalize:
        d = d.select(id_col, norm_expr(text_col).alias(text_col))
    feats = _feature_rows(
        d, id_col, text_col, n_features=model.n_features, bigrams=model.bigrams,
        keep_empty_docs=True,
    )
    wdf = F.broadcast(model.weights_df(spark))
    per_doc = (
        feats.join(wdf, "feat", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("w", F.lit(0.0))).alias("__dot"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    logit = F.col("__dot") / F.col("__n") + F.lit(model.bias)
    return per_doc.select(
        id_col,
        logit.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("quality_prob"),
    )
