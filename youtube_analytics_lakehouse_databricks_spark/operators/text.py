"""Text-analysis operators over arbitrary (id, text) DataFrames.

All JVM-side array/higher-order-function expressions — no Python in the
hot path; each operator is one narrow projection (no shuffle) except the
token-count aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "que"),
}


def _tokens(text_col: str):
    return F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")


def norm_expr(text_col: str):
    """Canonical-text Column: lowercase, punctuation stripped to spaces,
    whitespace collapsed, trimmed — a codegen'd regexp_replace chain."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, norm_text): canonical text for hashing/dedup — one narrow
    projection, no shuffle; run BEFORE exact/MinHash dedup so cosmetic
    variants collide."""
    return df.select(id_col, norm_expr(text_col).alias("norm_text"))


def quality_scores(
    df: DataFrame, id_col: str, text_col: str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Token counts, distinct ratio, stopword ratio, char length."""
    stop_list = ", ".join(f"'{s}'" for s in stopwords)
    toks = df.select(id_col, text_col, _tokens(text_col).alias("tokens"))
    n = F.size("tokens")
    return toks.select(
        id_col,
        n.alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars_actual"),
        (F.size(F.expr(f"filter(tokens, x -> x IN ({stop_list}))")).cast("double") / n).alias(
            "stopword_ratio"
        ),
        (F.size(F.array_distinct("tokens")).cast("double") / n).alias("distinct_ratio"),
    )


def lang_id(
    df: DataFrame, id_col: str, text_col: str, lang_stops: dict[str, tuple[str, ...]] | None = None
) -> DataFrame:
    """Stopword-hit-count argmax language guess: (id, predicted_lang)."""
    lang_stops = lang_stops or LANG_STOPWORDS
    toks = df.select(id_col, _tokens(text_col).alias("tokens"))
    counts = toks.select(
        id_col,
        *[
            F.size(
                F.expr(f"filter(tokens, x -> x IN ({', '.join(repr(s) for s in stops)}))")
            ).alias(f"n_{lang}")
            for lang, stops in lang_stops.items()
        ],
    )
    langs = list(lang_stops)
    n = {lang: F.col(f"n_{lang}") for lang in langs}
    pred = None
    for i, lang in enumerate(langs):
        cond = (n[lang] > 0)
        for other in langs[i + 1 :]:
            cond = cond & (n[lang] >= n[other])
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("unknown")
    return counts.select(id_col, pred.alias("predicted_lang"))


def positional_fingerprints(df: DataFrame, id_col: str, text_col: str, modulus: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive but distribution-safe document fingerprint:
    exact bigint sum of position-weighted token hashes, mod m."""
    toks = df.select(
        id_col, F.posexplode(_tokens(text_col)).alias("ord", "token")
    )
    term = (F.col("ord") + 1).cast("long") * (
        F.ascii("token").cast("long") * 31 + F.length("token").cast("long")
    )
    return toks.groupBy(id_col).agg((F.sum(term) % modulus).cast("long").alias("fingerprint"))


def token_counts(df: DataFrame, text_col: str, pattern: str | None = None, min_count: int = 1) -> DataFrame:
    """Corpus token frequencies; ``pattern`` switches to regex tokenization
    (BPE-ish alpha/digit runs), default whitespace."""
    if pattern is None:
        tok = F.explode(_tokens(text_col))
    else:
        tok = F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '{pattern}', 0)"))
    return (
        df.select(tok.alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
        .filter(F.col("token_count") >= min_count)
    )
