"""Deduplication operators over arbitrary DataFrames.

Five families, all expressed as compositions of built-in DataFrame ops
(shuffle-on-derived-key; no O(n^2) stages):

- exact: content-hash groupBy;
- MinHash + LSH: shingle -> per-seed min sha256 -> band keys -> equi-join
  candidates;
- n-gram Jaccard: distinct-shingle self-join (brute verify) or candidate-
  restricted verify (the scale path);
- SimHash: sign-of-sum bit fingerprints.

Hashes are sha256 hex (lexicographic min is a valid uniform min-hash);
everything is deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """One row per distinct content hash: (hash, keep id, cluster size)."""
    return df.groupBy(F.sha2(F.col(content_col), 256).alias(f"{content_col}_hash")).agg(
        F.min(id_col).alias(f"keep_{id_col}"), F.count(F.lit(1)).alias("dup_count")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle): overlapping k-word shingles via posexplode + lead."""
    toks = df.select(
        id_col,
        F.posexplode(F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")).alias(
            "ord", "token"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("ord")
    out = toks
    names = ["token"]
    for i in range(1, k):
        out = out.withColumn(f"t{i}", F.lead("token", i).over(w))
        names.append(f"t{i}")
    return out.filter(F.col(names[-1]).isNotNull()).select(
        id_col, F.concat_ws(" ", *names).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, id_col: str, n_hashes: int = 8) -> DataFrame:
    """One row per id with n lexicographic-min sha256 columns mh0..mhN-1."""
    aggs = [
        F.min(F.sha2(F.concat_ws("|", F.lit(str(i)), F.col("shingle")), 256)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_join_candidates(banded: DataFrame, id_col: str, band_cols: list[str]) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >= 1 band key.

    One posexplode over the band array -> one self-equi-join on
    (band_idx, band_key) -> distinct. A single shuffle+join stage
    regardless of the band count (vs one self-join per band)."""
    # Cached so the (possibly expensive) upstream signature computation
    # runs once, not once per self-join leg. The cached frame is narrow:
    # (id, band_idx, band_key) — O(rows * bands) small strings.
    ex = banded.select(
        id_col, F.posexplode(F.array(*band_cols)).alias("band_idx", "band_key")
    ).cache()
    a = ex.select(F.col(id_col).alias("doc_a"), "band_idx", "band_key")
    b = ex.select(F.col(id_col).alias("doc_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidates(sig: DataFrame, id_col: str, n_hashes: int = 8, rows_per_band: int = 2) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band key."""
    bands = n_hashes // rows_per_band
    banded = sig.select(
        id_col,
        *[
            F.sha2(
                F.concat_ws("|", *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]),
                256,
            ).alias(f"band{b}")
            for b in range(bands)
        ],
    )
    return band_join_candidates(banded, id_col, [f"band{b}" for b in range(bands)])


def jaccard_verify(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    candidates: DataFrame | None = None,
    already_distinct: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard >= threshold. With ``candidates`` given,
    verifies O(candidates) (the 100 TB shape); otherwise brute self-join.
    Pass ``already_distinct=True`` when ``sh`` is a pre-deduped (and
    ideally cached) shingle set, to skip the distinct shuffle here — the
    distinct frame is read three times (two join legs + sizes)."""
    ds = sh if already_distinct else sh.distinct()
    sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if candidates is None:
        a = ds.select(F.col(id_col).alias("doc_a"), "shingle")
        b = ds.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        sh_a = ds.select(F.col(id_col).alias("doc_a"), "shingle")
        sh_b = ds.select(F.col(id_col).alias("doc_b"), "shingle")
        inter = (
            candidates.join(sh_a, "doc_a")
            .join(sh_b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
