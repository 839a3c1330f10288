"""Temperature-weighted corpus mixing for training-data assembly.

A pretraining mix reweights domains (web / code / books / wiki ...):
high-quality small domains are upsampled, huge crawls downsampled —
GPT-3's per-dataset sampling weights, the (count)^alpha temperature rule
used for multilingual mixes, and LLaMA-style epoch fractions are all
the same operation: a per-domain target row count realized by
deterministic per-row sampling.

Scale shape: one tiny per-domain count aggregation (O(domains) rows,
control-plane collect), then ONE narrow pass over the corpus — the
per-domain rate joins in as a broadcast map and each row keeps/repeats
itself by comparing a uniform hash draw against the rate. No shuffle of
the corpus, no rand() (task retries would re-draw; the hash draw is a
pure function of (id, seed)), no driver-side row handling.

Downsampling uses threshold sampling (keep iff u < rate), which is
NESTED across rates: the rows kept at rate r are a superset of those
kept at r' < r for the same seed — so shrinking a domain's weight only
removes rows, never churns the survivor set (stable caches/ablations).
Upsampling emits floor(rate) copies plus one more iff u < frac(rate); a
``copy`` column (0-based) keeps output ids unique, and copy k of a row
exists whenever copy k+1 does (same nesting property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^63 as a double: maps xxhash64's signed range onto [0, 1).
_TWO63 = float(1 << 63)

# Lehmer / Park-Miller modulus: the portable draw's period and scale.
_LEHMER_M = 2147483647  # 2^31 - 1 (prime)
_LEHMER_A = 48271


def lehmer_key(col: Column, seed: int) -> Column:
    """One Park-Miller step as a BIGINT column in [0, 2^31 - 1):
    ((col + seed + 1) * 48271) mod (2^31 - 1). Exactly expressible in
    ANSI SQL BIGINT arithmetic (no overflow for |col + seed| < ~1.9e14),
    so an external engine (e.g. DuckDB) replays the key bit-for-bit —
    the shared primitive behind every ``draw='lehmer'`` verification
    mode (mixing, sharding, splitting)."""
    return F.pmod(
        (col.cast("long") + F.lit(int(seed) + 1)) * F.lit(_LEHMER_A),
        F.lit(_LEHMER_M),
    )


def unit_draw(col: Column, seed: int, draw: str = "xxhash64") -> Column:
    """Deterministic uniform [0,1) draw per (col value, seed).

    - ``xxhash64`` (default): xxhash64 scaled out of its signed 64-bit
      range. Resolution 2^-64 — far below any meaningful sampling rate.
    - ``lehmer``: ``lehmer_key`` scaled to [0,1) — the cross-engine
      VERIFICATION mode (ANSI-SQL-replayable). Statistically weaker than
      xxhash64 (one multiplicative-congruential step, resolution
      ~4.7e-10); keep the default for production.

    Both draws are pure functions of (value, seed): task retries
    re-derive the same decision, and the threshold-nesting property
    (kept at rate r' < r ⊂ kept at r) holds for either.
    """
    if draw == "xxhash64":
        return (
            F.xxhash64(col, F.lit(int(seed))).cast("double") / F.lit(_TWO63)
            + F.lit(1.0)
        ) / F.lit(2.0)
    if draw == "lehmer":
        return lehmer_key(col, seed).cast("double") / F.lit(float(_LEHMER_M))
    raise ValueError(f"unknown draw {draw!r} (xxhash64 | lehmer)")


def require_integral_id(
    df: DataFrame,
    col_name: str,
    op: str,
    hint: str = (
        "use the default draw='xxhash64', which hashes any id type"
    ),
) -> None:
    """Fail loudly when an operator needs an integral id column and got
    something else. The one shared predicate (and message shape) for
    every integral-id contract in the engine: the lehmer verification
    draws (BIGINT arithmetic over the id — a string id would cast to
    NULL and silently mis-assign EVERY row, while the xxhash64 default
    accepts any type) and the IVF index family (Arrow schemas carry ids
    as long — a string-keyed corpus dies inside a numpy cast with no
    useful message). ``hint`` names the caller-appropriate way out."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[col_name].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"{op}: needs an integral id column; {col_name} is "
            f"{dt.simpleString()} ({hint})"
        )


def _uniform_draw(id_col: str, seed: int, draw: str = "xxhash64"):
    """See ``unit_draw`` — string-column-name convenience wrapper."""
    return unit_draw(F.col(id_col), seed, draw)


def domain_rates(
    df: DataFrame,
    domain_col: str,
    *,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    target_rows: int | None = None,
    allow_upsample: bool = False,
    weight_col: str | None = None,
) -> list[tuple[str, int, float]]:
    """[(domain, count, rate)]: the per-domain sampling rate realizing
    the requested mix.

    Exactly one of ``alpha`` / ``weights``:

    - ``alpha``: temperature over observed counts — target share of
      domain d is count_d^alpha / sum(count^alpha). alpha=1 preserves
      natural proportions (a plain uniform downsample), alpha=0 gives
      every domain an equal share, values between interpolate.
    - ``weights``: explicit relative weights (any positive scale);
      domains absent from the dict get weight 0 (dropped).

    ``target_rows`` sets the total output size (default: the input
    size). Without ``allow_upsample`` rates are capped at 1.0, so the
    realized total can undershoot the target when a small domain's
    target exceeds its supply — the cap is reported honestly in the
    returned rates rather than silently shifted onto other domains.

    ``weight_col`` switches the BUDGET UNIT from rows to that column's
    sum — pretraining mixes are specified in TOKENS, not documents
    (GPT-3's table 2.2 weights are token shares), so pass the n_tokens
    column and read ``target_rows`` as target TOKENS. The realized
    per-domain token total concentrates on count * rate by linearity of
    the independent per-row draw (a domain's sampled token sum has
    expectation rate * domain_tokens regardless of how tokens are
    distributed across its docs); temperature shares are then over
    token masses, matching the multilingual (mass)^alpha convention.
    """
    if (alpha is None) == (weights is None):
        raise ValueError("specify exactly one of alpha / weights")
    unit = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.col(weight_col).cast("double"))
    )
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(unit.alias("n"))
        .collect()
    }
    if weight_col is not None:
        bad = sorted(d for d, n in counts.items() if n is None or n < 0)
        if bad:
            raise ValueError(
                f"weight_col={weight_col!r} sums to NULL/negative for "
                f"domains {bad} — a weightless domain cannot be budgeted"
            )
    if alpha is not None:
        shares = {d: float(n) ** float(alpha) for d, n in counts.items()}
    else:
        bad = {d: w for d, w in weights.items() if w < 0}
        if bad:
            raise ValueError(f"negative weights: {bad}")
        unknown = sorted(set(weights) - set(counts))
        if unknown:
            # a typo'd domain name silently weighting nothing is the
            # failure mode that ships a wrong mix — fail loudly
            raise ValueError(f"weights name domains not in the corpus: {unknown}")
        shares = {d: float(weights.get(d, 0.0)) for d in counts}
    # NULL domain sorts first (sorted() would raise on None vs str);
    # float sums run in this sorted order so z (and every rate derived
    # from it) is bit-identical across runs — collect() row order is not
    # deterministic, and an order-dependent last-ulp z would make the
    # sampled set itself run-to-run unstable at the rate boundary
    domains = sorted(counts, key=lambda d: (d is not None, d or ""))
    z = sum(shares[d] for d in domains)
    if z <= 0:
        raise ValueError("all domain shares are zero")
    total = (
        int(target_rows)
        if target_rows is not None
        else sum(counts[d] for d in domains)
    )
    out = []
    for d in domains:
        rate = (shares[d] / z) * total / counts[d]
        if not allow_upsample:
            rate = min(rate, 1.0)
        out.append((d, counts[d], rate))
    return out


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    *,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    target_rows: int | None = None,
    seed: int = 0,
    allow_upsample: bool = False,
    draw: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """The mixed corpus: input columns + ``copy`` (0 without
    upsampling). Deterministic in (rows, parameters, seed); each
    domain's realized size concentrates tightly around count * rate.
    ``draw``: the per-row uniform source — see ``_uniform_draw``
    (``lehmer`` is the ANSI-SQL-replayable verification mode).
    ``weight_col``: budget in that column's units (tokens) instead of
    rows — see ``domain_rates``."""
    if draw == "lehmer":
        require_integral_id(df, id_col, "mixture_sample")
    rates = domain_rates(
        df,
        domain_col,
        alpha=alpha,
        weights=weights,
        target_rows=target_rows,
        allow_upsample=allow_upsample,
        weight_col=weight_col,
    )
    spark = df.sparkSession
    rate_df = F.broadcast(
        spark.createDataFrame(
            [(d, r) for d, _, r in rates], f"{domain_col} string, __rate double"
        )
    )
    u = _uniform_draw(id_col, seed, draw)
    # null-SAFE equi-join: domain_rates groups NULL domains and reports a
    # rate for them, so the sampling pass must apply it — a plain inner
    # join on the column name would never match NULL = NULL and silently
    # drop every NULL-domain row from the mix (round-6 ADVICE). eqNullSafe
    # (<=>) is still an equi-join for the planner: the broadcast hash
    # join on the tiny rate map survives.
    rated = rate_df.withColumnRenamed(domain_col, "__mix_domain")
    with_rate = (
        df.join(rated, F.col(domain_col).eqNullSafe(F.col("__mix_domain")))
        .drop("__mix_domain")
        .withColumn("__u", u)
    )
    if not allow_upsample:
        return with_rate.filter(F.col("__u") < F.col("__rate")).select(
            *df.columns, F.lit(0).alias("copy")
        )
    n_copies = F.floor("__rate") + F.when(
        F.col("__u") < F.col("__rate") - F.floor("__rate"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        with_rate.withColumn("__n", n_copies.cast("int"))
        .filter(F.col("__n") > 0)
        .select(
            *df.columns,
            F.explode(F.expr("sequence(0, __n - 1)")).alias("copy"),
        )
    )
