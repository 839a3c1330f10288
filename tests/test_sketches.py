"""Sketch aggregates: approximation error bounded against exact values."""

from __future__ import annotations

from youtube_analytics_lakehouse_databricks_spark.queries import registry


def test_hll_and_quantile_sketches_bounded(spark):
    from youtube_analytics_lakehouse_databricks_spark.queries.extended import sketch_user_counts_diagnostic

    rows = sketch_user_counts_diagnostic(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        # HLL default rsd is 5%; allow 3x slack for small groups
        assert abs(r["approx_users"] - r["exact_users"]) <= max(3, 0.15 * r["exact_users"])
        assert r["approx_p50"] is not None and r["approx_p99"] is not None
        assert r["approx_p50"] <= r["approx_p99"]
        # the query's own self-validation columns agree
        assert r["hll_ok"] and r["p50_ok"] and r["p99_ok"], r
        assert r["hll_rel_err"] <= 0.15
    # the registered (oracled) row is exactly the deterministic
    # projection of the diagnostic frame — keys, exact aggregates, flags
    reg = registry()["sketch_user_counts"].builder(spark, "/root/testdata/sf0.01")
    assert reg.columns == [
        "event_type", "exact_users", "n_events", "hll_ok", "p50_ok", "p99_ok",
    ]
    got = {r["event_type"]: r for r in reg.collect()}
    assert len(got) == 5
    for r in rows:
        g = got[r["event_type"]]
        assert g["exact_users"] == r["exact_users"]
        assert g["n_events"] == r["n_events"]
        assert g["hll_ok"] and g["p50_ok"] and g["p99_ok"]


def test_sketch_flags_true_on_degenerate_groups(spark):
    """The registered oracle asserts TRUE literals for the bound flags,
    so they must be provably TRUE on EVERY input — including groups the
    sketch has nothing to grade on. All-NULL user_id (exact_users=0:
    the naive rel_err is 0/0=NaN, and NaN sorts above every number in
    Spark, so `NaN <= 0.15` is false) and all-NULL value (NULL
    percentile envelope -> NULL between) must both read vacuously ok,
    never NULL or false."""
    from youtube_analytics_lakehouse_databricks_spark.queries.extended import _sketch_frame

    ev = spark.createDataFrame(
        [
            ("no_users", None, 1.5),
            ("no_users", None, 2.5),
            # a 2-value group: the interpolated p50 envelope is
            # [1.495, 1.505] but approx can only return 1.0 or 2.0 —
            # the <200-value vacuity guard is what keeps this TRUE
            ("tiny", 1, 1.0),
            ("tiny", 2, 2.0),
            ("no_values", 7, None),
            ("no_values", 8, None),
            ("nothing", None, None),
        ]
        + [("big", i, float(i)) for i in range(500)],  # active grading
        "event_type string, user_id int, value double",
    )
    rows = {r["event_type"]: r for r in _sketch_frame(ev).collect()}
    assert len(rows) == 5
    for name, r in rows.items():
        assert r["hll_ok"] is True, (name, r)
        assert r["p50_ok"] is True, (name, r)
        assert r["p99_ok"] is True, (name, r)
    assert rows["no_users"]["exact_users"] == 0
    assert rows["no_users"]["hll_rel_err"] == 0.0
    assert rows["no_values"]["approx_p50"] is None
    assert rows["tiny"]["exact_users"] == 2
    # the big group really exercised the envelope (not the vacuity guard)
    assert rows["big"]["n_events"] == 500
    assert 245.0 <= rows["big"]["approx_p50"] <= 255.0


def test_rollup_percentiles_have_a_bounded_approx_path(spark):
    """events_rollup's EXACT percentiles are the oracle-correctness
    surface; the documented 100 TB path is approx_percentile (constant
    memory per group — the grand-total group would otherwise buffer the
    whole corpus's value column in one aggregation buffer). Turn that
    claim into evidence: at EVERY rollup grain, including '(all)', the
    approx value's EXACT RANK is within ±0.005 of the requested quantile
    (the accuracy=1000 guarantee is ±0.001; rank-space is the honest
    check — approx returns real elements while `percentile` interpolates,
    so value-space envelopes false-positive on small groups)."""
    import numpy as np
    from pyspark.sql import functions as F

    from youtube_analytics_lakehouse_databricks_spark.queries import read

    ev = read(spark, "/root/testdata/sf0.01", "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    approx = (
        ev.rollup("event_type", "event_date")
        .agg(
            F.expr(
                "approx_percentile(value, array(0.5D, 0.9D, 0.99D), 1000)"
            ).alias("aq")
        )
        .collect()
    )
    pdf = ev.select("event_type", "event_date", "value").toPandas()
    vals = pdf["value"].to_numpy()

    def group_values(r):
        m = np.ones(len(pdf), dtype=bool)
        if r["event_type"] is not None:
            m &= (pdf["event_type"] == r["event_type"]).to_numpy()
        if r["event_date"] is not None:
            m &= (pdf["event_date"] == r["event_date"]).to_numpy()
        v = vals[m]
        return v[~np.isnan(v)]

    grand = [r for r in approx if r["event_type"] is None and r["event_date"] is None]
    assert len(grand) == 1  # the group the exact path buffers corpus-wide
    assert len(approx) > 30  # type, (type, date), and (all) grains present
    checked = 0
    for r in approx:
        if r["aq"] is None:
            continue  # all-NULL value group: both paths agree on nothing
        v = np.sort(group_values(r))
        n = len(v)
        for q, p in zip(r["aq"], (0.5, 0.9, 0.99)):
            below = np.searchsorted(v, q, side="left") / n   # frac strictly <
            at_or_below = np.searchsorted(v, q, side="right") / n
            assert below <= p + 0.005 and at_or_below >= p - 0.005, (r, p, q)
            checked += 1
    assert checked >= 3 * (len(approx) - 1)
