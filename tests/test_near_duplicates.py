"""Correctness pin for the embedding near-duplicate operator
(operators/similarity.py::band_near_duplicates), replacing its former
driver oracle row (unregistered r9 — the slot now carries
substring_dedup_documents).

The old oracle row was VACUOUS: the driver's synthetic embeddings have
no cosine>=0.99 pairs, so DuckDB and Spark both returned 0 rows and the
"hash match" never exercised the operator. This test is strictly
stronger — it PLANTS near-duplicate pairs and checks the SRP-band path
against a brute-force all-pairs reference:

  - zero false positives (the exact-cosine verify guarantees this
    structurally; asserted anyway), and
  - full recall on pairs at cosine >= 0.9999: a pair that close is
    missed only if all 4 bands split it, P ~= (1-(1-theta/pi)^8)^4
    ~= 1.6e-6 at theta = acos(0.9999) — deterministic at seed anyway.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.similarity import band_near_duplicates
from youtube_analytics_lakehouse_databricks_spark.queries.vectorops import (
    _DOT,
    _NORM,
    NEARDUP_BANDS,
    NEARDUP_THRESHOLD,
    _band_expr_spark,
)

DIM = 16
N_BASE = 40
N_PLANTED = 6


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BASE, DIM)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(N_BASE)]
    planted = []
    for j in range(N_PLANTED):
        # tiny perturbation: cosine(base, dup) >= 0.9999 at this scale
        src = base[j]
        dup = src + 0.002 * rng.standard_normal(DIM).astype(np.float32) * np.linalg.norm(
            src
        ) / np.sqrt(DIM)
        vid = N_BASE + j
        rows.append((vid, dup.astype(np.float32).tolist()))
        planted.append((j, vid))
    return rows, planted


def _brute_pairs(rows, threshold):
    ids = [i for i, _ in rows]
    mat = np.array([v for _, v in rows], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = normed @ normed.T
    out = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if round(cos[a, b], 6) >= threshold:
                key = (min(ids[a], ids[b]), max(ids[a], ids[b]))
                out[key] = cos[a, b]
    return out


def test_band_near_duplicates_vs_brute_force(spark, corpus):
    rows, planted = corpus
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (min(r["vec_a"], r["vec_b"]), max(r["vec_a"], r["vec_b"])): r["cosine"]
        for r in band_near_duplicates(
            df,
            "vec_id",
            "embedding",
            [_band_expr_spark(b) for b in range(NEARDUP_BANDS)],
            _DOT,
            _NORM,
            threshold=NEARDUP_THRESHOLD,
        ).collect()
    }
    want = _brute_pairs(rows, NEARDUP_THRESHOLD)

    # the verify step makes false positives structurally impossible
    assert set(got) <= set(want), f"false positives: {set(got) - set(want)}"
    # every planted >=0.9999 pair must be recalled (banding miss P ~ 1e-6)
    for pair in planted:
        assert pair in got, f"planted near-dup {pair} missed by the band path"
    for pair, cos in got.items():
        assert abs(cos - round(want[pair], 6)) < 1e-9, (pair, cos, want[pair])


def test_band_near_duplicates_no_cross_product(spark, corpus):
    rows, _ = corpus
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        band_near_duplicates(
            df,
            "vec_id",
            "embedding",
            [_band_expr_spark(b) for b in range(NEARDUP_BANDS)],
            _DOT,
            _NORM,
            threshold=NEARDUP_THRESHOLD,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
