"""Product quantization (operators/pq.py): train / encode / ADC search.

Contracts: deterministic training (partition-invariant, no RNG); encode
is a zero-shuffle Arrow pass; ADC top-k recall against exact cosine is
high on structured data and degrades gracefully; the self-graded audit
bounds reconstruction error; finer quantization (more subspaces) is
monotonically more accurate; guards are loud.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from youtube_analytics_lakehouse_databricks_spark.operators.pq import (
    PQModel,
    pq_audit,
    pq_encode,
    pq_topk,
    train_pq,
)
from youtube_analytics_lakehouse_databricks_spark.operators.similarity import cosine_topk

N, D = 400, 16


def _planted(n=N, d=D, seed=13):
    """Anisotropic cloud: PQ codebooks have real structure to learn."""
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.standard_normal((d, d)))
    scales = np.array([8.0, 5.0, 3.0, 2.0] + [0.4] * (d - 4))
    return r.standard_normal((n, d)) @ (q * scales).T


def _df(spark, X, start=0):
    return spark.createDataFrame(
        [(start + i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def fitted(spark):
    df = _df(spark, _planted())
    model = train_pq(df, "vec_id", "embedding", m=8, n_codes=64, iters=5)
    return df, model


def test_training_is_deterministic_and_partition_invariant(spark, fitted):
    df, model = fitted
    again = train_pq(
        df.repartition(13), "vec_id", "embedding", m=8, n_codes=64, iters=5
    )
    assert np.array_equal(np.asarray(model.codebooks), np.asarray(again.codebooks))
    assert model.m == 8 and model.n_codes == 64 and model.dim == D


def test_encode_shape_and_zero_shuffle(spark, fitted):
    import io
    from contextlib import redirect_stdout

    df, model = fitted
    codes = pq_encode(df, "vec_id", "embedding", model)
    buf = io.StringIO()
    with redirect_stdout(buf):
        codes.explain("formatted")
    assert "Exchange" not in buf.getvalue()
    rows = codes.collect()
    assert len(rows) == N
    for r in rows[:10]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 64 for c in r["codes"])
        assert r["norm"] > 0


def test_adc_recall_and_self_grading(spark, fitted):
    df, model = fitted
    codes = pq_encode(df, "vec_id", "embedding", model).cache()
    queries = df.filter("vec_id < 30")
    K = 10
    adc = pq_topk(codes, queries, "vec_id", "embedding", model, k=K, exclude_self=True)
    exact = cosine_topk(df, "vec_id", "embedding", k=K)
    adc_pairs = {(r["query_id"], r["neighbor_id"]) for r in adc.collect()}
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in exact.collect()
        if r["query_id"] < 30
    }
    recall = len(adc_pairs & exact_pairs) / len(exact_pairs)
    print(f"PQ ADC recall@{K}: {recall:.3f}")
    assert recall >= 0.5  # 8 bytes/vector vs 64 — structure survives

    audit = pq_audit(df, "vec_id", "embedding", model)
    stats = audit.agg(
        F.mean("recon_rel_err").alias("err"), F.min("cos_self").alias("cmin")
    ).collect()[0]
    assert stats["err"] < 0.5
    assert stats["cmin"] > 0.7


def test_finer_quantization_is_more_accurate(spark, fitted):
    df, _ = fitted

    def mean_err(m):
        model = train_pq(df, "vec_id", "embedding", m=m, n_codes=64, iters=5)
        return (
            pq_audit(df, "vec_id", "embedding", model)
            .agg(F.mean("recon_rel_err"))
            .collect()[0][0]
        )

    e2, e4, e8 = mean_err(2), mean_err(4), mean_err(8)
    print(f"recon err m=2 {e2:.4f} m=4 {e4:.4f} m=8 {e8:.4f}")
    assert e8 < e4 < e2


def test_save_load_roundtrip(spark, fitted, tmp_path):
    df, model = fitted
    p = str(tmp_path / "pq")
    model.save(spark, p)
    loaded = PQModel.load(p)
    assert np.array_equal(np.asarray(model.codebooks), np.asarray(loaded.codebooks))
    a = sorted(map(tuple, pq_encode(df, "vec_id", "embedding", model).collect()))
    b = sorted(map(tuple, pq_encode(df, "vec_id", "embedding", loaded).collect()))
    assert a == b


def test_guards(spark, fitted):
    df, model = fitted
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(df, "vec_id", "embedding", m=5)
    strdf = df.selectExpr("CAST(vec_id AS STRING) AS vec_id", "embedding")
    with pytest.raises(ValueError, match="integral id"):
        train_pq(strdf, "vec_id", "embedding", m=8)
    with pytest.raises(Exception, match="ragged"):
        ragged = spark.createDataFrame(
            [(1, [1.0] * D), (2, [1.0, 2.0])], "vec_id long, embedding array<float>"
        ).coalesce(1)
        pq_encode(ragged, "vec_id", "embedding", model).collect()
    wrongd = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match=f"{D}-dim"):
        pq_encode(wrongd, "vec_id", "embedding", model).collect()
    with pytest.raises(ValueError, match="empty query"):
        pq_topk(
            pq_encode(df, "vec_id", "embedding", model),
            df.filter("vec_id < 0"),
            "vec_id",
            "embedding",
            model,
        )


def test_pq_oracle_params_train_unpadded():
    """The embedding_pq_adc oracle does not model train_pq's zero-row
    codebook padding (applied when the sample has fewer distinct
    subvectors than n_codes): pin that at the registered sizes every
    subspace has at least PQ_CODES distinct subvectors in the training
    sample at BOTH driver scales, so the trained books are unpadded and
    the oracle's init matches the operator's."""
    import numpy as np
    import pyarrow.parquet as pq_

    from youtube_analytics_lakehouse_databricks_spark.queries.vectorops import (
        PQ_CODES,
        PQ_M,
        PQ_SAMPLE,
    )

    for sf in ("sf0.001", "sf0.01"):
        t = pq_.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        order = np.argsort(np.asarray(t["vec_id"]))[:PQ_SAMPLE]
        mat = np.stack(
            [np.asarray(t["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
        )
        d_sub = mat.shape[1] // PQ_M
        for s in range(PQ_M):
            sub = mat[:, s * d_sub : (s + 1) * d_sub]
            n_distinct = len(np.unique(sub, axis=0))
            assert n_distinct >= PQ_CODES, (sf, s, n_distinct)


def test_composes_with_pca_projection(spark):
    """The compression pipeline's two tiers compose: PCA-project the
    16-d planted corpus onto its 4 informative axes, then PQ the compact
    coordinates — ADC top-k over the projected codes recovers most of
    the projected-space exact neighbors (and the ~10x end-to-end
    footprint cut — 64 B raw -> 2 subspace codes + a norm — keeps the
    geometry the planted spectrum carries)."""
    from pyspark.sql import functions as F2

    from youtube_analytics_lakehouse_databricks_spark.operators.pca import (
        project_embeddings,
        train_pca,
    )

    X = _planted(n=300, d=16, seed=37)
    df = _df(spark, X)
    model = train_pca(df, "embedding", 4, iters=40)
    proj = (
        project_embeddings(df, "vec_id", "embedding", model)
        .select("vec_id", F2.col("pc").cast("array<float>").alias("pc"))
        .cache()
    )
    pq = train_pq(proj, "vec_id", "pc", m=4, n_codes=128, iters=5)
    codes = pq_encode(proj, "vec_id", "pc", pq)
    hits = pq_topk(codes, proj, "vec_id", "pc", pq, k=5, exclude_self=True)
    exact_pc = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(proj, "vec_id", "pc", k=5).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in hits.collect()}
    recall = len(got & exact_pc) / len(exact_pc)
    print(f"pca->pq recall@5 in projected space: {recall:.3f}")
    assert recall >= 0.75, recall
