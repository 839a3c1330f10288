"""Optimized product quantization (operators/opq.py): rotation +
eigenvalue allocation + PQ.

Contracts: the rotation is orthonormal so inner products and norms —
the quantities ADC approximates — are exactly preserved; the allocation
balances per-subspace eigenvalue products and is deterministic; OPQ
beats raw PQ at the same code budget on anisotropic data (measured,
margin-asserted); training is deterministic + partition-invariant;
save/load round-trips; guards are loud.
"""

from __future__ import annotations

import numpy as np
import pytest

from youtube_analytics_lakehouse_databricks_spark.operators.opq import (
    OPQModel,
    allocate_eigen_dims,
    opq_encode,
    opq_topk,
    train_opq,
)
from youtube_analytics_lakehouse_databricks_spark.operators.pq import pq_encode, pq_topk, train_pq
from youtube_analytics_lakehouse_databricks_spark.operators.similarity import cosine_topk

N, D = 400, 16


def _planted(n=N, d=D, seed=13):
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
    model = train_opq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    return df, model


def test_rotation_is_orthonormal_and_preserves_geometry(fitted):
    """The whole design rests on this: R has orthonormal rows, so
    <Ra, Rb> = <a, b> and ||Rx|| = ||x|| — the ADC scan over rotated
    codes approximates the ORIGINAL cosine, not a distorted one."""
    _df_, model = fitted
    R = np.asarray(model.rotation)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-9)
    r = np.random.default_rng(7)
    a, b = r.standard_normal(D), r.standard_normal(D)
    assert abs(float((R @ a) @ (R @ b)) - float(a @ b)) < 1e-9
    assert abs(np.linalg.norm(R @ a) - np.linalg.norm(a)) < 1e-9


def test_allocation_balances_eigenvalue_products():
    """Ge et al. §4.2: descending walk, each eigenvalue lands in the
    open bucket with the smallest log-product — bucket products end
    within a factor of the largest single eigenvalue of each other,
    versus contiguous slicing whose first bucket hoards the spectrum."""
    ev = np.array([64.0, 25.0, 9.0, 4.0, 0.16, 0.16, 0.16, 0.16])
    perm = allocate_eigen_dims(ev, 4)
    assert sorted(perm) == list(range(8))
    buckets = [perm[i * 2 : (i + 1) * 2] for i in range(4)]
    prods = sorted(float(np.prod(ev[b])) for b in buckets)
    contiguous = sorted(
        float(np.prod(ev[i * 2 : (i + 1) * 2])) for i in range(4)
    )
    # balanced spread is orders of magnitude tighter than contiguous
    assert prods[-1] / prods[0] < 0.01 * (contiguous[-1] / contiguous[0])
    # deterministic
    assert perm == allocate_eigen_dims(ev, 4)
    with pytest.raises(ValueError, match="not divisible"):
        allocate_eigen_dims(ev, 3)


def test_opq_beats_raw_pq_at_same_budget(spark, fitted):
    """The reason the operator exists, measured not asserted: on the
    planted anisotropic corpus at m=4/64 codes, OPQ's recall@10 vs exact
    cosine is ~0.70 where raw PQ reads ~0.53 (the allocation matters
    most when few subspaces must share mixed-direction variance); the
    assertion keeps a wide margin."""
    df, model = fitted
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, "vec_id", "embedding", k=10).collect()
    }

    def recall(hits):
        got = {(r["query_id"], r["neighbor_id"]) for r in hits.collect()}
        return len(got & exact) / len(exact)

    opq_r = recall(
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            df, "vec_id", "embedding", model, k=10, exclude_self=True,
        )
    )
    raw = train_pq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    pq_r = recall(
        pq_topk(
            pq_encode(df, "vec_id", "embedding", raw),
            df, "vec_id", "embedding", raw, k=10, exclude_self=True,
        )
    )
    print(f"recall@10: opq {opq_r:.3f} vs pq {pq_r:.3f}")
    assert opq_r >= pq_r + 0.08, (opq_r, pq_r)


def test_training_is_deterministic_and_partition_invariant(spark, fitted):
    """Same input, same partitioning -> bit-identical model (no RNG
    anywhere). Repartitioned input -> equal to float-summation
    tolerance: the PCA moments merge per-partition partials, so the
    covariance — and everything downstream — can differ in the last
    ulps (the test_pca stance; the codebook sample itself is
    id-ordered, hence exactly partition-invariant)."""
    df, model = fitted
    same = train_opq(df, "vec_id", "embedding", m=4, n_codes=64, iters=5)
    assert np.array_equal(np.asarray(model.rotation), np.asarray(same.rotation))
    assert np.array_equal(
        np.asarray(model.pq.codebooks), np.asarray(same.pq.codebooks)
    )
    again = train_opq(
        df.repartition(13), "vec_id", "embedding", m=4, n_codes=64, iters=5
    )
    assert np.allclose(
        np.asarray(model.rotation), np.asarray(again.rotation), atol=1e-8
    )
    assert np.allclose(
        np.asarray(model.pq.codebooks), np.asarray(again.pq.codebooks), atol=1e-6
    )


def test_save_load_roundtrip(spark, fitted, tmp_path):
    df, model = fitted
    path = str(tmp_path / "opq")
    model.save(spark, path)
    loaded = OPQModel.load(path)
    assert np.array_equal(np.asarray(model.rotation), np.asarray(loaded.rotation))
    assert np.array_equal(
        np.asarray(model.pq.codebooks), np.asarray(loaded.pq.codebooks)
    )
    a = sorted(map(tuple, opq_encode(df, "vec_id", "embedding", model).collect()))
    b = sorted(map(tuple, opq_encode(df, "vec_id", "embedding", loaded).collect()))
    assert a == b


def test_guards(spark, fitted):
    df, model = fitted
    strdf = df.selectExpr("CAST(vec_id AS STRING) AS vec_id", "embedding")
    with pytest.raises(ValueError, match="integral id"):
        train_opq(strdf, "vec_id", "embedding", m=4)
    with pytest.raises(ValueError, match="not divisible by m=7"):
        train_opq(df, "vec_id", "embedding", m=7)
    with pytest.raises(Exception, match="ragged"):
        ragged = spark.createDataFrame(
            [(1, [1.0] * D), (2, [1.0, 2.0])], "vec_id long, embedding array<float>"
        ).coalesce(1)
        opq_encode(ragged, "vec_id", "embedding", model).collect()
    wrongd = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match=f"{D}-dim"):
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            wrongd, "vec_id", "embedding", model,
        )
    with pytest.raises(ValueError, match="empty query"):
        opq_topk(
            opq_encode(df, "vec_id", "embedding", model),
            df.filter("vec_id < 0"), "vec_id", "embedding", model,
        )


def test_composes_with_ivfpq(spark, fitted, tmp_path):
    """The rotation helps the COMPRESSED index too: residual codebooks
    adapt locally per cell, but they still slice the original axes —
    rotating first aligns the slices with the variance structure
    (measured 0.747 vs 0.705 recall@10 at m=4/64 codes on the planted
    corpus). Deliberately composed as a pure upstream column rewrite
    (the PCA stance): the caller rotates the corpus before
    build_ivfpq_index and rotates query batches the same way — rotation
    preserves cosine, so the exact top-k, the cell assignment geometry,
    and every downstream grading are unchanged."""
    from youtube_analytics_lakehouse_databricks_spark.operators.ivf_index import (
        build_ivfpq_index,
        ivfpq_search,
    )

    df, model = fitted
    R = np.asarray(model.rotation)
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in df.orderBy("vec_id").collect()]
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, "vec_id", "embedding", k=10).collect()
    }

    def recall(d, path):
        build_ivfpq_index(d, "vec_id", "embedding", path,
                          n_cells=8, kmeans_iters=3, m=4, n_codes=64, pq_iters=5)
        hits = ivfpq_search(spark, path, d, "vec_id", "embedding",
                            n_probe=2, k=10, exclude_self=True)
        got = {(r["query_id"], r["neighbor_id"]) for r in hits.collect()}
        return len(got & exact) / len(exact)

    plain = recall(df, str(tmp_path / "plain"))
    rotated = recall(_df(spark, X @ R.T), str(tmp_path / "rot"))
    print(f"ivfpq recall@10: plain {plain:.3f} rotated {rotated:.3f}")
    assert rotated >= plain + 0.02, (plain, rotated)
